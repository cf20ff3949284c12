"""Pallas fused retrieval kernel: streamed matmul + bucket-max epilogue.

The exact-top-k pipeline over an HBM-resident pool (the FAISS replacement's
hot path):

  1. `bucket_max_scores` (Pallas): grid over pool chunks; each step DMAs a
     [CHUNK, D] bf16 pool block into VMEM (auto double-buffered by the
     pallas pipeline), runs the [Q, D] x [D, CHUNK] matmul on the MXU with
     fp32 accumulation, and reduces each *strided* bucket of GROUP rows to
     its max -- only [Q, N/GROUP] bucket maxima are written to HBM.  The
     [Q, N] score matrix never exists.  Buckets are strided (member m of
     bucket (i, l) is pool row i*CHUNK + m*128 + l) because a max over the
     sublane axis of a [Q, GROUP, 128] tile is layout-native on the VPU,
     while a 16-wide minor-axis reduce is not; any partition of the pool
     into buckets preserves exactness.
  2. `pallas_topk` epilogue (XLA): k results occupy at most k buckets, so a
     (hierarchical) top-k over the maxima identifies <=k candidate buckets
     per query; their k*GROUP pool rows are gathered and rescored in fp32
     for the final exact ranking.

HBM traffic ~= one pool read (8.6 GB for the 5.6M x 768 pool) + ~360 MB of
fp32 maxima (fp32 so rounding cannot drop tie buckets), vs ~3x pool size for
the chunked XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 2048  # BUCKET granularity: rows per strided-bucket group (fixed)
GROUP = CHUNK // 128  # bucket size (strided members)
Q_TILE = 256  # query rows per grid step (keeps the fp32 score tile in VMEM)
NEG = -3e38  # python float: jnp scalars cannot be captured by pallas kernels

# DMA block heights: pool rows per GRID STEP, decoupled from the bucket
# granularity (each block reduces its S = block/CHUNK sub-chunks to S*128
# bucket maxima, so selection/rescore geometry and _bucket_rows never change
# with the block height).  Chip matrix over THESE kernels
# (scripts/bench_topk_blocks.py, 5.6M x 768 pool, 256 queries):
#   bf16 sweep ms: 15.86 / 15.65 / 15.18 / 20.86 at 2048/4096/8192/16384
#   int8 sweep ms: 10.15 / 10.64 /  9.47 / 11.06
# 8192 wins both; 16384 regresses (the earlier 11.66-ms bf16 reading at
# 16384 came from the EXPERIMENTAL coarse-bucket kernel in
# bench_topk_phases.py --phase5, whose bucket granularity grows with the
# block -- a different selection geometry, not comparable).  Blocks taller
# than 2048 need more than the 16 MB default scoped-vmem budget, hence
# VMEM_LIMIT_BYTES below.
BLOCK_ROWS_BF16 = int(os.environ.get("UNIIR_TOPK_BLOCK_BF16", 8192))
BLOCK_ROWS_I8 = int(os.environ.get("UNIIR_TOPK_BLOCK_I8", 8192))
PAD_ROWS = max(BLOCK_ROWS_BF16, BLOCK_ROWS_I8, CHUNK)  # host-side pool padding multiple
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _pick_block_rows(n_rows: int, preferred: int) -> int:
    """Largest block height <= preferred that divides the (padded) pool."""
    b = max(preferred, CHUNK)
    while b > CHUNK and n_rows % b:
        b //= 2
    return b


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _make_bucket_max_kernel(S: int):
    """bf16 sweep kernel over S*CHUNK-row blocks.  Padding-row masking
    (global row = base + s*CHUNK + m*128 + l) is only needed on the block
    that straddles valid_n -- building the iotas and the where on every
    block is measurable VPU overhead across the sweep, so interior blocks
    skip it."""
    block = S * CHUNK

    def kernel(q_ref, pool_ref, valid_ref, out_ref):
        from jax.experimental import pallas as pl

        q = q_ref[...]  # [QT, D] bf16
        rows = pool_ref[...]  # [block, D] bf16
        scores = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [QT, block] fp32
        Q = scores.shape[0]
        base = pl.program_id(0) * block
        valid = valid_ref[0, 0]

        # static per-sub-chunk loop with 128-lane slice writes: a single
        # [Q, S, GROUP, 128] max + [Q, S, 128] -> [Q, S*128] reshape widens
        # the minor (lane) dim and lowers to a relayout -- measured ~1.5 ms
        # slower across the 5.6M sweep than S separate lane-native reduces
        @pl.when(base + block > valid)
        def _():
            m_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
            for s in range(S):
                tiles = scores[:, s * CHUNK : (s + 1) * CHUNK].reshape(Q, GROUP, 128)
                row = base + s * CHUNK + m_idx * 128 + l_idx
                masked = jnp.where((row < valid)[None], tiles, jnp.float32(NEG))
                # fp32 maxima (bf16 would lose ties)
                out_ref[:, s * 128 : (s + 1) * 128] = jnp.max(masked, axis=1)

        @pl.when(base + block <= valid)
        def _():
            for s in range(S):
                tiles = scores[:, s * CHUNK : (s + 1) * CHUNK].reshape(Q, GROUP, 128)
                out_ref[:, s * 128 : (s + 1) * 128] = jnp.max(tiles, axis=1)

    return kernel


def bucket_max_scores(
    queries: jnp.ndarray,
    pool: jnp.ndarray,
    valid_n: Optional[int] = None,
    interpret: bool = False,
    block_rows: Optional[int] = None,
) -> jnp.ndarray:
    """[Q, D] x [N, D] -> strided-bucket score maxima [Q, N/GROUP] (fp32).

    N must be a multiple of CHUNK (pad the pool host-side; padding rows are
    masked via valid_n).  Blocks of `block_rows` (default BLOCK_ROWS_BF16,
    clipped to the largest height dividing N) stream through VMEM per grid
    step; bucket granularity is CHUNK regardless.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, D = queries.shape
    N = pool.shape[0]
    assert N % CHUNK == 0, f"pool rows must be a multiple of {CHUNK}"
    block = _pick_block_rows(N, block_rows or BLOCK_ROWS_BF16)
    S = block // CHUNK
    n_blocks = N // block
    valid = jnp.asarray([[N if valid_n is None else valid_n]], jnp.int32)

    # tile large query batches; pad to a Q_TILE multiple
    qt = min(Q_TILE, Q) if Q % min(Q_TILE, Q) == 0 else Q_TILE
    pad_q = (-Q) % qt
    q_in = queries.astype(jnp.bfloat16)
    if pad_q:
        q_in = jnp.concatenate([q_in, jnp.zeros((pad_q, D), jnp.bfloat16)], axis=0)
    n_q = q_in.shape[0] // qt

    out = pl.pallas_call(
        _make_bucket_max_kernel(S),
        out_shape=jax.ShapeDtypeStruct((q_in.shape[0], (N // CHUNK) * 128), jnp.float32),
        # block outermost, q-tile innermost: the pool streams through HBM once
        grid=(n_blocks, n_q),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, qi: (qi, 0)),
            pl.BlockSpec((block, D), lambda i, qi: (i, 0)),
            pl.BlockSpec((1, 1), lambda i, qi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((qt, S * 128), lambda i, qi: (qi, i)),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(q_in, pool.astype(jnp.bfloat16), valid)
    return out[:Q]


def _make_bucket_max_kernel_i8(S: int):
    """int8 variant over S*CHUNK-row blocks: int8 x int8 -> int32 on the MXU
    (2x the bf16 rate), dequantized per-element (per-row scales) before the
    bucket max."""
    block = S * CHUNK

    def kernel(q_ref, pool_ref, qs_ref, ps_ref, valid_ref, out_ref):
        from jax.experimental import pallas as pl

        q = q_ref[...]  # [QT, D] int8
        rows = pool_ref[...]  # [block, D] int8
        acc = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        scores = acc.astype(jnp.float32) * qs_ref[...] * ps_ref[...]  # [QT, block]
        Q = scores.shape[0]
        base = pl.program_id(0) * block
        valid = valid_ref[0, 0]

        # static per-sub-chunk loop (see the bf16 kernel note on relayouts)
        @pl.when(base + block > valid)
        def _():
            m_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
            for s in range(S):
                tiles = scores[:, s * CHUNK : (s + 1) * CHUNK].reshape(Q, GROUP, 128)
                row = base + s * CHUNK + m_idx * 128 + l_idx
                masked = jnp.where((row < valid)[None], tiles, jnp.float32(NEG))
                out_ref[:, s * 128 : (s + 1) * 128] = jnp.max(masked, axis=1)

        @pl.when(base + block <= valid)
        def _():
            for s in range(S):
                tiles = scores[:, s * CHUNK : (s + 1) * CHUNK].reshape(Q, GROUP, 128)
                out_ref[:, s * 128 : (s + 1) * 128] = jnp.max(tiles, axis=1)

    return kernel


@jax.jit
def _quantize_pool_impl(pool):
    amax = jnp.max(jnp.abs(pool.astype(jnp.float32)), axis=1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(pool.astype(jnp.float32) / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def _quantize_pool_bucketed_impl(pool):
    N = pool.shape[0]
    n_chunks = N // CHUNK
    amax = jnp.max(jnp.abs(pool.astype(jnp.float32)), axis=1)  # [N]
    # strided-bucket member m of bucket (i, l) is row i*CHUNK + m*128 + l,
    # so reshape [n_chunks, GROUP, 128] maps row -> (i, m, l) exactly
    b_amax = jnp.max(amax.reshape(n_chunks, GROUP, 128), axis=1)  # [n_chunks, 128]
    scale_b = jnp.maximum(b_amax, 1e-6) / 127.0
    row_scale = jnp.broadcast_to(scale_b[:, None, :], (n_chunks, GROUP, 128)).reshape(N)
    q = jnp.clip(jnp.round(pool.astype(jnp.float32) / row_scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale_b.reshape(n_chunks * 128)


def quantize_pool(pool, per_bucket: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 pool: (pool_q [N, D] int8, scale f32).

    `per_bucket=False` (the serving default) gives per-row scales [N] for
    the dequantize-then-max kernel.  `per_bucket=True` shares one scale
    across each strided bucket's GROUP members (scale shape [N/GROUP]) so
    the sweep kernel can take the bucket max in INT32 and dequantize only
    the [Q, 128] maxima -- the hypothesis was that the per-element f32
    convert+multiply was the per-row kernel's gap to its HBM roofline, but
    ON CHIP THE BUCKETED KERNEL MEASURES SLOWER (11.2 vs 9.6 ms sweep,
    scripts/bench_topk_phases.py --phase3): the dequant arithmetic
    overlaps the MXU anyway, and the coarser scales buy nothing.  Kept as
    an option because exactness is unaffected either way (survivors are
    rescored against the bf16 pool; the guard certifies the cut).

    Jitted so XLA fuses the f32 casts into the reduce + quant chain: run
    eagerly, `pool.astype(f32)` would materialize a full-precision copy of a
    multi-GB pool (17 GB at the 5.6M x 768 bench shape) and OOM the chip."""
    pool = jnp.asarray(pool)
    if per_bucket:
        assert pool.shape[0] % CHUNK == 0, "pad the pool first (pad_pool_for_chunks)"
        return _quantize_pool_bucketed_impl(pool)
    return _quantize_pool_impl(pool)


def _bucket_max_kernel_i8b(q_ref, pool_ref, qs_ref, ps_ref, valid_ref, out_ref):
    """Per-BUCKET-scale int8 variant: all GROUP members of a strided bucket
    share one scale, so the bucket max runs in INT32 on the [Q, GROUP, 128]
    tiles and only the [Q, 128] maxima are dequantized -- the per-row
    kernel's [Q, CHUNK] f32 convert + two multiplies per grid step were the
    measured gap to the sweep's HBM roofline."""
    from jax.experimental import pallas as pl

    q = q_ref[...]  # [QT, D] int8
    chunk_rows = pool_ref[...]  # [CHUNK, D] int8
    acc = jax.lax.dot_general(
        q, chunk_rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [QT, CHUNK] int32
    Q = acc.shape[0]
    tiles = acc.reshape(Q, GROUP, 128)
    base = pl.program_id(0) * CHUNK
    valid = valid_ref[0, 0]

    @pl.when(base + CHUNK > valid)
    def _():
        # int32 sentinel masking is safe WITHIN a bucket (same positive
        # scale); a fully-invalid bucket needs the f32 NEG after dequant --
        # its dequantized sentinel (-2^31 * scale) can be a small negative
        # number that would outrank true negative scores
        m_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 0)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
        row = base + m_idx * 128 + l_idx
        masked = jnp.where((row < valid)[None], tiles, jnp.int32(-(2**31 - 1)))
        deq = jnp.max(masked, axis=1).astype(jnp.float32) * qs_ref[...] * ps_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[...] = jnp.where(base + lane < valid, deq, jnp.float32(NEG))

    @pl.when(base + CHUNK <= valid)
    def _():
        out_ref[...] = jnp.max(tiles, axis=1).astype(jnp.float32) * qs_ref[...] * ps_ref[...]


def bucket_max_scores_i8(
    queries: jnp.ndarray,
    pool_q: jnp.ndarray,
    pool_scale: jnp.ndarray,
    valid_n: Optional[int] = None,
    interpret: bool = False,
    block_rows: Optional[int] = None,
) -> jnp.ndarray:
    """int8 phase-1: approximate strided-bucket maxima [Q, N/GROUP] (f32).

    `pool_scale` selects the kernel by shape: [N] = per-row scales
    (dequantize-then-max), [N/GROUP] = per-bucket scales (int32 max, then
    dequantize the maxima -- the serving default, see quantize_pool)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, D = queries.shape
    N = pool_q.shape[0]
    assert N % CHUNK == 0, f"pool rows must be a multiple of {CHUNK}"
    n_chunks = N // CHUNK
    n_buckets = n_chunks * 128
    valid = jnp.asarray([[N if valid_n is None else valid_n]], jnp.int32)
    bucketed = pool_scale.shape[0] == n_buckets and n_buckets != N
    assert pool_scale.shape[0] in (N, n_buckets), pool_scale.shape
    # the bucketed (int32-max) variant keeps single-CHUNK blocks: it measured
    # slower than per-row anyway and is kept only as a reference option
    block = CHUNK if bucketed else _pick_block_rows(N, block_rows or BLOCK_ROWS_I8)
    S = block // CHUNK
    n_blocks = N // block

    qf = queries.astype(jnp.float32)
    q_amax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_amax, 1e-6) / 127.0
    q_q = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)

    qt = min(Q_TILE, Q) if Q % min(Q_TILE, Q) == 0 else Q_TILE
    pad_q = (-Q) % qt
    if pad_q:
        q_q = jnp.concatenate([q_q, jnp.zeros((pad_q, D), jnp.int8)], axis=0)
        q_scale = jnp.concatenate([q_scale, jnp.ones((pad_q, 1), jnp.float32)], axis=0)
    n_q = q_q.shape[0] // qt

    out = pl.pallas_call(
        _bucket_max_kernel_i8b if bucketed else _make_bucket_max_kernel_i8(S),
        out_shape=jax.ShapeDtypeStruct((q_q.shape[0], n_buckets), jnp.float32),
        grid=(n_blocks, n_q),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, qi: (qi, 0)),
            pl.BlockSpec((block, D), lambda i, qi: (i, 0)),
            pl.BlockSpec((qt, 1), lambda i, qi: (qi, 0)),
            pl.BlockSpec((1, 128 if bucketed else block), lambda i, qi: (0, i)),
            pl.BlockSpec((1, 1), lambda i, qi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((qt, S * 128), lambda i, qi: (qi, i)),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(q_q, pool_q, q_scale, pool_scale.reshape(1, -1), valid)
    return out[:Q]


def _bucket_rows(bucket_ids: jnp.ndarray) -> jnp.ndarray:
    """Global pool rows of each strided bucket: [..., GROUP]."""
    chunk_idx = bucket_ids // 128
    lane = bucket_ids % 128
    m = jnp.arange(GROUP, dtype=bucket_ids.dtype)
    return chunk_idx[..., None] * CHUNK + m * 128 + lane[..., None]


@functools.partial(jax.jit, static_argnames=("k", "valid_n", "interpret", "overfetch", "with_guard"))
def pallas_topk(
    queries: jnp.ndarray,
    pool: jnp.ndarray,
    k: int,
    valid_n: Optional[int] = None,
    interpret: bool = False,
    pool_quant: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    overfetch: int = 2,
    with_guard: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Exact top-k inner-product search with the fused Pallas kernel.

    Returns (scores [Q, k] fp32, indices [Q, k] int32).  Requires
    pool rows % CHUNK == 0 (use ops.topk.pad_pool_for_chunks) and Q >= 8.

    `pool_quant=(pool_q, pool_scale)` (from `quantize_pool`) switches the
    bucket-max sweep -- the one pass over the full pool, where all the FLOPs
    are -- to the int8 MXU (2x the bf16 rate).  This path is APPROXIMATE in
    a bounded sense: the int8 bucket maxima carry quantization error, so
    `overfetch * k` buckets are selected and their rows rescored EXACTLY
    against the bf16 `pool`.  The final ranking is exact w.r.t. bf16 scores
    only if every true top-k row's bucket survives the widened cut -- the
    epilogue's top_k/rescore cost scales with overfetch (the phase isolation
    in scripts/bench_topk_phases.py measured overfetch=4 giving back the
    sweep's entire int8 win), and overfetch=2 passes the guard at rate 1.0
    on Gaussian/real-embedding pools while overfetch=1 fails ~2/3 of
    queries; a distribution whose score margins are flat relative to the
    quantization error can silently lose recall at any overfetch.  `with_guard=True` appends a
    per-query bool `ok [Q]` to the return: the k-th exact rescored score
    clears the cut line (the k_sel-th selected int8 bucket maximum), i.e. no
    unexamined bucket could plausibly hold a true top-k row.  Callers that
    need certainty re-run queries with `ok == False` at a larger overfetch
    (or with pool_quant=None, which is exact unconditionally).
    """
    Q, D = queries.shape
    N = pool.shape[0]
    valid_n = N if valid_n is None else valid_n

    if pool_quant is not None:
        pool_q, pool_scale = pool_quant
        maxima = bucket_max_scores_i8(
            queries, pool_q, pool_scale, valid_n=valid_n, interpret=interpret
        )
        k_sel = min(overfetch * k, maxima.shape[1])
    else:
        maxima = bucket_max_scores(queries, pool, valid_n=valid_n, interpret=interpret)  # [Q, NB] fp32
        k_sel = k
    NB = maxima.shape[1]

    # hierarchical selection over the maxima (avoids one big TopK call)
    if NB % 128 == 0 and NB > k_sel * 128:
        tiles = maxima.reshape(Q, NB // 128, 128)
        tile_max = jnp.max(tiles, axis=-1)  # [Q, NB/128] fp32
        _, tids = jax.lax.top_k(tile_max, k_sel)
        cand = jnp.take_along_axis(tiles, tids[:, :, None], axis=1).reshape(Q, k_sel * 128)
        _, pos = jax.lax.top_k(cand, k_sel)
        flat = (tids[:, :, None] * 128 + jnp.arange(128)[None, None, :]).reshape(Q, k_sel * 128)
        bucket_ids = jnp.take_along_axis(flat, pos, axis=1)  # [Q, k_sel]
    else:
        _, bucket_ids = jax.lax.top_k(maxima, k_sel)

    # gather candidate pool rows and rescore in fp32-accumulated bf16
    row_ids = _bucket_rows(bucket_ids).reshape(Q, k_sel * GROUP)  # [Q, k_sel*GROUP]
    cand_rows = pool[row_ids]  # [Q, k_sel*GROUP, D]
    scores = jnp.einsum(
        "qd,qnd->qn",
        queries.astype(jnp.bfloat16),
        cand_rows.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(row_ids < valid_n, scores, NEG)
    vals, pos = jax.lax.top_k(scores, k)
    idx = jnp.take_along_axis(row_ids, pos, axis=1).astype(jnp.int32)
    if not with_guard:
        return vals, idx
    if pool_quant is None:
        ok = jnp.ones((Q,), bool)  # exact path: always certain
    else:
        # cut line = smallest selected int8 bucket maximum; every unexamined
        # bucket's (approximate) maximum is below it.  If the k-th EXACT
        # score clears the cut, no dropped bucket could hold a top-k row.
        cut = jnp.min(jnp.take_along_axis(maxima, bucket_ids, axis=1), axis=1)
        ok = vals[:, k - 1] >= cut
    return vals, idx, ok
