"""Exact dense top-k retrieval ops (the FAISS IndexFlatIP replacement).

The reference shards a FAISS flat inner-product index over GPUs
(reference src/common/mbeir_retriever.py:96-103,201-232).  Here the candidate
pool lives in device HBM and search is a tiled matmul with streaming
k-selection:

  * `chunked_topk`  -- single-device: lax.scan over candidate chunks; each
    step is one MXU matmul [Q, D] x [D, C] plus a running top-k merge, so the
    full [Q, N] score matrix never materializes in HBM.
  * `sharded_topk`  -- multi-device: pool rows sharded over the mesh `data`
    axis via shard_map; each shard computes a local top-k with global index
    offsets, then an all_gather of the tiny [Q, k] partials + final merge.
    Collectives ride ICI; HBM holds N/n_dev rows per chip (5.6M x 768 fp16
    ~ 8.6 GB -> ~1.1 GB/chip on v5e-8).

A fused Pallas kernel for the matmul+select inner loop lives in
`uniir_tpu.ops.topk_pallas` (used automatically on TPU when shapes allow).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uniir_tpu.core.mesh import DATA_AXIS

NEG_INF = jnp.asarray(-jnp.inf, jnp.float32)


def _merge_topk(scores_a, idx_a, scores_b, idx_b, k: int):
    """Merge two [Q, ka]/[Q, kb] partial top-k sets into [Q, k]."""
    scores = jnp.concatenate([scores_a, scores_b], axis=1)
    idx = jnp.concatenate([idx_a, idx_b], axis=1)
    top_scores, pos = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(idx, pos, axis=1)


def bucketed_topk(scores: jnp.ndarray, k: int, bucket: int = 128):
    """Exact top-k over the last axis via bucket-max prefiltering.

    k result elements occupy at most k buckets, so top-k of the per-bucket
    maxima identifies a superset of buckets containing the true top-k; a
    small top-k over those k*bucket gathered elements is then exact.  This
    replaces one huge TopK custom-call (slow sort-based op on TPU) with a
    fast VPU max-reduction + two tiny TopKs.
    Returns (values [Q, k], indices [Q, k] into the scores axis).
    """
    Q, N = scores.shape
    if N % bucket != 0 or N <= k * bucket:
        return jax.lax.top_k(scores, k)
    n_buckets = N // bucket
    tiles = scores.reshape(Q, n_buckets, bucket)
    bucket_max = jnp.max(tiles, axis=-1)  # [Q, n_buckets]
    _, bucket_ids = jax.lax.top_k(bucket_max, k)  # [Q, k]
    cand = jnp.take_along_axis(tiles, bucket_ids[:, :, None], axis=1)  # [Q, k, bucket]
    cand = cand.reshape(Q, k * bucket)
    vals, pos = jax.lax.top_k(cand, k)
    idx = bucket_ids[:, :, None] * bucket + jnp.arange(bucket)[None, None, :]
    idx = idx.reshape(Q, k * bucket)
    return vals, jnp.take_along_axis(idx, pos, axis=1)


@partial(jax.jit, static_argnames=("k", "chunk_size"))
def chunked_topk(
    queries: jnp.ndarray,
    pool: jnp.ndarray,
    k: int,
    chunk_size: int = 16384,
    valid_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner-product search.

    queries: [Q, D] (any float dtype; accumulation is fp32)
    pool:    [N, D]
    valid_n: rows >= valid_n are padding and never retrieved.
    Returns (scores [Q, k] fp32, indices [Q, k] int32 into pool rows).
    """
    Q, D = queries.shape
    N = pool.shape[0]
    valid_n = N if valid_n is None else valid_n  # may be a traced scalar
    k = min(k, N)

    n_chunks = -(-N // chunk_size)
    pad = n_chunks * chunk_size - N
    if pad:
        # Device-side pad copies the whole pool; large pools should arrive
        # pre-padded to a chunk multiple (see pad_pool_for_chunks) so this
        # branch only triggers for small inputs.
        pool = jnp.concatenate([pool, jnp.zeros((pad, D), pool.dtype)], axis=0)

    q = queries.astype(jnp.bfloat16)

    def chunk_topk(chunk_idx):
        # dynamic_slice view of the pool -> no reshaped copy in HBM
        chunk = jax.lax.dynamic_slice_in_dim(pool, chunk_idx * chunk_size, chunk_size, axis=0)
        # MXU matmul with fp32 accumulation
        scores = jax.lax.dot_general(
            q,
            chunk.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, C]
        base = chunk_idx * chunk_size
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, chunk_size), 1) + base
        scores = jnp.where(col < valid_n, scores, NEG_INF)
        c_s, c_pos = bucketed_topk(scores, min(k, chunk_size))
        c_i = c_pos + base
        if c_s.shape[1] < k:  # k > chunk_size: pad out
            padk = k - c_s.shape[1]
            c_s = jnp.concatenate([c_s, jnp.full((Q, padk), NEG_INF, jnp.float32)], axis=1)
            c_i = jnp.concatenate([c_i, jnp.full((Q, padk), -1, jnp.int32)], axis=1)
        return c_s, c_i

    def body(i, carry):
        best_s, best_i = carry
        c_s, c_i = chunk_topk(i)
        return _merge_topk(best_s, best_i, c_s, c_i, k)

    # Seed the carry from chunk 0 (also keeps the carry axis-varying inside
    # shard_map bodies, where a constant init would be unvarying).
    init = chunk_topk(jnp.int32(0))
    if n_chunks == 1:
        return init
    return jax.lax.fori_loop(1, n_chunks, body, init)


def pad_pool_for_chunks(pool: np.ndarray, chunk_size: int) -> np.ndarray:
    """Host-side pad to a chunk multiple (avoids an 8GB+ device-side copy)."""
    N, D = pool.shape
    pad = (-N) % chunk_size
    if pad == 0:
        return pool
    return np.concatenate([pool, np.zeros((pad, D), pool.dtype)], axis=0)


def shard_pool(pool, mesh: Mesh) -> jnp.ndarray:
    """Pad row-count to a shard multiple (host-side) and place the pool
    row-sharded over the mesh `data` axis ONCE.

    Do this before a query-batch sweep so the multi-GB H2D transfer is not
    repeated per sharded_topk call.
    """
    n_dev = mesh.shape[DATA_AXIS]
    N, D = pool.shape
    shard_rows = -(-N // n_dev)
    pad = shard_rows * n_dev - N
    if pad:
        pool = np.concatenate(
            [np.asarray(pool), np.zeros((pad, D), np.asarray(pool).dtype)], axis=0
        )
    return jax.device_put(jnp.asarray(pool), NamedSharding(mesh, P(DATA_AXIS, None)))


@partial(jax.jit, static_argnames=("k", "chunk_size", "shard_rows", "mesh"))
def _sharded_search(queries, pool, valid_n, *, k: int, chunk_size: int, shard_rows: int, mesh: Mesh):
    """Jitted shard_map search body; cached across query batches
    (same mesh/k/chunk/shard_rows -> one trace for the whole sweep)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the trailing all_gather+merge
    )
    def search(q, local_pool, valid_n):
        shard_idx = jax.lax.axis_index(DATA_AXIS)
        base = shard_idx * shard_rows
        # mask padding BEFORE local selection: zero-pad rows score 0.0, which
        # would displace genuinely negative-scored true candidates otherwise
        local_valid = jnp.clip(valid_n - base, 0, shard_rows)
        s, i = chunked_topk(
            q,
            local_pool,
            k=k,
            chunk_size=chunk_size,
            valid_n=local_valid,
        )
        gi = i + base
        s = jnp.where(gi < valid_n, s, NEG_INF)
        # gather the tiny partials from every shard and merge
        all_s = jax.lax.all_gather(s, DATA_AXIS, axis=0)  # [n_dev, Q, k]
        all_i = jax.lax.all_gather(gi, DATA_AXIS, axis=0)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(q.shape[0], -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], -1)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    return search(queries, pool, valid_n)


def sharded_topk(
    queries: jnp.ndarray,
    pool: jnp.ndarray,
    k: int,
    mesh: Mesh,
    chunk_size: int = 16384,
    valid_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pool-sharded exact top-k over the mesh `data` axis.

    Each device searches its row shard, then the [Q, k] partials are
    all-gathered and merged.  `pool` may be a numpy array or -- preferred for
    repeated calls -- an array already placed by `shard_pool` (recognized by
    its sharding; skips the H2D transfer entirely).
    """
    n_dev = mesh.shape[DATA_AXIS]
    N, D = pool.shape
    valid_n = int(N if valid_n is None else valid_n)
    k = min(k, valid_n)

    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    if isinstance(pool, jax.Array) and pool.sharding.is_equivalent_to(sharding, pool.ndim):
        assert N % n_dev == 0, "pre-sharded pool must be padded to the axis size"
    else:
        pool = shard_pool(pool, mesh)
    shard_rows = pool.shape[0] // n_dev

    queries = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P()))
    return _sharded_search(
        queries,
        pool,
        jnp.asarray(valid_n, jnp.int32),
        k=k,
        chunk_size=min(chunk_size, shard_rows),
        shard_rows=shard_rows,
        mesh=mesh,
    )


def topk_numpy_reference(queries: np.ndarray, pool: np.ndarray, k: int):
    """Brute-force fp32 reference for tests."""
    scores = queries.astype(np.float32) @ pool.astype(np.float32).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx
