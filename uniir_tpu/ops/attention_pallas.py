"""Fused non-causal attention for short sequences (the ViT hot path).

The encoder workload is L=257 (ViT-L/14) / L=197 (BLIP patch16) tokens with
head_dim 64 -- far below where the generic flash-attention kernel pays off
(measured 12-26 ms/layer at batch 256 vs 7.9 ms for plain einsum on v5e; the
einsum itself is memory-bound on the materialized [B, H, L, L] logits,
~3 GB/layer of HBM traffic).

This kernel keeps one group of heads' q/k/v and the full [L, L] score matrix
in VMEM: grid over (B*H / GROUP) steps, each computing GROUP heads'
softmax(q k^T / sqrt(d)) v without ever writing logits to HBM.  fp32 softmax,
bf16 matmuls with fp32 accumulation.  `mha_paired` supports a causal variant
(lower-triangular mask applied in-kernel) for the CLIP text tower.

STATUS: experimental, not wired into the models.  Measured on v5e at
B=256/L=257/H=16/D=64: 8.8 ms/layer vs 7.9 ms for the XLA einsum (the
[B,L,H,D] <-> [B*H,L,D] relayouts around the kernel eat the fused-softmax
win, and the per-head [264,64] matmuls only half-fill the MXU contraction).
Kept as the starting point for a relayout-free variant.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 16  # heads per grid step
NEG = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, l_valid: int, scale: float):
    # refs: [GROUP, L, D]
    G, L, D = q_ref.shape
    col_mask = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) < l_valid
    for g in range(G):
        q = q_ref[g]  # [L, D] bf16
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [L, L] fp32
        s = jnp.where(col_mask, s, jnp.float32(NEG))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        o_ref[g] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def mha_nocausal(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention: q/k/v [B, L, H, D] bf16 -> [B, L, H, D].

    L is padded to a sublane multiple internally; padded KEY positions are
    masked, padded QUERY rows are trimmed.
    """
    from jax.experimental import pallas as pl

    B, L, H, D = q.shape
    scale = D**-0.5 if scale is None else scale

    Lp = -(-L // 8) * 8  # sublane multiple
    if Lp != L:
        padding = ((0, 0), (0, Lp - L), (0, 0), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)

    # [B, Lp, H, D] -> [B*H, Lp, D]
    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, Lp, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    BH = B * H
    group = GROUP
    while BH % group:
        group //= 2
    grid = BH // group

    kernel = functools.partial(_attn_kernel, l_valid=L, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), q.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((group, Lp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, Lp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, Lp, D), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, Lp, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qb.astype(jnp.bfloat16), kb.astype(jnp.bfloat16), vb.astype(jnp.bfloat16))

    out = out.reshape(B, H, Lp, D).transpose(0, 2, 1, 3)  # [B, Lp, H, D]
    return out[:, :L]


def _paired_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, head_dim: int, l_valid: int, scale: float, causal: bool = False):
    """Head-PAIR attention over model-native [1, Lp, H*D] blocks.

    Lane slices are 128-aligned by pairing heads (2 x 64 lanes); the 'wrong'
    cross-head contraction is avoided by zero-masking one head's half per
    sub-pass -- the MXU pads 64-wide contractions to 128 anyway, so the
    masked full-width matmul costs the same as the ideal per-head one.
    """
    Lp = q_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 1)
    half0 = (lane < head_dim).astype(jnp.bfloat16)
    half1 = (lane >= head_dim).astype(jnp.bfloat16)
    # Zero V's padded rows: with boundary-masked blocks the rows past
    # l_valid read whatever sits in the producer's physical tile padding --
    # measured to include NaN bit patterns when the producer is an in-graph
    # op like the CLS-token concatenate (device_put buffers happen to
    # zero-fill, which hides the bug).  Must be a SELECT: a multiply-by-0
    # mask preserves NaN (0 * NaN = NaN) and p=0 @ NaN-V then poisons valid
    # rows.  K needs no mask (its garbage logits are overwritten via colmask
    # before softmax -- jnp.where replaces NaN too); Q's garbage rows only
    # produce garbage output rows that the masked boundary write drops.
    vrow = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 0)
    vkeep = vrow < l_valid
    col = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    colmask = col < l_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
        colmask = jnp.logical_and(colmask, col <= row)

    for hp in range(heads // 2):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
        q2 = q_ref[0, :, sl]  # [Lp, 128]
        k2 = k_ref[0, :, sl]
        v2 = jnp.where(vkeep, v_ref[0, :, sl], jnp.bfloat16(0))
        out = None
        for mask in (half0, half1):
            s = jax.lax.dot_general(
                q2 * mask, k2 * mask, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [Lp, Lp] -- zeroed halves contribute 0 to the contraction
            s = jnp.where(colmask, s, jnp.float32(NEG))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            o_h = jax.lax.dot_general(
                p, v2 * mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [Lp, 128], other head's lanes zero
            out = o_h if out is None else out + o_h
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def mha_paired(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention over model-native [B, L, H*D] tensors (no relayout).

    Requires an even head count and head_dim 64 (CLIP/BLIP towers).  Padded
    KEY positions masked; padded QUERY rows trimmed.  `causal` applies the
    lower-triangular mask inside the kernel (the CLIP text tower).
    """
    from jax.experimental import pallas as pl

    B, L, W = q.shape
    head_dim = W // heads
    assert heads % 2 == 0 and head_dim * heads == W
    scale = head_dim**-0.5 if scale is None else scale

    # Blocks are Lp = ceil8(L) rows tall while the arrays stay L rows: Pallas
    # masks the boundary block, so no explicit jnp.pad / out-slice pair is
    # needed (those lower to expensive windowed relayout ops on the (8,128)
    # tiling -- the HLO cost model prices each [256,257,1024] pad at ~2 ms).
    # Garbage rows read past L never affect valid output: padded KEY
    # positions are masked in-kernel via l_valid, and out-of-range QUERY rows
    # are dropped by the masked boundary write.
    Lp = -(-L // 8) * 8

    kernel = functools.partial(
        _paired_kernel, heads=heads, head_dim=head_dim, l_valid=L, scale=scale, causal=causal
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, W), q.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    return out


def _paired_stack_kernel(
    q_ref, k_ref, v_ref, o_ref, *, heads: int, head_dim: int, l_valid: int,
    scale: float, causal: bool, rows: int, pair_group: int = 1,
    softmax_impl: str = "full",
):
    """Row-STACKED head-pair attention (round-3 rebuild of `_paired_kernel`).

    The round-2 kernel ran two masked sub-passes per head pair (one per
    64-lane half), each with its own [Lp, Lp] softmax -- measured
    softmax/VPU-bound at ~9%% of the matmul roofline (VERDICT r2).  This
    version stacks the pair along ROWS instead:

      qcat = [q * half0 * scale ; q * half1 * scale]   # [2Lp, 128]
      s    = qcat @ k^T                                 # [2Lp, Lp], ONE matmul
      p    = softmax_rows(s)                            # ONE mask/max/exp/sum
      out  = p[:Lp] @ (v*half0) + p[Lp:] @ (v*half1)    # disjoint lane halves

    Row r of qcat has the other head's lanes zeroed, so the full-width
    contraction yields head0's logits in the top Lp rows and head1's in the
    bottom -- same FLOPs as the two-pass version (the D=64 contraction
    padding is structural) but HALF the VPU reduction ops, one fused exp
    pass, and larger better-pipelined matmuls.  Softmax scale is folded into
    the qcat masks (a [Lp,128] multiply that was needed anyway, replacing a
    [Lp,Lp] fp32 one) and the 1/rowsum normalization is applied to the
    [Lp,128] OUTPUT instead of the [Lp,Lp] probabilities.  `rows` batch rows
    are processed per grid step so the scheduler can overlap one (r, hp)
    iteration's VPU softmax with another's MXU matmuls.

    NaN discipline (see `_paired_kernel`): V rows past l_valid are zeroed
    via SELECT (multiply keeps NaN); K's garbage columns die at the colmask
    select; Q's garbage rows produce garbage rows the boundary write drops.

    The split-K variant (`_paired_stack_splitk_kernel`, selected by
    `mha_paired_stack` when l_valid %% 128 == 1) avoids this kernel's
    3-lane-tile key padding at CLIP vision shapes.
    """
    Lp = q_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 1)
    # astype-multiply masks, NOT jnp.where over a shared i1 vector: Mosaic
    # ties an i1 mask's layout to its consumer's bitwidth, and one bool used
    # in both bf16 and fp32 selects dies in an "Invalid relayout" at compile
    half0 = (lane < head_dim).astype(jnp.bfloat16)
    half1 = jnp.bfloat16(1) - half0
    qscale = scale * 1.4426950408889634 if softmax_impl == "exp2" else scale
    half0s = half0 * jnp.bfloat16(qscale)
    half1s = half1 * jnp.bfloat16(qscale)
    vrow = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 0)
    vkeep = vrow < l_valid
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * Lp, Lp), 1)
    colmask = col < l_valid
    if causal:
        qrow = jax.lax.broadcasted_iota(jnp.int32, (2 * Lp, Lp), 0) % Lp
        colmask = jnp.logical_and(colmask, col <= qrow)

    n_pairs = heads // 2

    def do_pair_scores(r, hp):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
        q2 = q_ref[r, :, sl]  # [Lp, 128] bf16
        k2 = k_ref[r, :, sl]
        qcat = jnp.concatenate([q2 * half0s, q2 * half1s], axis=0)  # [2Lp, 128]
        return jax.lax.dot_general(
            qcat, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [2Lp, Lp]

    def do_pair_out(r, hp, s):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
        v2 = jnp.where(vkeep, v_ref[r, :, sl], jnp.bfloat16(0))
        s = jnp.where(colmask, s, jnp.float32(NEG))
        if softmax_impl == "matmul_only":  # diagnostic: skip softmax entirely
            rsum = jnp.full((2 * Lp, 1), 1.0, jnp.float32)
            p = s.astype(jnp.bfloat16)
        elif softmax_impl == "no_max":  # diagnostic: price of the max pass
            e = jnp.exp(s)
            rsum = jnp.sum(e, axis=-1, keepdims=True)
            p = e.astype(jnp.bfloat16)
        elif softmax_impl == "exp2":
            # exp(x) = 2^(x*log2e); the log2e factor rides the free q-mask
            # scale multiply, so exp2 saves exp's internal x*log2e step
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - m)
            rsum = jnp.sum(e, axis=-1, keepdims=True)
            p = e.astype(jnp.bfloat16)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            rsum = jnp.sum(e, axis=-1, keepdims=True)  # [2Lp, 1] fp32
            p = e.astype(jnp.bfloat16)  # unnormalized (values in [0, 1])
        o0 = jax.lax.dot_general(
            p[:Lp], v2 * half0, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o1 = jax.lax.dot_general(
            p[Lp:], v2 * half1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # per-head 1/rowsum: o0's head1 lanes are already zero (V was
        # half-masked), so a full-width broadcast multiply needs no mask
        o = o0 * (1.0 / rsum[:Lp]) + o1 * (1.0 / rsum[Lp:])
        o_ref[r, :, sl] = o.astype(o_ref.dtype)

    for r in range(rows):
        # pair_group > 1 issues several pairs' QK matmuls before their
        # softmax/PV stages -- explicit software pipelining that widens the
        # window for the scheduler to overlap MXU and VPU work (each live s
        # buffer is [2Lp, Lp] fp32, so groups are capped by VMEM)
        for g0 in range(0, n_pairs, pair_group):
            group = range(g0, min(g0 + pair_group, n_pairs))
            scores = [do_pair_scores(r, hp) for hp in group]
            for hp, s in zip(group, scores):
                do_pair_out(r, hp, s)


def _paired_stack_splitk_kernel(
    q_ref, k_ref, v_ref, o_ref, *, heads: int,
    head_dim: int, km: int, scale: float, rows: int, pair_group: int = 1,
    softmax_impl: str = "full",
):
    """SPLIT-K variant of `_paired_stack_kernel` (round 5).

    At CLIP vision shapes l_valid = 257 = 2*128 + 1, so the row-stacked
    kernel's [2Lp, Lp] score matrix pads its key axis to THREE 128-lane
    Mosaic tiles -- 33%% wasted MXU work in both the QK and PV matmuls (the
    round-3 "forced 3-tile key dim" roofline gap).  This kernel instead
    contracts over the first Km = l_valid-1 keys -- a whole number of lane
    tiles, every column valid, NO colmask/vkeep selects -- and folds the
    single last key in as a VPU rank-1 correction: the last valid K/V row
    is pulled out of the [Lp, 128] tile by a masked sublane reduction
    (a bare 1-row extract dies in Mosaic's vector layout pass, and a
    separate [B, 1, W] operand trips a pipeline window check --
    `limits[i] <= dim(i)` -- on the compiled path), its logit is a VPU
    lane-reduction dot, its softmax term a scalar column, and its value
    contribution a broadcast outer product.  K/V rows past l_valid are
    select-zeroed before the reduction so tile-padding NaNs die there.
    Non-causal only; q rows past l_valid produce garbage rows the caller
    discards (same contract as the base kernel).
    """
    Lp = q_ref.shape[1]
    Km = km  # = l_valid - 1, a lane-tile multiple (caller-guaranteed)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 1)
    half0 = (lane < head_dim).astype(jnp.bfloat16)
    half1 = jnp.bfloat16(1) - half0
    rowv = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 0)
    lastrow = rowv == Km  # selects the last valid row (index l_valid - 1)
    qscale = scale * 1.4426950408889634 if softmax_impl == "exp2" else scale
    half0s = half0 * jnp.bfloat16(qscale)
    half1s = half1 * jnp.bfloat16(qscale)
    ex = jnp.exp2 if softmax_impl == "exp2" else jnp.exp
    zero = jnp.bfloat16(0)
    n_pairs = heads // 2

    def do_pair_scores(r, hp):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
        q2 = q_ref[r, :, sl]  # [Lp, 128] bf16
        km = k_ref[r, :Km, sl]  # [Km, 128] -- whole lane tiles, all valid
        qcat = jnp.concatenate([q2 * half0s, q2 * half1s], axis=0)  # [2Lp, 128]
        s_main = jax.lax.dot_general(
            qcat, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [2Lp, Km]
        # last valid key row via masked sublane reduction (select kills
        # tile-padding NaNs in rows > Km; row Km itself is valid data)
        k_last = jnp.sum(
            jnp.where(lastrow, k_ref[r, :, sl], zero), axis=0, keepdims=True
        )  # [1, 128]
        s_last = jnp.sum(
            (qcat * k_last).astype(jnp.float32), axis=-1, keepdims=True
        )  # [2Lp, 1] VPU lane-reduction dot
        return s_main, s_last

    def do_pair_out(r, hp, s):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
        s_main, s_last = s
        m = jnp.maximum(jnp.max(s_main, axis=-1, keepdims=True), s_last)
        e = ex(s_main - m)
        e_last = ex(s_last - m)  # [2Lp, 1]
        rsum = jnp.sum(e, axis=-1, keepdims=True) + e_last
        p = e.astype(jnp.bfloat16)
        p_last = e_last.astype(jnp.bfloat16)
        vm = v_ref[r, :Km, sl]  # rows >= Km never read by the matmuls
        vm0, vm1 = vm * half0[:Km], vm * half1[:Km]
        # last valid value row, half-masked BEFORE the sublane reduction so
        # no [1,128] slicing of the mask constants is needed
        v_last0 = jnp.sum(
            jnp.where(lastrow, v_ref[r, :, sl] * half0, zero), axis=0, keepdims=True
        )  # [1, 128]
        v_last1 = jnp.sum(
            jnp.where(lastrow, v_ref[r, :, sl] * half1, zero), axis=0, keepdims=True
        )
        # outer product e_last x v_last as two chained ONE-sided broadcasts
        # (lane broadcast of [Lp,1], then sublane broadcast of [1,128]); a
        # direct [Lp,1]*[1,128] two-sided broadcast hangs the Mosaic
        # compile (scripts/mosaic_repro.py, variants twoside vs chain)
        zf = jnp.zeros((Lp, 2 * head_dim), jnp.bfloat16)
        pl0 = zf + p_last[:Lp]
        pl1 = zf + p_last[Lp:]
        o0 = jax.lax.dot_general(
            p[:Lp], vm0, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + (pl0 * v_last0).astype(jnp.float32)
        o1 = jax.lax.dot_general(
            p[Lp:], vm1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + (pl1 * v_last1).astype(jnp.float32)
        o = o0 * (1.0 / rsum[:Lp]) + o1 * (1.0 / rsum[Lp:])
        o_ref[r, :, sl] = o.astype(o_ref.dtype)

    for r in range(rows):
        for g0 in range(0, n_pairs, pair_group):
            group = range(g0, min(g0 + pair_group, n_pairs))
            scores = [do_pair_scores(r, hp) for hp in group]
            for hp, s in zip(group, scores):
                do_pair_out(r, hp, s)


def mha_paired_stack(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    causal: bool = False,
    rows: int = 1,
    pair_group: int = 1,
    softmax_impl: str = "full",
    l_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Row-stacked fused attention over model-native [B, L, H*D] tensors.

    Same contract as `mha_paired` (even head count, head_dim 64 on TPU,
    masked ceil8 boundary blocks, no relayouts); `rows` batch rows are
    processed per grid step, `pair_group` head pairs' score matmuls are
    issued ahead of their softmax/PV stages.

    `l_valid` (default L): the number of VALID sequence positions.  The
    padded-flat serving path (layers.py, UNIIR_INT8_FLAT) physically pads
    L to the tile height ceil8(L) so projection/MLP dots can run 2-D, and
    passes the true length here -- keys/values past `l_valid` are masked
    exactly as the boundary rows of an unpadded array already were (the
    kernel has always processed ceil8-tall blocks; this only decouples the
    mask from the array length).  Output rows past `l_valid` are garbage
    (finite, since the pad rows are materialized zeros) and must be
    discarded by the caller's pooling.
    """
    import os

    from jax.experimental import pallas as pl

    B, L, W = q.shape
    head_dim = W // heads
    assert heads % 2 == 0 and head_dim * heads == W
    assert l_valid is None or 0 < l_valid <= L, (l_valid, L)
    scale = head_dim**-0.5 if scale is None else scale
    while B % rows:
        rows //= 2
    Lp = -(-L // 8) * 8
    lv = L if l_valid is None else l_valid

    # SPLIT-K: when the valid length is one past a lane-tile multiple (CLIP
    # vision: 257 = 2*128 + 1), contract over the first lv-1 keys (whole
    # tiles) and fold the single last key in as a VPU rank-1 correction --
    # the padded third key tile (33% of the QK and PV MXU work) disappears.
    # See _paired_stack_splitk_kernel.  OPT-IN (UNIIR_ATTN_SPLITK=1): the
    # compiled Mosaic path still dies in a pipeline window CHECK
    # (`limits[i] <= dim(i) (32 vs. 1)`, scripts/mosaic_repro.py realh16,
    # chip-verified 2026-08-19) even though interpret mode is exact; until
    # that is fixed the base kernel is the only chip-safe formulation.
    splitk = (
        not causal
        and softmax_impl in ("full", "exp2")
        and lv % 128 == 1
        and lv > 128
        and os.environ.get("UNIIR_ATTN_SPLITK", "0") == "1"
    )
    if splitk:
        kernel = functools.partial(
            _paired_stack_splitk_kernel,
            heads=heads, head_dim=head_dim, km=lv - 1, scale=scale, rows=rows,
            pair_group=pair_group, softmax_impl=softmax_impl,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, W), q.dtype),
            grid=(B // rows,),
            in_specs=[pl.BlockSpec((rows, Lp, W), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((rows, Lp, W), lambda i: (i, 0, 0)),
            interpret=interpret,
        )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))

    kernel = functools.partial(
        _paired_stack_kernel,
        heads=heads, head_dim=head_dim, l_valid=lv,
        scale=scale, causal=causal, rows=rows,
        pair_group=pair_group, softmax_impl=softmax_impl,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, W), q.dtype),
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, Lp, W), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((rows, Lp, W), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    return out


def mha_reference(q, k, v, scale: Optional[float] = None, causal: bool = False):
    """einsum reference with the same [B, L, H, D] layout."""
    D = q.shape[-1]
    scale = D**-0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        L = q.shape[1]
        tril = jnp.tril(jnp.ones((L, L), dtype=bool))
        logits = jnp.where(tril[None, None], logits, jnp.float32(NEG))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _einsum_flat(q, k, v, heads: int, scale: float, causal: bool = False):
    """einsum attention over model-native [B, L, H*D] tensors."""
    B, L, W = q.shape
    D = W // heads
    out = mha_reference(
        q.reshape(B, L, heads, D), k.reshape(B, L, heads, D), v.reshape(B, L, heads, D), scale, causal
    )
    return out.reshape(B, L, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def paired_attention(q, k, v, heads: int, scale: float, interpret: bool = False, causal: bool = False):
    """Differentiable fused attention over [B, L, H*D].

    Forward runs the row-stacked paired-head Pallas kernel (3.4x the einsum
    / 1.25x the round-2 two-pass kernel on v5e at ViT-L shapes).  Backward
    defaults to the fused Pallas kernel (`mha_paired_stack_bwd`): it
    recomputes softmax in VMEM flash-style and never writes a score-shaped
    [B, H, L, L] tensor to HBM.

    PRECISION: the fused backward runs its matmuls in bf16 with fp32
    accumulation (the incoming cotangent is cast to bf16 too), whereas the
    einsum VJP accumulated through fp32 tensors -- gradients match the
    einsum oracle to ~6e-2 abs on N(0,1) inputs at CLIP-L shapes
    (tests/test_topk_pallas.py), which is in line with bf16 rounding of
    O(1) values.  Set UNIIR_ATTN_BWD=einsum to fall back to the fp32
    einsum-VJP backward (`_einsum_bwd`, the retained oracle) if training
    quality ever regresses; the choice is read at trace time.
    """
    return mha_paired_stack(q, k, v, heads, scale, interpret=interpret, causal=causal)


def _paired_fwd(q, k, v, heads, scale, interpret, causal):
    return mha_paired_stack(q, k, v, heads, scale, interpret=interpret, causal=causal), (q, k, v)


def _paired_bwd(heads, scale, interpret, causal, residuals, g):
    import os

    q, k, v = residuals
    if os.environ.get("UNIIR_ATTN_BWD", "pallas") == "einsum":
        return _einsum_bwd(q, k, v, g, heads, scale, causal)
    return mha_paired_stack_bwd(q, k, v, g, heads, scale, interpret=interpret, causal=causal)


def _einsum_bwd(q, k, v, g, heads, scale, causal):
    """einsum-VJP backward (the pre-round-4 default, kept as oracle/fallback).

    Materializes ~5 [B, H, L, L] tensors in HBM per layer -- measured 123
    ms/rep of the 375 ms batch-32 CLIP-L train step before the fused
    backward kernel replaced it (scripts/profile_train.py, round 4)."""
    _, vjp_fn = jax.vjp(lambda q, k, v: _einsum_flat(q, k, v, heads, scale, causal), q, k, v)
    return vjp_fn(g)


paired_attention.defvjp(_paired_fwd, _paired_bwd)


def _paired_stack_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
    heads: int, head_dim: int, l_valid: int, scale: float, causal: bool, rows: int,
):
    """Fused backward of `_paired_stack_kernel` -- dq/dk/dv without ever
    writing a score-shaped tensor to HBM.

    Recomputes p = softmax(qcat @ k^T) in VMEM (flash-attention-backward
    style, untiled since [2Lp, Lp] fits), then per head pair:

      dv = p^T @ gcat            # contract the stacked 2Lp query rows
      dp = gcat @ v^T            # [2Lp, Lp]
      ds = p * (dp - rowsum(dp * p))
      dq = scale * (half0 * (ds[:Lp] @ k) + half1 * (ds[Lp:] @ k))
      dk = ds^T @ qcat           # qcat already carries scale + half masks

    5 MXU matmuls per pair vs the forward's 2 -- the standard ~2.5x.

    Boundary rows: UNLIKE the forward (where garbage query rows only produce
    garbage output rows that the masked boundary write drops), the backward
    CONTRACTS over query rows (dv, dk), so rows past l_valid in q/k/v/g must
    all be select-zeroed or tile-padding NaNs poison valid gradients.  The
    selects also guarantee ds columns past l_valid are exactly 0 before the
    ds @ k contraction (0 * NaN = NaN otherwise)."""
    Lp = q_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 1)
    half0 = (lane < head_dim).astype(jnp.bfloat16)
    half1 = jnp.bfloat16(1) - half0
    half0s = half0 * jnp.bfloat16(scale)
    half1s = half1 * jnp.bfloat16(scale)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * head_dim), 0)
    rkeep = rowv < l_valid
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * Lp, Lp), 1)
    colmask = col < l_valid
    if causal:
        qrow = jax.lax.broadcasted_iota(jnp.int32, (2 * Lp, Lp), 0) % Lp
        colmask = jnp.logical_and(colmask, col <= qrow)

    zero = jnp.bfloat16(0)
    for r in range(rows):
        for hp in range(heads // 2):
            sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
            q2 = jnp.where(rkeep, q_ref[r, :, sl], zero)  # [Lp, 128]
            k2 = jnp.where(rkeep, k_ref[r, :, sl], zero)
            v2 = jnp.where(rkeep, v_ref[r, :, sl], zero)
            g2 = jnp.where(rkeep, g_ref[r, :, sl], zero)
            qcat = jnp.concatenate([q2 * half0s, q2 * half1s], axis=0)  # [2Lp, 128]
            gcat = jnp.concatenate([g2 * half0, g2 * half1], axis=0)
            s = jax.lax.dot_general(
                qcat, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [2Lp, Lp]
            s = jnp.where(colmask, s, jnp.float32(NEG))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32, rows sum to 1
            pb = p.astype(jnp.bfloat16)
            # dv: contract the stacked query-row axis of p against gcat
            dv = jax.lax.dot_general(
                pb, gcat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [Lp, 128]; half0 lanes from the top rows, half1 from the bottom
            dp = jax.lax.dot_general(
                gcat, v2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [2Lp, Lp]
            ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(jnp.bfloat16)
            dqcat = jax.lax.dot_general(
                ds, k2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [2Lp, 128], full-width; halves selected below
            dq = (dqcat[:Lp] * half0 + dqcat[Lp:] * half1) * scale
            dk = jax.lax.dot_general(
                ds, qcat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [Lp, 128]; qcat's half masks + scale already applied
            dq_ref[r, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[r, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[r, :, sl] = dv.astype(dv_ref.dtype)


def mha_paired_stack_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    causal: bool = False,
    rows: int = 1,
):
    """(dq, dk, dv) for `mha_paired_stack` over [B, L, H*D] tensors.

    Same block contract as the forward (masked ceil8 boundary blocks, no
    relayouts).  Replaces the einsum-VJP backward that materialized
    [B, H, L, L] tensors in HBM -- the dominant cost of the train step at
    CLIP-L shapes (95 ms/rep of score-shaped fusions + 28 ms of reductions
    at batch 32, scripts/profile_train.py)."""
    from jax.experimental import pallas as pl

    B, L, W = q.shape
    head_dim = W // heads
    assert heads % 2 == 0 and head_dim * heads == W
    scale = head_dim**-0.5 if scale is None else scale
    while B % rows:
        rows //= 2
    Lp = -(-L // 8) * 8

    kernel = functools.partial(
        _paired_stack_bwd_kernel,
        heads=heads, head_dim=head_dim, l_valid=L, scale=scale, causal=causal, rows=rows,
    )
    spec = pl.BlockSpec((rows, Lp, W), lambda i: (i, 0, 0))
    # cotangent dtypes must match the primal inputs' dtypes under custom_vjp:
    # dq/dk/dv each take their own input's dtype (q/k/v are uniformly bf16
    # today via layers.py, but a mixed-dtype caller would otherwise hit a
    # cotangent dtype mismatch error)
    shapes = tuple(jax.ShapeDtypeStruct((B, L, W), a.dtype) for a in (q, k, v))
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=shapes,
        grid=(B // rows,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16),
    )
    return dq, dk, dv


def paired_attention_supported(heads: int, width: int, on_tpu: bool) -> bool:
    """The TPU kernel needs 128-lane head pairs; interpret mode has no constraint."""
    if heads % 2:
        return False
    head_dim = width // heads
    return (2 * head_dim == 128) or not on_tpu
