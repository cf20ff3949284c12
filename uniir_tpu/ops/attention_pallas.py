"""Fused non-causal attention for short sequences (the ViT hot path).

The encoder workload is L=257 (ViT-L/14) / L=197 (BLIP patch16) tokens with
head_dim 64 -- far below where the generic flash-attention kernel pays off
(measured 12-26 ms/layer at batch 256 vs 7.9 ms for plain einsum on v5e; the
einsum itself is memory-bound on the materialized [B, H, L, L] logits,
~3 GB/layer of HBM traffic).

This kernel keeps one group of heads' q/k/v and the full [L, L] score matrix
in VMEM: grid over (B*H / GROUP) steps, each computing GROUP heads'
softmax(q k^T / sqrt(d)) v without ever writing logits to HBM.  fp32 softmax,
bf16 matmuls with fp32 accumulation.  Non-causal only (the text towers use
tiny L and stay on the einsum path).

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


def mha_reference(q, k, v, scale: Optional[float] = None):
    """einsum reference with the same [B, L, H, D] layout."""
    D = q.shape[-1]
    scale = D**-0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
