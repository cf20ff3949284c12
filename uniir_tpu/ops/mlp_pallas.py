"""Fused int8 MLP block kernel with STATIC activation scales (serving path).

One Pallas kernel computes, per M-tile, the whole pre-LN transformer MLP
half-block on the int8 MXU:

    y = res + fc2( act( fc1( quant_a1(h) ) ) )        # quantized twice

with h = ln_2(x) (bf16, from XLA) and res the residual stream.  Both int8
contractions, the two quantizations, the activation and the residual add run
in VMEM -- the [M, 4W] hidden NEVER reaches HBM.

Why this kernel exists (round-3 measurements on v5e, CLIP-L batch 256):
  * XLA fuses the bf16 MLP into one conv-chain megafusion at ~96% MXU peak
    (6.08 ms/layer vs 5.6 ms roofline) -- unbeatable in bf16.  The 2x lever
    left is the int8 MXU rate (394 vs 197 TOPs).
  * XLA does NOT conv-chain int8 dots: with dynamic quant the cross-lane
    amax reduce breaks the fusion, and even with static scales the measured
    chain reaches only ~153 TOPs (fc1/fc2 fall into separate fusions; the
    f32 dequant + requant traffic between them eats the rate).
  * STATIC activation scales make in-kernel quantization pure elementwise
    f32 math (round/clip are Mosaic-legal in f32; no bf16 round, no
    cross-lane reduce, no [M,1] scale plumbing), which is what lets the
    whole chain live in one kernel.

Scales are calibrated offline (`ops/calibrate.py`) from bf16 activation
amax quantiles; accuracy is gated by the cosine tests in tests/test_quant.py
(static-scale clipping adds noise on outlier rows -- measured cosine vs bf16
stays > 0.999 at p99.9 calibration).

Reference parity: serves the same MLP the reference runs in fp16 autocast
(src/models/uniir_clip/.../clip_sf.py forward); TPU-native replacement for
a TensorRT-style static-int8 serving engine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "quick_gelu":  # CLIP: x * sigmoid(1.702 x) -- exp-based, Mosaic-legal
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":  # exact erf form (BLIP ViT / BERT parity)
        return jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(name)


def _kernel(h_ref, res_ref, w1_ref, s1_ref, w2_ref, s2_ref, a_ref, o_ref, *, act: str):
    """h/res: [tm, W] bf16; w1: [W, H] int8; w2: [H, W] int8;
    s1: [1, H] f32 (a1*w1_scale, bias folded: s1b holds bias), s2: [1, W];
    a_ref: [1, 4] f32 = (1/a1, a1, 1/a2, a2) broadcast scalars.

    Layout note: s1_ref packs TWO rows ([2, H]): row 0 = a1 * w1_scale,
    row 1 = b1.  Same for s2_ref ([2, W]).
    """
    inv_a1 = a_ref[0, 0]
    inv_a2 = a_ref[0, 2]
    a2 = a_ref[0, 3]

    x = h_ref[:].astype(jnp.float32) * inv_a1
    xq = jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
    acc1 = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [tm, H]
    hf = acc1.astype(jnp.float32) * s1_ref[0:1, :] + s1_ref[1:2, :]
    hf = _act(act, hf)
    hq = jnp.clip(jnp.round(hf * inv_a2), -127.0, 127.0).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [tm, W]
    y = acc2.astype(jnp.float32) * (a2 * s2_ref[0:1, :]) + s2_ref[1:2, :]
    o_ref[:] = (y + res_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def fused_int8_mlp_supported(width: int, hidden: int, act: str) -> bool:
    """Lane-aligned widths; weights must fit VMEM whole (W*H int8 x2)."""
    return (
        width % 128 == 0
        and hidden % 128 == 0
        and width * hidden * 2 <= 9 * 2**20
        and act in ("quick_gelu", "gelu", "gelu_tanh")
    )


def fused_int8_mlp(
    h: jnp.ndarray,  # [..., W] bf16: ln_2 output
    res: jnp.ndarray,  # [..., W] bf16: residual stream
    w1_q: jnp.ndarray,  # [W, H] int8
    w1_scale: jnp.ndarray,  # [H] f32 (per-output-channel)
    b1: jnp.ndarray,  # [H]
    w2_q: jnp.ndarray,  # [H, W] int8
    w2_scale: jnp.ndarray,  # [W] f32
    b2: jnp.ndarray,  # [W]
    a1: jnp.ndarray,  # [] or [1] f32: static scale of h
    a2: jnp.ndarray,  # [] or [1] f32: static scale of act(fc1) output
    *,
    act: str = "quick_gelu",
    tm: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = res + fc2(act(fc1(quant(h; a1)); quant .; a2)) on the int8 MXU.

    The hidden activation stays in VMEM; boundary M-blocks are masked by the
    cdiv grid (no pad/slice pair).  Returns bf16 shaped like `res`.
    """
    W = h.shape[-1]
    H = w1_q.shape[1]
    lead = h.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    h2 = h.reshape(M, W).astype(jnp.bfloat16)
    r2 = res.reshape(M, W).astype(jnp.bfloat16)

    a1 = jnp.asarray(a1, jnp.float32).reshape(())
    a2 = jnp.asarray(a2, jnp.float32).reshape(())
    scalars = jnp.stack([1.0 / a1, a1, 1.0 / a2, a2]).reshape(1, 4)
    s1 = jnp.stack([a1 * w1_scale.astype(jnp.float32), b1.astype(jnp.float32)])  # [2, H]
    s2 = jnp.stack([w2_scale.astype(jnp.float32), b2.astype(jnp.float32)])  # [2, W]

    out = pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=(pl.cdiv(M, tm),),
        in_specs=[
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * W * H * 2,
            bytes_accessed=M * W * 2 * 3 + W * H * 2,
            transcendentals=M * H,
        ),
        interpret=interpret,
    )(h2, r2, w1_q, s1, w2_q, s2, scalars)
    return out.reshape(*lead, W)


def reference_int8_mlp(h, res, w1_q, w1_scale, b1, w2_q, w2_scale, b2, a1, a2, act="quick_gelu"):
    """Same math in plain jnp (the numerics oracle for tests)."""
    x = h.astype(jnp.float32) / a1
    xq = jnp.clip(jnp.round(x), -127, 127)
    hf = (xq @ w1_q.astype(jnp.float32)) * (a1 * w1_scale) + b1
    hf = _act(act, hf)
    hq = jnp.clip(jnp.round(hf / a2), -127, 127)
    y = (hq @ w2_q.astype(jnp.float32)) * (a2 * w2_scale) + b2
    return (y + res.astype(jnp.float32)).astype(jnp.bfloat16)
