"""int8 quantized inference (serving/embedding path).

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS).  For the embedding
sweep -- the production-serving hot path -- the Dense matmuls (qkv/out
projections and MLPs, ~95%% of encoder FLOPs) run as int8 x int8 -> int32 with:

  * weights: symmetric per-output-channel int8 (`w_scale[out] = max|w|/127`),
    produced offline from trained fp32 params by `quantize_tree`;
  * activations: dynamic symmetric per-row int8 computed on the fly.

Attention score/value einsums, layernorms, embeddings and the patch conv stay
bf16.  Training is unaffected (quantization is a pytree transform applied
after loading weights).  Accuracy: embedding cosine similarity vs the bf16
path is checked in tests (0.9996 on CLIP-L at batch 256).

Round-2 rework (the round-1 version was perf-neutral): activation-quant math
runs in bf16 -- integers up to 256 are exact in bf16, so round/clip to
[-127,127] loses nothing, and the VPU passes over the activations halve in
width.  Measured per-matmul at CLIP-L shapes the XLA int8 dot_general reaches
~200-310 TOPs vs ~110-160 for bf16 (the round-1 "~144 TOPs" was a timing
artifact of an output-stacking harness).  With the fused qkv projection the
quantization is shared by q/k/v.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_weight(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """fp kernel [in, out] -> (int8 kernel, f32 per-out-channel scale)."""
    kernel = np.asarray(kernel, np.float32)
    w_max = np.abs(kernel).max(axis=0)
    # multiply-by-reciprocal (not /127): XLA canonicalizes division by a
    # constant into this form, so writing it the same way keeps the host
    # artifact path and the jitted quantize_tree_jax bit-identical
    scale = np.where(w_max > 0, w_max * np.float32(1.0 / 127.0), 1.0).astype(np.float32)
    q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_activation(x: jnp.ndarray):
    """Dynamic symmetric per-row int8 quantization, all math in bf16.

    bf16 represents integers <= 256 exactly, so the rounded/clipped values
    are exact; the scale's bf16 rounding only nudges quantization-bin edges
    (noise well under the quantization error itself).
    """
    xb = x.astype(jnp.bfloat16)
    a_max = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a_max, jnp.bfloat16(1e-4)) * jnp.bfloat16(1.0 / 127.0)
    xq = jnp.clip(jnp.round(xb / a_scale), -127, 127).astype(jnp.int8)
    return xq, a_scale


def int8_matmul(x: jnp.ndarray, kernel_q: jnp.ndarray, w_scale: jnp.ndarray, bias=None, a_static=None) -> jnp.ndarray:
    """int8 matmul: y = dequant(quant(x) @ kernel_q).

    x: [..., in] float; kernel_q: [in, out] int8; w_scale: [out] f32.

    `a_static` (a calibrated per-tensor f32 scalar, ops/calibrate.py) switches
    the activation quantization from dynamic per-row to STATIC: no cross-lane
    amax reduce, so XLA fuses the whole quant (mul+round+clip) into the
    producing fusion (typically the preceding layernorm) and the dequant into
    the consumer -- this is what removes the ~13 ms of amax passes and most of
    the ~40 ms of convert traffic the round-3 profile itemized
    (docs/PERFORMANCE.md per-op table).  Callers pass it only under
    UNIIR_INT8_BACKEND=static with a calibrated tree.

    On TPU with UNIIR_INT8_BACKEND=pallas, eligible shapes route to the fused
    Pallas kernel (ops/quant_pallas.py) instead.
    """
    import os

    K, N = kernel_q.shape
    # Backend choice is measured, not assumed: the Pallas kernel wins raw
    # microbenchmarks (up to ~369 TOPs vs the 394 int8 MXU peak) but loses
    # IN-GRAPH -- XLA fuses the dequant epilogue into downstream
    # bias/gelu/residual elementwise while a custom call cannot, and the
    # CLIP-L vision tower measures 272 ms (xla) vs 380 ms (pallas).  See
    # docs/PERFORMANCE.md for the full ablation.
    backend = os.environ.get("UNIIR_INT8_BACKEND", "xla")  # xla | pallas | wonly
    if backend == "pallas" and jax.default_backend() == "tpu":
        from uniir_tpu.ops.quant_pallas import fused_int8_matmul, fused_int8_matmul_supported

        if fused_int8_matmul_supported(x.shape, K, N):
            bias_f = None if bias is None else bias.astype(jnp.float32)
            return fused_int8_matmul(x, kernel_q, w_scale, bias_f)
    if backend == "wonly":
        # WEIGHT-only int8 (VERDICT r2 #6): int8 weights feed a bf16 matmul.
        # Skips the dynamic activation-quant pass entirely (its VPU/HBM cost
        # is what caps the dynamic path at +5-6%) at the price of the bf16
        # MXU rate.  Per-output-channel scales commute with the contraction,
        # so dequant rides the output epilogue: x @ (Q*s) == (x @ Q) * s.
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            kernel_q.astype(jnp.bfloat16),  # int8 in HBM; converted on use
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc * w_scale
        if bias is not None:
            y = y + bias
        return y
    if a_static is not None:
        # static scale: pure-elementwise quantization in f32 (round/clip are
        # exact there; values past the calibrated amax clip by design)
        a = jnp.asarray(a_static, jnp.float32).reshape(())
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / a)), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * (a * w_scale)
        if bias is not None:
            y = y + bias
        return y
    xq, a_scale = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (a_scale.astype(jnp.float32) * w_scale)
    if bias is not None:
        y = y + bias
    return y


class QuantDense(nn.Module):
    """Dense layer over pre-quantized int8 params (kernel_q, scale, bias)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, columns=None, a_static=None):
        """`columns=(lo, hi)` restricts the matmul to output columns
        [lo, hi) -- used by the fused qkv projection's cross-attention path
        so the x operand pays only its q third and the kv operand only its
        k/v two-thirds (a full 3W projection per operand wastes one [W, W]
        int8 matmul per call).  `a_static` is the calibrated per-tensor
        activation scale for the static-int8 serving path (see int8_matmul)."""
        in_features = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if columns is not None:
            lo, hi = columns
            kernel_q = kernel_q[:, lo:hi]
            scale = scale[lo:hi]
            bias = bias[lo:hi] if bias is not None else None
        return int8_matmul(x, kernel_q, scale, bias, a_static=a_static).astype(self.dtype)


class QuantParams(nn.Module):
    """Declares QuantDense's params (kernel_q, scale[, bias]) WITHOUT a
    matmul -- for kernels that consume the raw quantized tensors directly
    (the fused static-int8 MLP reads fc1/fc2 params into one Pallas call).
    Same param layout as QuantDense, so `quantize_tree` output loads into
    either."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (self.in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return kernel_q, scale, bias


def quantize_tree(params: Any, act_scales: Optional[dict] = None) -> Any:
    """Replace every 2-D Dense {kernel[, bias]} in a param pytree with
    {kernel_q, scale[, bias]} (QuantDense layout). Non-Dense leaves pass
    through unchanged.

    `act_scales` (static-int8 serving, `UNIIR_INT8_BACKEND=static`): a dict
    mapping module-path tuples to calibrated values, e.g.
    `{("visual", "transformer", "resblocks_0", "mlp"): np.array([a1, a2])}`
    from `ops.calibrate.calibrate_act_scales`.  Each entry is inserted as an
    `act_scales` leaf under that path -- the param the static MLP megakernel
    reads.  Paths not present in the tree are an error (catches stale
    calibrations)."""
    act_scales = dict(act_scales or {})

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                kernel_q, scale = quantize_weight(np.asarray(node["kernel"]))
                out = {"kernel_q": kernel_q, "scale": scale}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"])
                return out
            out = {k: walk(v, path + (k,)) for k, v in node.items()}
            if path in act_scales:
                out["act_scales"] = np.asarray(act_scales.pop(path), np.float32)
            return out
        return node

    tree = walk(jax.device_get(params), ())
    assert not act_scales, f"act_scales paths not found in params: {sorted(act_scales)}"
    return tree


def quantize_tree_jax(params: Any, act_scales: Optional[dict] = None) -> Any:
    """`quantize_tree`, device-side: identical output STRUCTURE, jnp math.

    Call it under `jax.jit` with device-resident params and the whole
    quantization runs as ONE program on the accelerator -- the host variant
    above device_gets the full tree (1.7 GB for CLIP-L), which costs minutes
    through a remote-device relay.  Used by bench.py's EmbedSetup; the host
    variant remains the offline-artifact path (models/registry.py).
    Exactness vs the host variant: tests/test_quant.py."""
    act_scales = dict(act_scales or {})

    def qweight(kernel):
        k = kernel.astype(jnp.float32)
        w_max = jnp.max(jnp.abs(k), axis=0)
        scale = jnp.where(w_max > 0, w_max * np.float32(1.0 / 127.0), 1.0)
        q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
        return q, scale

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                kernel_q, scale = qweight(node["kernel"])
                out = {"kernel_q": kernel_q, "scale": scale}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            out = {k: walk(v, path + (k,)) for k, v in node.items()}
            if path in act_scales:
                out["act_scales"] = jnp.asarray(act_scales.pop(path), jnp.float32)
            return out
        return node

    tree = walk(params, ())
    assert not act_scales, f"act_scales paths not found in params: {sorted(act_scales)}"
    return tree
