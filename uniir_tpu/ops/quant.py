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

STATUS: accuracy-validated but perf-neutral on this stack: measured v5e
CLIP-L throughput 627 vs 615 pairs/s for bf16, and a direct microbenchmark
shows XLA's int8 dot_general reaches only ~144 TOPs vs ~137 TFLOPs for bf16
(the nominal 2x int8 MXU rate is not accessible through this lowering), so
even perfectly fused activation quantization would not pay.  Kept as an
accuracy-validated serving option; bf16 stays the default.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_weight(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """fp kernel [in, out] -> (int8 kernel, f32 per-out-channel scale)."""
    kernel = np.asarray(kernel, np.float32)
    w_max = np.abs(kernel).max(axis=0)
    scale = np.where(w_max > 0, w_max / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel_q: jnp.ndarray, w_scale: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: y = dequant(quant(x) @ kernel_q).

    x: [..., in] float; kernel_q: [in, out] int8; w_scale: [out] f32.
    """
    xf = x.astype(jnp.float32)
    a_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a_max, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y


class QuantDense(nn.Module):
    """Dense layer over pre-quantized int8 params (kernel_q, scale, bias)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return int8_matmul(x, kernel_q, scale, bias).astype(self.dtype)


def quantize_tree(params: Any) -> Any:
    """Replace every 2-D Dense {kernel[, bias]} in a param pytree with
    {kernel_q, scale[, bias]} (QuantDense layout). Non-Dense leaves pass
    through unchanged."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                kernel_q, scale = quantize_weight(np.asarray(node["kernel"]))
                out = {"kernel_q": kernel_q, "scale": scale}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"])
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(jax.device_get(params))
