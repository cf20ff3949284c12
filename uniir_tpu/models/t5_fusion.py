"""2-layer T5 encoder stack for CLIP feature fusion.

Rebuild of the HF `T5Stack` the reference instantiates for fusion
(reference src/models/uniir_clip/clip_featurefusion/clip_ff.py:80-98:
T5Config with num_layers=2, num_heads=12, d_kv=64, d_model=512 (B/32) or
768 (L/14)).  T5 semantics preserved for weight-import parity:
  * RMS layer norm (no bias, no mean subtraction), pre-LN residual blocks
  * bias-free q/k/v/o and FFN dense layers; ReLU FFN (d_ff 2048 default)
  * bucketed bidirectional relative position bias, owned by layer 0 and
    shared by the rest
  * no 1/sqrt(d) attention scaling (folded into T5's init)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uniir_tpu.models.layers import make_dense, static_scales as _static_scales

Dtype = Any


@dataclasses.dataclass(frozen=True)
class T5FusionConfig:
    d_model: int = 512
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 2
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6


class T5LayerNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        return (x * scale).astype(self.dtype)


def relative_position_bucket(relative_position, num_buckets: int = 32, max_distance: int = 128):
    """T5 bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5FusionConfig
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 projections (dynamic scales; inference)

    def _dense(self, features, name, x, a_static=None):
        d = make_dense(features, use_bias=False, dtype=self.dtype, quant=self.quant, name=name)
        return d(x, a_static=a_static) if self.quant else d(x)

    @nn.compact
    def __call__(self, x, position_bias: Optional[jnp.ndarray] = None, deterministic: bool = True):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        B, L, _ = x.shape
        # static-int8 serving: calibrated [a_qkv, a_out] under this module's
        # path (ops/calibrate.py captures the attn_ln output and the
        # attn_pre_out sow below); absent -> dynamic per-row quantization
        a = _static_scales(self) if self.quant else None
        a_in = None if a is None else a[0]
        q = self._dense(inner, "q", x, a_in).reshape(B, L, cfg.num_heads, cfg.d_kv)
        k = self._dense(inner, "k", x, a_in).reshape(B, L, cfg.num_heads, cfg.d_kv)
        v = self._dense(inner, "v", x, a_in).reshape(B, L, cfg.num_heads, cfg.d_kv)

        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)

        if self.has_relative_bias:
            rel_bias = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            ctx = jnp.arange(L)
            rel_pos = ctx[None, :] - ctx[:, None]  # memory - query
            buckets = relative_position_bucket(
                rel_pos, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            position_bias = jnp.transpose(rel_bias[buckets], (2, 0, 1))[None].astype(jnp.float32)  # [1,H,L,L]
        if position_bias is not None:
            logits = logits + position_bias

        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.dropout_rate)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, inner)
        self.sow("intermediates", "attn_pre_out", out)  # calibration probe
        out = self._dense(cfg.d_model, "o", out, None if a is None else a[1])
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5FusionConfig
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None, deterministic: bool = True):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="attn_ln")(x)
        attn_out, position_bias = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias, dtype=self.dtype, quant=self.quant, name="attn"
        )(h, position_bias, deterministic)
        x = x + nn.Dropout(cfg.dropout_rate)(attn_out, deterministic=deterministic)

        # static-int8 serving: calibrated [a_ff_in, a_hidden] keyed on this
        # block (the relu FFN lives inline here, unlike layers.MLP)
        a = _static_scales(self) if self.quant else None

        def dense(features, name, v, a_static):
            d = make_dense(features, use_bias=False, dtype=self.dtype, quant=self.quant, name=name)
            return d(v, a_static=a_static) if self.quant else d(v)

        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="ff_ln")(x)
        h = dense(cfg.d_ff, "wi", h, None if a is None else a[0])
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        h = dense(cfg.d_model, "wo", h, None if a is None else a[1])
        x = x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return x, position_bias


class T5FusionStack(nn.Module):
    cfg: T5FusionConfig
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 Dense projections (dynamic scales; inference)

    @nn.compact
    def __call__(self, inputs_embeds: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dropout(cfg.dropout_rate)(inputs_embeds.astype(self.dtype), deterministic=deterministic)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), dtype=self.dtype, quant=self.quant, name=f"block_{i}"
            )(x, position_bias, deterministic)
        x = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="final_ln")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
