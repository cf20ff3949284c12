"""MED: BERT with per-layer gated cross-attention (BLIP text encoder).

From-scratch Flax rebuild of the reference's BERT re-implementation
(src/models/uniir_blip/backbone/med.py):
  * post-LN BERT layers (attention -> add&LN -> FFN -> add&LN), eps 1e-12
  * optional cross-attention in every layer, gated on mode == "multimodal"
    (reference BertLayer :330-396, gate :368-380); K/V project from
    `encoder_width` (the vision width, reference BertSelfAttention :116-118)
  * embeddings: word + learned position (+ LayerNorm + dropout)
  * pooler: dense+tanh over the CLS token (used by BLIP-FF, blip_ff.py:105)

`mode` is a static argument: "text" skips cross-attention entirely (BLIP-SF's
text tower, blip_sf.py:107-121); "multimodal" requires encoder_hidden_states
(BLIP-FF's fused encoder, blip_ff.py:96-116).  The causal/decoder path of the
reference (BertLMHeadModel) backs only the unused BLIP_Decoder and is not
rebuilt.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.layers import make_dense, static_scales

Dtype = Any
NEG_INF = -1e9  # matches HF's additive-mask convention closely enough in fp32


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524  # 30522 + [DEC] + [ENC] (reference blip.py:221-226)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    encoder_width: int = 768  # vision width for cross-attn K/V
    add_cross_attention: bool = True


MED_CONFIGS = {
    "base": MedConfig(),
    "large": MedConfig(encoder_width=1024),
    "test-tiny": MedConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        encoder_width=32,
    ),
}


class BertSelfAttentionBlock(nn.Module):
    """Self- or cross-attention + output projection + add&LN (post-LN)."""

    cfg: MedConfig
    is_cross: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 projections (inference/serving path)

    def _dense(self, features, name, x, a_static=None):
        d = make_dense(features, dtype=self.dtype, quant=self.quant, name=name)
        return d(x, a_static=a_static) if self.quant else d(x)

    @nn.compact
    def __call__(self, hidden, attn_mask=None, kv=None, deterministic: bool = True, self_kv=None):
        cfg = self.cfg
        H, heads = cfg.hidden_size, cfg.num_attention_heads
        head_dim = H // heads
        # self_kv: full-sequence k/v source for a trimmed (single-query) self-
        # attention pass; residual + q still come from `hidden`
        kv_src = kv if self.is_cross else (self_kv if self_kv is not None else hidden)

        # static-int8: post-LN BERT has no pre-LN capture point, so the
        # calibration probes the dense INPUTS directly via sows -- [a_q,
        # a_kv, a_ctx] under this module's path (ops/calibrate.py)
        a = static_scales(self) if self.quant else None
        self.sow("intermediates", "q_in", hidden)
        self.sow("intermediates", "kv_in", kv_src)

        # separate q/k/v denses (HF BertSelfAttention param layout); under
        # int8 the identical quantize-activation subgraphs over `hidden` /
        # `kv_src` are CSE'd by XLA into one quant pass each
        q = self._dense(H, "query", hidden, None if a is None else a[0])
        k = self._dense(H, "key", kv_src, None if a is None else a[1])
        v = self._dense(H, "value", kv_src, None if a is None else a[1])
        B, Lq = hidden.shape[0], hidden.shape[1]
        Lk = kv_src.shape[1]
        q = q.reshape(B, Lq, heads, head_dim)
        k = k.reshape(B, Lk, heads, head_dim)
        v = v.reshape(B, Lk, heads, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (head_dim**-0.5)
        if attn_mask is not None:
            logits = logits + attn_mask  # additive mask [B, 1, 1, Lk]
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, H)

        self.sow("intermediates", "attn_pre_out", ctx)
        out = self._dense(H, "output_dense", ctx, None if a is None else a[2])
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_ln")(out + hidden)


class BertLayer(nn.Module):
    cfg: MedConfig
    dtype: Dtype = jnp.float32
    # compute only the CLS (index-0) output row: exact for the LAST layer of a
    # CLS-pooled consumer (self- and cross-attention keep full k/v; the
    # additive masks broadcast over the query axis unchanged)
    pool_first: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, hidden, attn_mask, mode: str, enc_hidden=None, enc_mask=None, deterministic: bool = True):
        cfg = self.cfg
        attention = BertSelfAttentionBlock(cfg, dtype=self.dtype, quant=self.quant, name="attention")
        if self.pool_first:
            hidden = attention(hidden[:, :1], attn_mask, deterministic=deterministic, self_kv=hidden)
        else:
            hidden = attention(hidden, attn_mask, deterministic=deterministic)
        if mode == "multimodal":
            assert enc_hidden is not None, "encoder_hidden_states must be given for multimodal mode"
            hidden = BertSelfAttentionBlock(cfg, is_cross=True, dtype=self.dtype, quant=self.quant, name="crossattention")(
                hidden, enc_mask, kv=enc_hidden, deterministic=deterministic
            )

        # static-int8 FFN: [a_ffn_in, a_hid] keyed on this layer, probed via
        # the sows below (post-LN -> no pre-LN capture point)
        a = static_scales(self) if self.quant else None

        def dense(features, name, v, a_static):
            d = make_dense(features, dtype=self.dtype, quant=self.quant, name=name)
            return d(v, a_static=a_static) if self.quant else d(v)

        self.sow("intermediates", "ffn_in", hidden)
        h = dense(cfg.intermediate_size, "intermediate", hidden, None if a is None else a[0])
        h = nn.gelu(h, approximate=False)  # exact erf GELU (HF BERT parity)
        self.sow("intermediates", "ffn_hid", h)
        h = dense(cfg.hidden_size, "output_dense", h, None if a is None else a[1])
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_ln")(h + hidden)


class MedBertModel(nn.Module):
    cfg: MedConfig
    add_pooling_layer: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool = False  # int8 Dense projections (dynamic scales; inference)

    def _extend_mask(self, mask: jnp.ndarray) -> jnp.ndarray:
        # [B, L] 1/0 -> additive [B, 1, 1, L]
        return (1.0 - mask[:, None, None, :].astype(jnp.float32)) * NEG_INF

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        encoder_attention_mask: Optional[jnp.ndarray] = None,
        mode: str = "multimodal",
        deterministic: bool = True,
        trim_last: bool = False,
    ):
        """`trim_last` makes the LAST layer compute only the CLS row (output
        hidden is [B, 1, H]) -- exact when the caller consumes x[:, 0] /
        `pooled` only."""
        cfg = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)

        word = self.param("word_embeddings", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size))
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02), (cfg.max_position_embeddings, cfg.hidden_size)
        )
        x = word.astype(self.dtype)[input_ids] + pos.astype(self.dtype)[:L][None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)

        attn_mask = self._extend_mask(attention_mask)
        enc_mask = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(encoder_hidden_states.shape[:2], jnp.int32)
            enc_mask = self._extend_mask(encoder_attention_mask)

        layer_cls = BertLayer
        if self.remat:
            layer_cls = nn.remat(BertLayer, static_argnums=(3, 6))
        for i in range(cfg.num_hidden_layers):
            trim = trim_last and i == cfg.num_hidden_layers - 1
            x = layer_cls(cfg, dtype=self.dtype, pool_first=trim, quant=self.quant, name=f"layer_{i}")(
                x, attn_mask, mode, encoder_hidden_states, enc_mask, deterministic
            )

        pooled = None
        if self.add_pooling_layer:
            pooled = make_dense(cfg.hidden_size, dtype=self.dtype, quant=self.quant, name="pooler")(x[:, 0])
            pooled = jnp.tanh(pooled)
        return x, pooled
