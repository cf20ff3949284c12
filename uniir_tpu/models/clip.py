"""CLIP towers in Flax (from scratch, weight-compatible with public CLIP).

Architecture parity with OpenAI CLIP (the external `clip` package the
reference loads at src/models/uniir_clip/clip_scorefusion/clip_sf.py:25):
  * vision: conv patch embed (no bias), class token, learned positional
    embedding, pre-LN transformer with QuickGELU, ln_post + projection.
    `pool="cls"` gives the pooled embedding; `pool="none"` keeps all tokens
    (the CLIP-FF VisionTransformerWithoutPooling surgery, reference
    clip_ff.py:23-59 applies ln_post + proj to the full sequence).
  * text: token embedding, positional embedding, causal-mask transformer,
    ln_final; pooled output takes the EOT position (argmax of token ids)
    through text_projection; `pool="none"` returns the full ln_final sequence
    without projection (CLIP-FF text path, reference clip_ff.py:148-156).

TPU notes: NHWC images; all matmuls run in the module compute dtype (bf16 in
training); softmax/logit math in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uniir_tpu.models.layers import PatchEmbed, Transformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # joint
    embed_dim: int = 512


CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig(),
    "ViT-B/16": CLIPConfig(patch_size=16),
    "ViT-L/14": CLIPConfig(
        patch_size=14,
        vision_width=1024,
        vision_layers=24,
        vision_heads=16,
        text_width=768,
        text_layers=12,
        text_heads=12,
        embed_dim=768,
    ),
}

# Tiny configs for fast CPU tests.
CLIP_CONFIGS["test-tiny"] = CLIPConfig(
    image_size=32,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    vocab_size=128,
    context_length=16,
    text_width=32,
    text_layers=2,
    text_heads=2,
    embed_dim=16,
)

# Feature fusion requires text_width == embed_dim (like B/32's 512 and L/14's 768).
CLIP_CONFIGS["test-tiny-ff"] = CLIP_CONFIGS["test-tiny"].__class__(
    **{**CLIP_CONFIGS["test-tiny"].__dict__, "embed_dim": 32}
)


class CLIPVisionTower(nn.Module):
    cfg: CLIPConfig
    pool: str = "cls"  # "cls" | "none"
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool = False
    # paired-head fused attention: non-causal, so safe for the vision stack
    fused_attention: bool = True

    def _flat_serving(self) -> bool:
        """Padded-flat int8 serving (round 5, docs/PERFORMANCE.md): pad L to
        the tile height ceil8(L) so [B,Lp,W] <-> [B*Lp,W] reshapes are
        bitcasts and every projection/MLP dot runs 2-D -- over 3-D
        [B,257,W] operands XLA's conv emitters disagree on layouts and fc2
        pays a 270 MB s8 relayout per layer (+18% tower time measured).
        Inference-only (quant implies no grads); opt out: UNIIR_INT8_FLAT=0."""
        import os

        return self.quant and not self.remat and os.environ.get("UNIIR_INT8_FLAT", "1") == "1"

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = PatchEmbed(cfg.vision_width, cfg.patch_size, use_bias=False, dtype=self.dtype, name="conv1")(
            images.astype(self.dtype)
        )
        B, L, _ = x.shape
        cls = self.param("class_embedding", nn.initializers.normal(cfg.vision_width**-0.5), (cfg.vision_width,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.vision_width)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (L + 1, cfg.vision_width),
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        flat = None
        l_true = L + 1
        if self._flat_serving():
            lp = -(-l_true // 8) * 8
            if lp != l_true:
                x = jnp.pad(x, ((0, 0), (0, lp - l_true), (0, 0)))
            x = x.reshape(B * lp, cfg.vision_width)
            flat = (B, lp, l_true)
        x = Transformer(
            cfg.vision_width,
            cfg.vision_layers,
            cfg.vision_heads,
            act="quick_gelu",
            dtype=self.dtype,
            remat=self.remat,
            quant=self.quant,
            fused_attention=self.fused_attention,
            name="transformer",
            # pooled tower: the last block only computes the CLS row (exact)
        )(x, pool_idx=jnp.zeros((B,), jnp.int32) if self.pool == "cls" else None, flat=flat)
        proj = self.param(
            "proj", nn.initializers.normal(cfg.vision_width**-0.5), (cfg.vision_width, cfg.embed_dim)
        )
        if self.pool == "cls":
            x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0, :])
            return x @ proj.astype(self.dtype)
        # pool == "none": token sequence through ln_post + proj (CLIP-FF surgery)
        if flat is not None:
            x = x.reshape(B, flat[1], cfg.vision_width)[:, :l_true]  # drop pad rows
        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x)
        return x @ proj.astype(self.dtype)


class CLIPTextTower(nn.Module):
    cfg: CLIPConfig
    pool: str = "eot"  # "eot" | "none"
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool = False
    # causal paired-head fused attention (the tril mask lives in the kernel)
    fused_attention: bool = True

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tok = self.param("token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.text_width))
        x = tok.astype(self.dtype)[text]
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.text_width)
        )
        x = x + pos.astype(self.dtype)[: x.shape[1]]
        eot_pos = jnp.argmax(text, axis=-1)  # EOT has the highest token id
        x = Transformer(
            cfg.text_width,
            cfg.text_layers,
            cfg.text_heads,
            act="quick_gelu",
            dtype=self.dtype,
            remat=self.remat,
            quant=self.quant,
            causal=True,  # tril mask built in-kernel (fused) / in-layer (einsum)
            fused_attention=self.fused_attention,
            name="transformer",
            # pooled tower: the last block only computes the EOT row (exact;
            # it attends to positions <= its own)
        )(x, pool_idx=eot_pos if self.pool == "eot" else None)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        if self.pool == "none":
            # CLIP-FF text path: full sequence, no projection (the reference
            # deletes text_projection, clip_ff.py:107).
            return x
        text_proj = self.param(
            "text_projection", nn.initializers.normal(cfg.text_width**-0.5), (cfg.text_width, cfg.embed_dim)
        )
        pooled = x[:, 0]  # trimmed last block already gathered the EOT row
        return pooled @ text_proj.astype(self.dtype)


def clip_logit_scale_init(key, shape, dtype=jnp.float32):
    del key, shape
    return jnp.asarray(np.log(1.0 / 0.07), dtype=dtype)
