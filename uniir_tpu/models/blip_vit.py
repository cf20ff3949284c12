"""BLIP vision transformer (timm-style ViT, from scratch in Flax).

Parity with the reference backbone (src/models/uniir_blip/backbone/vit.py:
explicit Attention/Block/Mlp modules :24-153): patch16 conv embed *with* bias,
trainable zero-init cls token + position embedding, pre-LN blocks with plain
GELU, final LayerNorm, all tokens returned (CLS at index 0).  Large adds
stochastic depth (drop_path 0.1, reference blip.py:229-255).

`jax.checkpoint` rematerialization replaces fairscale checkpoint_wrapper
(reference vit.py:146-148); position-embedding interpolation for resolution
changes lives in `uniir_tpu.models.layers.interpolate_pos_embed`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.layers import MLP, MultiHeadAttention, PatchEmbed

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BLIPViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0


BLIP_VIT_CONFIGS = {
    "base": BLIPViTConfig(),
    "large": BLIPViTConfig(width=1024, layers=24, heads=16, drop_path_rate=0.1),
    "test-tiny": BLIPViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=2),
}


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, reference vit.py usage)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class BLIPBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    fused_attention: bool = True  # non-causal vision stack
    # compute only the CLS (index-0) output row: exact for the LAST block of a
    # CLS-pooled consumer, ~1/L of the block's FLOPs (attention keeps full k/v)
    pool_first: bool = False
    quant: bool = False  # int8 projections (inference path; requires deterministic)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, flat=None, key_mask=None):
        """`flat=(B, Lp, l_valid)` is the padded-flat int8 serving contract
        (see layers.MultiHeadAttention): x is [B*Lp, W], projections/MLP run
        2-D, the attention kernel masks keys past l_valid.  Requires
        deterministic (DropPath's per-sample mask keys off the leading dim,
        which is rows in flat mode -- identity when deterministic).
        `key_mask` masks pad keys for the pool_first single-query block."""
        attn = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, fused=self.fused_attention, quant=self.quant, name="attn"
        )
        mlp = MLP(self.width, int(self.width * self.mlp_ratio), act="gelu", dtype=self.dtype, quant=self.quant, name="mlp")
        if flat is not None:
            assert deterministic and self.quant and not self.pool_first, "flat is the int8 serving path"
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.pool_first:
            h = attn(h[:, :1], kv=h, mask=key_mask)  # single CLS query over the full sequence
            x = x[:, :1]
        else:
            h = attn(h, flat=flat)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.quant:
            # inference-only path: DropPath is identity (deterministic), so
            # handing the residual to the MLP is exact and lets the static
            # fused int8 kernel own the whole half-block (layers.MLP)
            assert deterministic, "int8 serving is inference-only (deterministic)"
            return mlp(h, res=x)
        h = mlp(h)
        return x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)


class BLIPVisionTransformer(nn.Module):
    cfg: BLIPViTConfig
    dtype: Dtype = jnp.float32
    remat_from_layer: int = 0  # remat blocks [layers - k, layers) like ckpt_layer
    quant: bool = False  # int8 projections (inference/serving path)

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True, pool_cls: bool = False) -> jnp.ndarray:
        """With `pool_cls` the last block computes only the CLS row and the
        output is [B, 1, W] -- exact when the caller reads feats[:, 0] only
        (BLIP-SF towers); keep False when the full sequence feeds
        cross-attention (BLIP-FF)."""
        cfg = self.cfg
        x = PatchEmbed(cfg.width, cfg.patch_size, use_bias=True, dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype)
        )
        B, L, _ = x.shape
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.width)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, L + 1, cfg.width))
        x = x + pos.astype(self.dtype)

        # padded-flat int8 serving (same treatment as CLIPVisionTower: pad L
        # to the tile height so projection/MLP dots run 2-D; see
        # docs/PERFORMANCE.md round-5 section); inference-only
        import os

        l_true = L + 1
        flat = None
        if self.quant and deterministic and not self.remat_from_layer and os.environ.get("UNIIR_INT8_FLAT", "1") == "1":
            lp = -(-l_true // 8) * 8
            if lp != l_true:
                x = jnp.pad(x, ((0, 0), (0, lp - l_true), (0, 0)))
            x = x.reshape(B * lp, cfg.width)
            flat = (B, lp, l_true)

        for i in range(cfg.layers):
            # linear drop-path schedule like timm (rate * i / (layers - 1))
            dp = cfg.drop_path_rate * i / max(1, cfg.layers - 1)
            block_cls = BLIPBlock
            if self.remat_from_layer and i >= cfg.layers - self.remat_from_layer:
                block_cls = nn.remat(BLIPBlock, static_argnums=(2,))
            trim = pool_cls and i == cfg.layers - 1
            key_mask = None
            if flat is not None and trim:
                # unflatten (bitcast) for the single-CLS-query last block and
                # mask the pad keys it would otherwise attend to
                x = x.reshape(B, flat[1], cfg.width)
                key_mask = (jnp.arange(flat[1]) < l_true)[None, None, None, :]
            x = block_cls(
                cfg.width, cfg.heads, cfg.mlp_ratio, drop_path=dp, dtype=self.dtype,
                pool_first=trim, quant=self.quant, name=f"blocks_{i}",
            )(x, deterministic, flat=None if trim else flat, key_mask=key_mask)
        if flat is not None and not pool_cls:
            # full-sequence consumer (BLIP-FF cross-attention): drop pad rows
            x = x.reshape(B, flat[1], cfg.width)[:, :l_true]
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)
