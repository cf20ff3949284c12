"""CLIP-FeatureFusion retriever (reference clip_ff.py:62-298, rebuilt in Flax).

CLIP towers returning full token sequences (vision: ln_post + proj applied to
all tokens -- the reference's VisionTransformerWithoutPooling surgery
:23-59; text: ln_final sequence with text_projection deleted :107,148-156),
concatenated [txt_seq; img_seq] into a 2-layer T5 encoder, mean-pooled
(:177-192).  Same contrastive loss as CLIP-SF.

Note the modality masks are accepted but NOT applied to the token sequences
-- the reference comments the masking out (clip_ff.py:174,176); padded
modalities contribute their (empty-text / black-image) tokens to fusion.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.clip import CLIPConfig, CLIPTextTower, CLIPVisionTower, clip_logit_scale_init
from uniir_tpu.models.t5_fusion import T5FusionConfig, T5FusionStack


def t5_config_for_clip(cfg: CLIPConfig) -> T5FusionConfig:
    # reference clip_ff.py:80-98: B/32 -> d_model 512, L/14 -> 768; both
    # num_layers=2, num_heads=12, d_kv=64
    return T5FusionConfig(d_model=cfg.embed_dim, num_heads=12, d_kv=64, num_layers=2)


class CLIPFeatureFusion(nn.Module):
    cfg: CLIPConfig
    dtype: Any = jnp.float32
    remat: bool = False
    quant: bool = False  # int8 Dense projections (inference/serving path)

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg, pool="none", dtype=self.dtype, remat=self.remat, quant=self.quant)
        self.text = CLIPTextTower(self.cfg, pool="none", dtype=self.dtype, remat=self.remat, quant=self.quant)
        t5_cfg = t5_config_for_clip(self.cfg)
        if self.cfg.embed_dim != self.cfg.text_width:
            # only configs whose text width == embed dim are supported, same
            # constraint as the reference (ViT-B/32: 512, ViT-L/14: 768)
            raise ValueError("CLIPFeatureFusion requires text_width == embed_dim")
        self.t5_layers = T5FusionStack(t5_cfg, dtype=self.dtype, quant=self.quant)
        self.logit_scale = self.param("logit_scale", clip_logit_scale_init, ())

    def encode_multimodal_input(self, txt, img, txt_mask=None, img_mask=None, deterministic: bool = True):
        txt_feat = self.text(txt)  # [N, Lt, W] (W == embed_dim)
        img_feat = self.visual(img)  # [N, Li+1, embed_dim]
        combined = jnp.concatenate([txt_feat, img_feat], axis=1)
        fused = self.t5_layers(combined, deterministic=deterministic)
        return jnp.mean(fused, axis=1).astype(jnp.float32)  # mean pool (ref :187-192)

    def get_logit_scale(self):
        return jnp.exp(self.logit_scale)

    def __call__(self, txt, img, txt_mask=None, img_mask=None, deterministic: bool = True):
        return self.encode_multimodal_input(txt, img, txt_mask, img_mask, deterministic)


def build_clip_ff(config, rng=None):
    from uniir_tpu.data.preprocess import clip_transform
    from uniir_tpu.data.tokenizers.clip_bpe import CLIPTokenizer
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.registry import ModelBundle, _init_params

    model_config = config.model
    cfg = CLIP_CONFIGS[model_config.clip_vision_model_name]
    dtype = jnp.bfloat16 if getattr(model_config, "bf16", True) else jnp.float32
    model = CLIPFeatureFusion(cfg, dtype=dtype, remat=bool(getattr(model_config, "remat", False)))
    params = _init_params(model, (cfg.image_size, cfg.image_size), cfg.context_length, rng)

    tokenizer = CLIPTokenizer(bpe_path=getattr(model_config, "clip_bpe_path", None))

    def tokenizer_wrapper(txts):
        return tokenizer(txts, context_length=cfg.context_length, truncate=True)

    transform = clip_transform(cfg.image_size)
    return ModelBundle(
        name="CLIPFeatureFusion",
        model=model,
        params=params,
        tokenizer=tokenizer_wrapper,
        img_preprocess_fn=transform,
        img_preprocess_fn_eval=transform,
        image_size=(cfg.image_size, cfg.image_size),
        embed_dim=cfg.embed_dim,
    )
