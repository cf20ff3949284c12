"""BLIP-FeatureFusion retriever (reference blip_ff.py:11-332, rebuilt in Flax).

A single fused encoder: BLIP ViT image tokens feed the MED text encoder as
`encoder_hidden_states` through per-layer cross-attention; the pooler output
(dense+tanh over CLS) is the fused embedding (reference :82-116).  Momentum +
queue machinery lives in the train state, as for BLIP-SF.

Note the reference creates a zero *modality* mask for padded images but never
applies it in this model -- the padded (all-zero) image simply flows through
cross-attention (blip_ff.py:94 comment).  We reproduce that: txt_mask/img_mask
are accepted for interface parity and unused.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.blip_vit import BLIPVisionTransformer, BLIPViTConfig
from uniir_tpu.models.med import MedBertModel, MedConfig


class BLIPFeatureFusion(nn.Module):
    vit_cfg: BLIPViTConfig
    med_cfg: MedConfig
    embed_dim: int = 768
    dtype: Any = jnp.float32
    remat: bool = False
    quant: bool = False  # int8 Dense projections (inference/serving path)

    def setup(self):
        self.visual_encoder = BLIPVisionTransformer(
            self.vit_cfg, dtype=self.dtype, remat_from_layer=self.vit_cfg.layers if self.remat else 0,
            quant=self.quant,
        )
        self.text_encoder = MedBertModel(self.med_cfg, add_pooling_layer=True, dtype=self.dtype, remat=self.remat, quant=self.quant)
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())

    def encode_multimodal_input(self, txt_dict, images, txt_mask=None, img_mask=None, deterministic: bool = True):
        image_embeds = self.visual_encoder(images, deterministic=deterministic)
        _, pooled = self.text_encoder(
            txt_dict["input_ids"],
            attention_mask=txt_dict["attention_mask"],
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=None,  # all-ones (reference blip_ff.py:97,108)
            mode="multimodal",
            deterministic=deterministic,
            trim_last=True,  # pooler reads CLS only (exact); the ViT output
            # stays full-length because every layer cross-attends to it
        )
        return pooled.astype(jnp.float32)

    def __call__(self, txt_dict, images, txt_mask=None, img_mask=None, deterministic: bool = True):
        return self.encode_multimodal_input(txt_dict, images, txt_mask, img_mask, deterministic)
