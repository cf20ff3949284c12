"""BLIP-ScoreFusion retriever (reference blip_sf.py:11-388, rebuilt in Flax).

BLIP ViT + MED text encoder (mode="text": no cross-attention), CLS-token +
linear projection per tower, fused = masked add (reference :157-172).  The
momentum-encoder / queue machinery is *train state*, not module state
(`uniir_tpu.train.state.MomentumTrainState` + the momentum-distillation loss
in `uniir_tpu.train.losses`): the module itself is a pure embedding function
applied with either the online or the momentum params.

The learned temperature is a param clamped to [0.001, 0.5] inside the train
step (reference :188-189).  Cross-attention params exist but are frozen:
`make_blip_optimizer(freeze_path_sub="crossattention")` routes the whole
crossattention subtree to `optax.set_to_zero()` (no step, no weight decay --
matching torch AdamW's no-grad semantics for the reference's
freeze_text_encoder_crossattention, blip_sf.py:75-78).  MED config keeps
add_cross_attention=True so published weights map 1:1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.blip_vit import BLIPVisionTransformer, BLIPViTConfig
from uniir_tpu.models.med import MedBertModel, MedConfig


class BLIPScoreFusion(nn.Module):
    vit_cfg: BLIPViTConfig
    med_cfg: MedConfig
    embed_dim: int = 768
    dtype: Any = jnp.float32
    remat: bool = False
    quant: bool = False  # int8 Dense projections (inference/serving path)

    def setup(self):
        from uniir_tpu.models.layers import make_dense

        self.visual_encoder = BLIPVisionTransformer(
            self.vit_cfg, dtype=self.dtype, remat_from_layer=self.vit_cfg.layers if self.remat else 0,
            quant=self.quant,
        )
        self.text_encoder = MedBertModel(self.med_cfg, add_pooling_layer=False, dtype=self.dtype, quant=self.quant)
        self.vision_proj = make_dense(self.embed_dim, dtype=self.dtype, quant=self.quant, name=None)
        self.text_proj = make_dense(self.embed_dim, dtype=self.dtype, quant=self.quant, name=None)
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())

    def encode_texts(self, txt_dict, deterministic: bool = True) -> jnp.ndarray:
        hidden, _ = self.text_encoder(
            txt_dict["input_ids"],
            attention_mask=txt_dict["attention_mask"],
            mode="text",
            deterministic=deterministic,
            trim_last=True,  # only the CLS row is consumed below (exact)
        )
        return self.text_proj(hidden[:, 0, :])

    def encode_images(self, images, deterministic: bool = True) -> jnp.ndarray:
        feats = self.visual_encoder(images, deterministic=deterministic, pool_cls=True)
        return self.vision_proj(feats[:, 0, :])

    def fuse_embeddings(self, txt_emb, img_emb):
        return img_emb + txt_emb

    def encode_multimodal_input(self, txt_dict, images, txt_mask, img_mask, deterministic: bool = True):
        """Masked score-level fusion (reference blip_sf.py:157-172).

        txt_dict: {"input_ids": [N, L], "attention_mask": [N, L]}
        txt_mask/img_mask: [N] modality-presence masks.
        """
        txt_emb = self.encode_texts(txt_dict, deterministic) * txt_mask[:, None].astype(self.dtype)
        img_emb = self.encode_images(images, deterministic) * img_mask[:, None].astype(self.dtype)
        return self.fuse_embeddings(txt_emb, img_emb).astype(jnp.float32)

    def __call__(self, txt_dict, images, txt_mask, img_mask, deterministic: bool = True):
        return self.encode_multimodal_input(txt_dict, images, txt_mask, img_mask, deterministic)
