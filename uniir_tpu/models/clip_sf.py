"""CLIP-ScoreFusion retriever (reference clip_sf.py:13-168, rebuilt in Flax).

Score-level fusion: fused = img_emb * img_mask + txt_emb * txt_mask
(elementwise masked add, reference clip_sf.py:49-63).  The in-batch
contrastive loss lives in `uniir_tpu.train.losses` as a pure function over
the globally-sharded batch.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uniir_tpu.models.clip import CLIPConfig, CLIPTextTower, CLIPVisionTower, clip_logit_scale_init


class CLIPScoreFusion(nn.Module):
    cfg: CLIPConfig
    dtype: Any = jnp.float32
    remat: bool = False
    quant: bool = False  # int8 Dense projections (inference/serving path)

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg, pool="cls", dtype=self.dtype, remat=self.remat, quant=self.quant)
        self.text = CLIPTextTower(self.cfg, pool="eot", dtype=self.dtype, remat=self.remat, quant=self.quant)
        self.logit_scale = self.param("logit_scale", clip_logit_scale_init, ())

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual(images)

    def encode_text(self, text: jnp.ndarray) -> jnp.ndarray:
        return self.text(text)

    def fuse_embeddings(self, img_emb: jnp.ndarray, txt_emb: jnp.ndarray) -> jnp.ndarray:
        return img_emb + txt_emb

    def encode_multimodal_input(self, txt, img, txt_mask, img_mask) -> jnp.ndarray:
        """Masked score-level fusion (reference clip_sf.py:53-63).

        txt: int32 [N, 77]; img: float [N, H, W, 3] NHWC;
        txt_mask/img_mask: int [N].
        """
        txt_emb = self.encode_text(txt) * txt_mask[:, None].astype(self.dtype)
        img_emb = self.encode_image(img) * img_mask[:, None].astype(self.dtype)
        return self.fuse_embeddings(img_emb, txt_emb).astype(jnp.float32)

    def get_logit_scale(self) -> jnp.ndarray:
        return jnp.exp(self.logit_scale)

    def __call__(self, txt, img, txt_mask, img_mask):
        """Embedding forward (the jittable hot path for train and embed)."""
        return self.encode_multimodal_input(txt, img, txt_mask, img_mask)
