"""Model registry: build any of the four retriever variants from a config.

Replaces reference `build_model_from_config` (src/common/utils.py:64-153).
Returns a `ModelBundle`: the Flax module, initialized/loaded params, the
matching tokenizer and image transform, and the embed-forward method name.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uniir_tpu.core.config import parse_image_size
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_sf import CLIPScoreFusion

MODEL_NAMES = ("CLIPScoreFusion", "CLIPFeatureFusion", "BLIPScoreFusion", "BLIPFeatureFusion")


@dataclass
class ModelBundle:
    name: str
    model: Any  # flax module
    params: Any
    tokenizer: Callable
    img_preprocess_fn: Callable
    img_preprocess_fn_eval: Callable
    image_size: tuple
    embed_dim: int
    extra: dict = field(default_factory=dict)

    def encode_batch(self, params, batch):
        """Non-jitted convenience embed (tests / tiny runs)."""
        return self.model.apply(
            {"params": params},
            batch["txt_batched"],
            batch["image_batched"],
            batch["txt_mask_batched"],
            batch["image_mask_batched"],
        )

    def encode_mbeir_batch(self, params, batch):
        """Reference-parity API (clip_sf.py:154-168): returns (embeddings, id_list)."""
        id_list = batch.get("did_list")
        if id_list is None:
            id_list = batch.get("qid_list")
        assert id_list is not None, "id_list must be provided."
        embeddings = self.encode_batch(params, batch)
        assert embeddings.shape[0] == len(id_list), "embeddings and id_batched must have the same batch size."
        return embeddings, id_list


def _init_params(model, image_size: tuple, context_length: int, rng=None, text_is_dict: bool = False):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = 2
    txt = np.zeros((n, context_length), np.int32)
    if text_is_dict:
        txt = {"input_ids": txt, "attention_mask": np.ones_like(txt)}
    img = np.zeros((n, image_size[0], image_size[1], 3), np.float32)
    mask = np.ones((n,), np.int32)
    return model.init(rng, txt, img, mask, mask)["params"]


def build_clip_sf(config, rng=None) -> ModelBundle:
    from uniir_tpu.data.preprocess import clip_transform
    from uniir_tpu.data.tokenizers.clip_bpe import CLIPTokenizer

    model_config = config.model
    clip_name = model_config.clip_vision_model_name
    cfg = CLIP_CONFIGS[clip_name]
    dtype = jnp.bfloat16 if getattr(model_config, "bf16", True) else jnp.float32
    remat = bool(getattr(model_config, "remat", False))
    model = CLIPScoreFusion(cfg, dtype=dtype, remat=remat)
    params = _init_params(model, (cfg.image_size, cfg.image_size), cfg.context_length, rng)

    bpe_path = getattr(model_config, "clip_bpe_path", None)
    tokenizer = CLIPTokenizer(bpe_path=bpe_path)

    def tokenizer_wrapper(txts):
        return tokenizer(txts, context_length=cfg.context_length, truncate=True)

    transform = clip_transform(cfg.image_size)
    return ModelBundle(
        name="CLIPScoreFusion",
        model=model,
        params=params,
        tokenizer=tokenizer_wrapper,
        img_preprocess_fn=transform,
        img_preprocess_fn_eval=transform,
        image_size=(cfg.image_size, cfg.image_size),
        embed_dim=cfg.embed_dim,
    )


def _build_blip(config, cls, rng=None) -> ModelBundle:
    from uniir_tpu.data.preprocess import blip_transform
    from uniir_tpu.data.tokenizers.bert_wordpiece import BertTokenizer
    from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS
    from uniir_tpu.models.med import MED_CONFIGS, MedConfig
    import dataclasses

    model_config = config.model
    vit = getattr(model_config, "vit", "base")
    vit_cfg = BLIP_VIT_CONFIGS[vit]
    image_size = getattr(model_config, "image_size", vit_cfg.image_size)
    if image_size != vit_cfg.image_size:
        vit_cfg = dataclasses.replace(vit_cfg, image_size=image_size)
    med_cfg = MED_CONFIGS.get(vit, MED_CONFIGS["base"])
    med_cfg = dataclasses.replace(med_cfg, encoder_width=vit_cfg.width)
    embed_dim = getattr(model_config, "embed_dim", 768)
    dtype = jnp.bfloat16 if getattr(model_config, "bf16", True) else jnp.float32
    remat = bool(getattr(model_config, "vit_grad_ckpt", False))
    model = cls(vit_cfg=vit_cfg, med_cfg=med_cfg, embed_dim=embed_dim, dtype=dtype, remat=remat)

    max_len = int(getattr(model_config, "tokenizer_max_length", 64))
    vocab_path = getattr(model_config, "bert_vocab_path", None)
    if vocab_path is None:
        raise FileNotFoundError(
            "BLIP models need model.bert_vocab_path pointing at a bert-base-uncased vocab.txt"
        )
    tokenizer = BertTokenizer(vocab_path)

    def tokenizer_wrapper(txts):
        return tokenizer(txts, max_length=max_len)

    params = _init_params(model, (vit_cfg.image_size, vit_cfg.image_size), max_len, rng, text_is_dict=True)
    return ModelBundle(
        name=cls.__name__,
        model=model,
        params=params,
        tokenizer=tokenizer_wrapper,
        img_preprocess_fn=blip_transform(vit_cfg.image_size, is_train=True),
        img_preprocess_fn_eval=blip_transform(vit_cfg.image_size, is_train=False),
        image_size=(vit_cfg.image_size, vit_cfg.image_size),
        embed_dim=embed_dim,
        extra={
            "queue_size": int(getattr(model_config, "queue_size", 57600)),
            "momentum": float(getattr(model_config, "momentum", 0.995)),
        },
    )


def build_model_from_config(config, rng=None) -> ModelBundle:
    name = config.model.name
    if name == "CLIPScoreFusion":
        bundle = build_clip_sf(config, rng)
    elif name == "CLIPFeatureFusion":
        from uniir_tpu.models.clip_ff import build_clip_ff

        bundle = build_clip_ff(config, rng)
    elif name == "BLIPScoreFusion":
        from uniir_tpu.models.blip_sf import BLIPScoreFusion

        bundle = _build_blip(config, BLIPScoreFusion, rng)
    elif name == "BLIPFeatureFusion":
        from uniir_tpu.models.blip_ff import BLIPFeatureFusion

        bundle = _build_blip(config, BLIPFeatureFusion, rng)
    else:
        raise ValueError(f"Unknown model name {name!r}; expected one of {MODEL_NAMES}")

    # published torch checkpoints (OpenAI CLIP .pt / BLIP-UniIR .pth)
    torch_ckpt = getattr(config.model, "pretrained_torch_ckpt", None)
    if torch_ckpt:
        from uniir_tpu.models.convert import convert_checkpoint

        if name.startswith("CLIP"):
            size_key = config.model.clip_vision_model_name
        else:
            size_key = getattr(config.model, "vit", "base")
        strict = bool(getattr(config.model, "strict_convert", False))
        bundle.params = convert_checkpoint(
            torch_ckpt,
            name,
            size_key,
            image_size=bundle.image_size[0] if name.startswith("BLIP") else None,
            strict=strict,
            like=bundle.params if strict else None,
        )
        print(f"Converted {name} torch checkpoint from {torch_ckpt}")

    ckpt_cfg = getattr(config.model, "ckpt_config", None)
    ckpt_name = getattr(ckpt_cfg, "ckpt_name", "") if ckpt_cfg else ""
    if ckpt_name:
        ckpt_path = os.path.join(config.uniir_dir, ckpt_cfg.ckpt_dir, ckpt_name)
        if os.path.isdir(ckpt_path):  # epoch train-state checkpoint dir
            from uniir_tpu.core.checkpoint import load_train_params

            bundle.params = load_train_params(ckpt_path, like=bundle.params)
        elif ckpt_path.endswith((".pth", ".pt")):
            from uniir_tpu.models.convert import convert_checkpoint

            size_key = config.model.clip_vision_model_name if name.startswith("CLIP") else getattr(config.model, "vit", "base")
            strict = bool(getattr(config.model, "strict_convert", False))
            bundle.params = convert_checkpoint(
                ckpt_path,
                name,
                size_key,
                image_size=bundle.image_size[0] if name.startswith("BLIP") else None,
                strict=strict,
                like=bundle.params if strict else None,
            )
        else:
            from uniir_tpu.core.checkpoint import load_params

            bundle.params = load_params(ckpt_path, like=bundle.params)
        print(f"Loaded {name} checkpoint from {ckpt_path}")

    # int8 serving mode: quantize the loaded weights and swap in the quant
    # twin -- every variant's module carries a `quant` flag, so the twin is
    # the same module with quant=True (see uniir_tpu/ops/quant.py).  The
    # reference serves all four variants through one embedder in fp16
    # autocast (src/common/mbeir_embedder.py:464-495); int8 is this repo's
    # TPU-serving extension of that surface.
    if getattr(config.model, "int8", False):
        import os

        from uniir_tpu.ops.quant import quantize_tree

        # static-int8 (UNIIR_INT8_BACKEND=static) consumes offline-calibrated
        # activation scales: `model.int8_calibration` points at the .npz
        # written by tools/calibrate_int8.py.  The other backends (xla /
        # wonly / pallas) quantize activations dynamically and need none.
        # Uncalibrated submodules (MED's post-LN BERT, T5's relu FFN
        # attention) fall back to dynamic scales under `static` -- see
        # ops/calibrate.py.
        act_scales = None
        calib_path = getattr(config.model, "int8_calibration", None)
        if calib_path:
            from uniir_tpu.ops.calibrate import load_act_scales

            act_scales = load_act_scales(calib_path)
            print(f"Loaded {len(act_scales)} calibrated act scales from {calib_path}")
        elif os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static":
            raise ValueError(
                "UNIIR_INT8_BACKEND=static needs calibrated activation scales: "
                "run tools/calibrate_int8.py and set model.int8_calibration to "
                "the .npz it writes"
            )
        bundle.model = bundle.model.clone(quant=True)
        bundle.params = quantize_tree(bundle.params, act_scales=act_scales)
        print(f"Quantized {name} to int8 serving mode")
    return bundle
