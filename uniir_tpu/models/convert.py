"""torch -> JAX weight converters for published CLIP / UniIR / BLIP checkpoints.

Maps the reference stacks' state dicts onto this framework's param pytrees:
  * OpenAI CLIP `.pt` state dicts (the towers the reference loads at
    clip_sf.py:25) -> CLIPScoreFusion / CLIPFeatureFusion params
  * BLIP / UniIR `.pth` checkpoints (timm ViT + HF-style BERT + projections,
    reference blip.py:263-289) -> BLIPScoreFusion / BLIPFeatureFusion params
  * HF T5Stack fusion weights -> T5FusionStack params (CLIP-FF)

Conventions: torch Linear stores [out, in] -> Flax Dense kernel is the
transpose; torch conv OIHW -> Flax HWIO; fused qkv/in_proj tensors are split.
Position embeddings are bicubically interpolated on grid-size mismatch
(reference vit.py:359-384 equivalent -> layers.interpolate_pos_embed).
Checkpoints saved by DDP get their "module." prefix stripped
(reference common/utils.py checkpoint loading).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from uniir_tpu.models.layers import interpolate_pos_embed


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _conv_oihw_to_hwio(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


class _TrackedSD:
    """Dict view that records which ORIGINAL state-dict keys were consumed.

    Renamed/filtered views (strip_prefix) share one consumed-set, so after a
    conversion `unconsumed()` lists exactly the source keys no mapping
    touched -- the audit the reference only half does (it reports
    shape-mismatch drops, blip.py:276-289, but silently ignores unknown keys).
    """

    def __init__(self, data: Dict[str, np.ndarray], consumed: set | None = None, orig: Dict[str, str] | None = None):
        self._d = dict(data)
        self.consumed = consumed if consumed is not None else set()
        self._orig = orig if orig is not None else {k: k for k in self._d}

    def __getitem__(self, k):
        v = self._d[k]
        self.consumed.add(self._orig[k])
        return v

    def get(self, k, default=None):
        return self[k] if k in self._d else default

    def __contains__(self, k):
        return k in self._d

    def __iter__(self):
        return iter(self._d)

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def rename(self, fn, keep=None):
        """New view with keys renamed by `fn` (optionally filtered by `keep`),
        sharing this view's consumed-set."""
        new_d, new_orig = {}, {}
        for k, v in self._d.items():
            if keep is not None and not keep(k):
                continue
            nk = fn(k)
            new_d[nk] = v
            new_orig[nk] = self._orig[k]
        return _TrackedSD(new_d, self.consumed, new_orig)

    def unconsumed(self):
        return sorted(set(self._orig[k] for k in self._d) - self.consumed)


def strip_prefix(sd, prefix: str = "module."):
    """Strip `prefix` from keys (tracking-aware)."""
    ren = lambda k: k[len(prefix) :] if k.startswith(prefix) else k  # noqa: E731
    if isinstance(sd, _TrackedSD):
        return sd.rename(ren)
    return {ren(k): v for k, v in sd.items()}


def _subset_prefix(sd, prefix: str):
    """Keys under `prefix`, with it stripped (tracking-aware)."""
    if isinstance(sd, _TrackedSD):
        return sd.rename(lambda k: k[len(prefix) :], keep=lambda k: k.startswith(prefix))
    return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}


def to_numpy_state_dict(sd) -> Dict[str, np.ndarray]:
    """torch tensors -> fp32 numpy (CLIP ships fp16; reference casts to fp32,
    clip train.py:190)."""
    out = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        out[k] = arr
    return out


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def _convert_clip_resblocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int) -> dict:
    blocks = {}
    for i in range(n_layers):
        p = f"{prefix}.resblocks.{i}"
        # torch in_proj is the already-fused [3W, W] qkv -> transpose straight
        # into the fused qkv_proj kernel [W, 3W]
        blocks[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "attn": {
                "qkv_proj": {"kernel": _t(sd[f"{p}.attn.in_proj_weight"]), "bias": np.asarray(sd[f"{p}.attn.in_proj_bias"])},
                "out_proj": {"kernel": _t(sd[f"{p}.attn.out_proj.weight"]), "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": _t(sd[f"{p}.mlp.c_fc.weight"]), "bias": sd[f"{p}.mlp.c_fc.bias"]},
                "fc2": {"kernel": _t(sd[f"{p}.mlp.c_proj.weight"]), "bias": sd[f"{p}.mlp.c_proj.bias"]},
            },
        }
    return blocks


def convert_clip_vision_tower(sd: Dict[str, np.ndarray], n_layers: int, num_patches: int | None = None) -> dict:
    """`visual.*` keys of an OpenAI CLIP state dict -> CLIPVisionTower params."""
    pos = sd["visual.positional_embedding"]
    if num_patches is not None and pos.shape[0] - 1 != num_patches:
        pos = np.asarray(interpolate_pos_embed(pos, num_patches))
    return {
        "conv1": {"proj": {"kernel": _conv_oihw_to_hwio(sd["visual.conv1.weight"])}},
        "class_embedding": np.asarray(sd["visual.class_embedding"]),
        "positional_embedding": pos,
        "ln_pre": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "transformer": _convert_clip_resblocks(sd, "visual.transformer", n_layers),
        "ln_post": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
        "proj": np.asarray(sd["visual.proj"]),
    }


def convert_clip_text_tower(sd: Dict[str, np.ndarray], n_layers: int, with_projection: bool = True) -> dict:
    out = {
        "token_embedding": np.asarray(sd["token_embedding.weight"]),
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "transformer": _convert_clip_resblocks(sd, "transformer", n_layers),
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
    }
    if with_projection and "text_projection" in sd:
        out["text_projection"] = np.asarray(sd["text_projection"])
    return out


def convert_clip_sf_params(sd: Dict[str, np.ndarray], vision_layers: int, text_layers: int) -> dict:
    """Full OpenAI-CLIP state dict -> CLIPScoreFusion params pytree."""
    sd = strip_prefix(sd)
    sd = strip_prefix(sd, "clip_model.")
    return {
        "visual": convert_clip_vision_tower(sd, vision_layers),
        "text": convert_clip_text_tower(sd, text_layers, with_projection=True),
        "logit_scale": np.asarray(sd["logit_scale"]),
    }


def convert_t5_fusion_params(sd: Dict[str, np.ndarray], n_layers: int, prefix: str = "t5_layers") -> dict:
    """HF T5Stack encoder weights -> T5FusionStack params."""
    out = {}
    for i in range(n_layers):
        p = f"{prefix}.block.{i}"
        attn = {
            "q": {"kernel": _t(sd[f"{p}.layer.0.SelfAttention.q.weight"])},
            "k": {"kernel": _t(sd[f"{p}.layer.0.SelfAttention.k.weight"])},
            "v": {"kernel": _t(sd[f"{p}.layer.0.SelfAttention.v.weight"])},
            "o": {"kernel": _t(sd[f"{p}.layer.0.SelfAttention.o.weight"])},
        }
        if i == 0:
            attn["relative_attention_bias"] = np.asarray(
                sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        out[f"block_{i}"] = {
            "attn": attn,
            "attn_ln": {"weight": sd[f"{p}.layer.0.layer_norm.weight"]},
            "wi": {"kernel": _t(sd[f"{p}.layer.1.DenseReluDense.wi.weight"])},
            "wo": {"kernel": _t(sd[f"{p}.layer.1.DenseReluDense.wo.weight"])},
            "ff_ln": {"weight": sd[f"{p}.layer.1.layer_norm.weight"]},
        }
    out["final_ln"] = {"weight": sd[f"{prefix}.final_layer_norm.weight"]}
    return out


def convert_clip_ff_params(sd: Dict[str, np.ndarray], vision_layers: int, text_layers: int, t5_layers: int = 2) -> dict:
    sd = strip_prefix(sd)
    clip_sd = _subset_prefix(sd, "clip_model.")
    return {
        "visual": convert_clip_vision_tower(clip_sd, vision_layers),
        "text": convert_clip_text_tower(clip_sd, text_layers, with_projection=False),
        "t5_layers": convert_t5_fusion_params(sd, t5_layers),
        "logit_scale": np.asarray(clip_sd["logit_scale"]),
    }


# ---------------------------------------------------------------------------
# BLIP
# ---------------------------------------------------------------------------


def convert_blip_vit(
    sd: Dict[str, np.ndarray], prefix: str, n_layers: int, num_patches: int | None = None, image_size: int | None = None
) -> dict:
    conv_w = sd[f"{prefix}.patch_embed.proj.weight"]  # OIHW [W, 3, p, p]
    if image_size is not None:
        # derive the target grid from the checkpoint's OWN patch size rather
        # than assuming patch16 (round-1 VERDICT item 5)
        patch = int(np.shape(conv_w)[-1])
        num_patches = (image_size // patch) ** 2
    pos = np.asarray(sd[f"{prefix}.pos_embed"])  # [1, L+1, W]
    if num_patches is not None and pos.shape[1] - 1 != num_patches:
        pos = np.asarray(interpolate_pos_embed(pos, num_patches))
    out = {
        "patch_embed": {
            "proj": {
                "kernel": _conv_oihw_to_hwio(sd[f"{prefix}.patch_embed.proj.weight"]),
                "bias": np.asarray(sd[f"{prefix}.patch_embed.proj.bias"]),
            }
        },
        "cls_token": np.asarray(sd[f"{prefix}.cls_token"]),
        "pos_embed": pos,
        "norm": {"scale": sd[f"{prefix}.norm.weight"], "bias": sd[f"{prefix}.norm.bias"]},
    }
    for i in range(n_layers):
        p = f"{prefix}.blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
            "attn": {
                # timm fused qkv [3W, W] -> fused qkv_proj kernel [W, 3W]
                "qkv_proj": {"kernel": _t(sd[f"{p}.attn.qkv.weight"]), "bias": np.asarray(sd[f"{p}.attn.qkv.bias"])},
                "out_proj": {"kernel": _t(sd[f"{p}.attn.proj.weight"]), "bias": sd[f"{p}.attn.proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": _t(sd[f"{p}.mlp.fc1.weight"]), "bias": sd[f"{p}.mlp.fc1.bias"]},
                "fc2": {"kernel": _t(sd[f"{p}.mlp.fc2.weight"]), "bias": sd[f"{p}.mlp.fc2.bias"]},
            },
        }
    return out


def _convert_bert_attention(sd: Dict[str, np.ndarray], p: str) -> dict:
    return {
        "query": {"kernel": _t(sd[f"{p}.self.query.weight"]), "bias": sd[f"{p}.self.query.bias"]},
        "key": {"kernel": _t(sd[f"{p}.self.key.weight"]), "bias": sd[f"{p}.self.key.bias"]},
        "value": {"kernel": _t(sd[f"{p}.self.value.weight"]), "bias": sd[f"{p}.self.value.bias"]},
        "output_dense": {"kernel": _t(sd[f"{p}.output.dense.weight"]), "bias": sd[f"{p}.output.dense.bias"]},
        "output_ln": {"scale": sd[f"{p}.output.LayerNorm.weight"], "bias": sd[f"{p}.output.LayerNorm.bias"]},
    }


def convert_med_bert(
    sd: Dict[str, np.ndarray], prefix: str, n_layers: int, with_pooler: bool, include_cross_attention: bool = True
) -> dict:
    pos_emb = np.asarray(sd[f"{prefix}.embeddings.position_embeddings.weight"])
    # HF BertEmbeddings adds token_type_embeddings[0] at every position (BLIP
    # always passes zero token_type_ids); our MED has no token-type table, so
    # fold that constant row into the position embeddings -- exact.
    tt_key = f"{prefix}.embeddings.token_type_embeddings.weight"
    if tt_key in sd:
        pos_emb = pos_emb + np.asarray(sd[tt_key])[0][None, :]
    out = {
        "word_embeddings": np.asarray(sd[f"{prefix}.embeddings.word_embeddings.weight"]),
        "position_embeddings": pos_emb,
        "embeddings_ln": {
            "scale": sd[f"{prefix}.embeddings.LayerNorm.weight"],
            "bias": sd[f"{prefix}.embeddings.LayerNorm.bias"],
        },
    }
    for i in range(n_layers):
        p = f"{prefix}.encoder.layer.{i}"
        layer = {
            "attention": _convert_bert_attention(sd, f"{p}.attention"),
            "intermediate": {"kernel": _t(sd[f"{p}.intermediate.dense.weight"]), "bias": sd[f"{p}.intermediate.dense.bias"]},
            "output_dense": {"kernel": _t(sd[f"{p}.output.dense.weight"]), "bias": sd[f"{p}.output.dense.bias"]},
            "output_ln": {"scale": sd[f"{p}.output.LayerNorm.weight"], "bias": sd[f"{p}.output.LayerNorm.bias"]},
        }
        if include_cross_attention and f"{p}.crossattention.self.query.weight" in sd:
            layer["crossattention"] = _convert_bert_attention(sd, f"{p}.crossattention")
        out[f"layer_{i}"] = layer
    if with_pooler and f"{prefix}.pooler.dense.weight" in sd:
        out["pooler"] = {"kernel": _t(sd[f"{prefix}.pooler.dense.weight"]), "bias": sd[f"{prefix}.pooler.dense.bias"]}
    return out


def convert_blip_sf_params(
    sd: Dict[str, np.ndarray], vit_layers: int, bert_layers: int, num_patches: int | None = None, image_size: int | None = None
) -> dict:
    sd = strip_prefix(sd)
    return {
        "visual_encoder": convert_blip_vit(sd, "visual_encoder", vit_layers, num_patches, image_size),
        # BLIP-SF runs the text encoder in mode="text" only; its cross-attention
        # params are frozen and unused in the reference (blip_sf.py:75-78) and
        # never materialize in our functional model -- drop them.
        "text_encoder": convert_med_bert(sd, "text_encoder", bert_layers, with_pooler=False, include_cross_attention=False),
        "vision_proj": {"kernel": _t(sd["vision_proj.weight"]), "bias": sd["vision_proj.bias"]},
        "text_proj": {"kernel": _t(sd["text_proj.weight"]), "bias": sd["text_proj.bias"]},
        "temp": np.asarray(sd["temp"]).reshape(()),
    }


def convert_blip_ff_params(
    sd: Dict[str, np.ndarray], vit_layers: int, bert_layers: int, num_patches: int | None = None, image_size: int | None = None
) -> dict:
    sd = strip_prefix(sd)
    return {
        "visual_encoder": convert_blip_vit(sd, "visual_encoder", vit_layers, num_patches, image_size),
        "text_encoder": convert_med_bert(sd, "text_encoder", bert_layers, with_pooler=True),
        "temp": np.asarray(sd["temp"]).reshape(()),
    }


# ---------------------------------------------------------------------------
# File-level entry
# ---------------------------------------------------------------------------

_LAYERS = {
    "test-tiny": (2, 2),
    "ViT-B/32": (12, 12),
    "ViT-B/16": (12, 12),
    "ViT-L/14": (24, 12),
    "base": (12, 12),
    "large": (24, 12),
}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return to_numpy_state_dict(strip_prefix(sd))


# Source keys a correct conversion is EXPECTED to leave unconsumed, by
# construction (regexes over the module.-stripped key space):
_EXPECTED_UNUSED = {
    "CLIP": [
        r"^(clip_model\.)?(input_resolution|context_length|vocab_size)$",  # JIT-export scalars
    ],
    "BLIP": [
        r"_m\.",  # momentum twins (rebuilt as the params_m copy at init)
        r"^(vision_proj_m|text_proj_m)\.",
        r"(^|\.)(image|text|idx|query|cand|ptr)_queue$",
        r"^queue_ptr$",
        r"\.position_ids$",  # HF non-param buffer
        r"\.token_type_embeddings\.weight$",  # folded into position_embeddings
        r"^(itm_head|text_decoder)\.",  # pretraining heads the retriever never uses
    ],
    "CLIPFeatureFusion": [
        r"^(clip_model\.)?text_projection$",  # deleted by the reference (clip_ff.py:107)
    ],
    "BLIPScoreFusion": [
        r"^text_encoder\.encoder\.layer\.\d+\.crossattention\.",  # frozen+unused (blip_sf.py:75-78)
        r"^text_encoder\.pooler\.",  # SF pools CLS manually
    ],
}


def audit_conversion(sd: "_TrackedSD", model_name: str) -> dict:
    """Partition unconsumed source keys into expected vs unexpected."""
    import re

    pats = list(_EXPECTED_UNUSED["CLIP" if model_name.startswith("CLIP") else "BLIP"])
    pats += _EXPECTED_UNUSED.get(model_name, [])
    expected, unexpected = [], []
    for k in sd.unconsumed():
        k_stripped = k[len("module.") :] if k.startswith("module.") else k
        (expected if any(re.search(p, k_stripped) for p in pats) else unexpected).append(k)
    return {"consumed": len(sd.consumed), "expected_unused": expected, "unexpected_unused": unexpected}


def check_target_coverage(converted: dict, like: dict) -> None:
    """Fail if the converted tree is missing leaves (or has extras / wrong
    shapes) vs the model-initialized template `like` -- the 'un-initialized
    target leaf' half of the strict audit."""
    import jax

    conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    tmpl = {jax.tree_util.keystr(p): np.shape(v) for p, v in jax.tree_util.tree_flatten_with_path(like)[0]}
    missing = sorted(set(tmpl) - set(conv))
    extra = sorted(set(conv) - set(tmpl))
    bad_shapes = sorted(k for k in set(conv) & set(tmpl) if conv[k] != tmpl[k])
    if missing or extra or bad_shapes:
        msg = ["converted checkpoint does not cover the target param tree:"]
        msg += [f"  missing leaf {k} {tmpl[k]}" for k in missing[:20]]
        msg += [f"  extra leaf {k} {conv[k]}" for k in extra[:20]]
        msg += [f"  shape mismatch {k}: ckpt {conv[k]} vs model {tmpl[k]}" for k in bad_shapes[:20]]
        raise ValueError("\n".join(msg))


def convert_checkpoint(
    path: str,
    model_name: str,
    size_key: str,
    num_patches: int | None = None,
    strict: bool = False,
    like: dict | None = None,
    image_size: int | None = None,
) -> dict:
    """Load a published torch checkpoint and convert for `model_name`.

    size_key: CLIP tower name ("ViT-L/14") or BLIP vit size ("base"/"large").
    strict=True fails on any source key the conversion did not consume and is
    not expected-unused by construction (momentum twins, queues, buffers) --
    a renamed key in a published checkpoint then raises instead of silently
    loading garbage (contrast reference blip.py:263-289, which only reports
    shape-mismatch drops).  `like` (a model-initialized param tree) adds the
    reverse check: every target leaf must be produced, with matching shape.
    """
    sd = _TrackedSD(load_torch_checkpoint(path))
    a, b = _LAYERS[size_key]
    if model_name == "CLIPScoreFusion":
        out = convert_clip_sf_params(sd, a, b)
    elif model_name == "CLIPFeatureFusion":
        out = convert_clip_ff_params(sd, a, b)
    elif model_name == "BLIPScoreFusion":
        out = convert_blip_sf_params(sd, a, b, num_patches, image_size)
    elif model_name == "BLIPFeatureFusion":
        out = convert_blip_ff_params(sd, a, b, num_patches, image_size)
    else:
        raise ValueError(model_name)

    report = audit_conversion(sd, model_name)
    print(
        f"convert_checkpoint[{model_name}]: consumed {report['consumed']} keys, "
        f"{len(report['expected_unused'])} expected-unused, "
        f"{len(report['unexpected_unused'])} unexpected-unused"
    )
    if report["unexpected_unused"]:
        detail = "\n  ".join(report["unexpected_unused"][:40])
        if strict:
            raise ValueError(f"strict conversion: unconsumed source keys:\n  {detail}")
        print(f"  WARNING unconsumed source keys:\n  {detail}")
    if like is not None:
        check_target_coverage(out, like)
    return out
