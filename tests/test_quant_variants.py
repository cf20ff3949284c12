"""int8 serving across ALL FOUR model variants (round-4, VERDICT r3 item 3).

The reference serves all four variants through one fp16 embedder
(src/common/mbeir_embedder.py:464-495); this repo's int8 serving extension
must therefore cover them all: every variant's quant twin (quant=True) must
load a quantize_tree'd param tree and track the float model's embeddings,
under every activation backend (xla dynamic / weight-only / static).

Static backend notes: without calibrated `act_scales` leaves the static
backend falls back to dynamic per-row quantization (models/layers.py), so it
is exercised both bare (fallback) and with real calibrated scales from
ops/calibrate.py -- pre-LN towers (CLIP, BLIP ViT, T5) via LN captures,
post-LN MED via direct dense-input sows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.models.blip_ff import BLIPFeatureFusion
from uniir_tpu.models.blip_sf import BLIPScoreFusion
from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_ff import CLIPFeatureFusion
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.models.med import MED_CONFIGS
from uniir_tpu.ops.quant import quantize_tree

VIT = BLIP_VIT_CONFIGS["test-tiny"]
MED = MED_CONFIGS["test-tiny"]


def _clip_batch(cfg, rng, n):
    txt = rng.integers(1, cfg.vocab_size - 1, size=(n, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(n, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((n,), np.int32)
    return txt, img, mask, mask


def _blip_batch(rng, n, seq=12):
    ids = rng.integers(4, MED.vocab_size - 1, size=(n, seq)).astype(np.int32)
    attn = np.ones((n, seq), np.int32)
    attn[:, seq - 2 :] = 0
    img = rng.normal(size=(n, VIT.image_size, VIT.image_size, 3)).astype(np.float32)
    mask = np.ones((n,), np.int32)
    return {"input_ids": ids, "attention_mask": attn}, img, mask, mask


def _build(name):
    if name == "CLIPScoreFusion":
        cfg = CLIP_CONFIGS["test-tiny"]
        return CLIPScoreFusion(cfg), CLIPScoreFusion(cfg, quant=True), _clip_batch(cfg, np.random.default_rng(0), 4)
    if name == "CLIPFeatureFusion":
        cfg = CLIP_CONFIGS["test-tiny-ff"]
        return CLIPFeatureFusion(cfg), CLIPFeatureFusion(cfg, quant=True), _clip_batch(cfg, np.random.default_rng(1), 4)
    if name == "BLIPScoreFusion":
        kw = dict(vit_cfg=VIT, med_cfg=MED, embed_dim=16)
        return BLIPScoreFusion(**kw), BLIPScoreFusion(quant=True, **kw), _blip_batch(np.random.default_rng(2), 4)
    if name == "BLIPFeatureFusion":
        kw = dict(vit_cfg=VIT, med_cfg=MED, embed_dim=MED.hidden_size)
        return BLIPFeatureFusion(**kw), BLIPFeatureFusion(quant=True, **kw), _blip_batch(np.random.default_rng(3), 4)
    raise KeyError(name)


def _cosine(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


VARIANTS = ["CLIPScoreFusion", "CLIPFeatureFusion", "BLIPScoreFusion", "BLIPFeatureFusion"]


@pytest.mark.parametrize("backend", ["xla", "wonly", "static"])
@pytest.mark.parametrize("name", VARIANTS)
def test_variant_int8_embeddings_agree(name, backend, monkeypatch):
    """quant twin + quantize_tree'd params track the float embeddings for
    every variant under every backend ("static" here = uncalibrated fallback;
    the calibrated static path is covered below and in
    test_calibration_artifact.py)."""
    monkeypatch.setenv("UNIIR_INT8_BACKEND", backend)
    model_f, model_q, batch = _build(name)
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]

    # structure: the quantized tree slots into the quant twin exactly
    qparams = quantize_tree(params)
    init_q = model_q.init(jax.random.PRNGKey(0), *batch)["params"]
    paths = lambda t: {  # noqa: E731
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(init_q) == paths(qparams)

    e_f = model_f.apply({"params": params}, *batch)
    e_q = model_q.apply({"params": qparams}, *batch)
    assert np.all(np.isfinite(np.asarray(e_q, np.float32)))
    cos = _cosine(e_f, e_q)
    assert cos.min() > 0.98, (name, backend, cos)


def test_blip_sf_calibrated_static(monkeypatch):
    """BLIP calibrates end to end: pre-LN ViT via norm1/norm2 + attn probes,
    post-LN MED via the direct dense-input sows (q_in/kv_in/attn_pre_out per
    attention, ffn_in/ffn_hid per layer); the static backend consumes all."""
    from uniir_tpu.ops.calibrate import calibrate_act_scales

    model_f, model_q, batch = _build("BLIPScoreFusion")
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    e_f = model_f.apply({"params": params}, *batch)

    scales = calibrate_act_scales(model_f, params, [batch], act="gelu")
    vit = {p for p in scales if p[0] == "visual_encoder"}
    med = {p for p in scales if p[0] == "text_encoder"}
    assert vit | med == set(scales)
    assert len(vit) == 2 * VIT.layers  # mlp + attn per ViT block
    # self-attention 3-vector + FFN pair per MED layer (text mode: no cross)
    med_attn = {p for p in med if p[-1] == "attention"}
    med_ffn = {p for p in med if p[-1].startswith("layer_")}
    assert len(med_attn) == len(med_ffn) == MED.num_hidden_layers, sorted(med)
    for p in med_attn:
        assert scales[p].shape == (3,)

    qparams = quantize_tree(params, act_scales=scales)
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    e_q = model_q.apply({"params": qparams}, *batch)
    assert np.all(np.isfinite(np.asarray(e_q, np.float32)))
    cos = _cosine(e_f, e_q)
    assert cos.min() > 0.98, cos


def test_clip_ff_calibrated_static(monkeypatch):
    """CLIP-FF calibrates end to end: tower mlp+attn entries AND the T5
    fusion stack's per-block relu-FFN + attention entries (round 4); the
    static backend consumes all of them."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.ops.calibrate import calibrate_act_scales

    model_f, model_q, batch = _build("CLIPFeatureFusion")
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    e_f = model_f.apply({"params": params}, *batch)

    scales = calibrate_act_scales(model_f, params, [batch], act="quick_gelu")
    cfg = CLIP_CONFIGS["test-tiny-ff"]
    t5_blocks = {p for p in scales if p and p[0] == "t5_layers" and p[-1].startswith("block_")}
    t5_attns = {p for p in scales if p and p[0] == "t5_layers" and p[-1] == "attn"}
    tower_mlps = {p for p in scales if p[-1] == "mlp"}
    tower_attns = {p for p in scales if p[-1] == "attn" and p[0] != "t5_layers"}
    assert len(t5_blocks) == len(t5_attns) > 0, sorted(scales)
    assert len(tower_mlps) == len(tower_attns) == cfg.vision_layers + cfg.text_layers

    qparams = quantize_tree(params, act_scales=scales)
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    e_q = model_q.apply({"params": qparams}, *batch)
    assert np.all(np.isfinite(np.asarray(e_q, np.float32)))
    cos = _cosine(e_f, e_q)
    assert cos.min() > 0.98, cos


def test_blip_ff_calibrated_static_cross_attention(monkeypatch):
    """BLIP-FF's multimodal text pass calibrates the cross-attention too
    (q from the text stream, k/v from the ViT encoder output)."""
    from uniir_tpu.ops.calibrate import calibrate_act_scales

    model_f, model_q, batch = _build("BLIPFeatureFusion")
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    e_f = model_f.apply({"params": params}, *batch)

    scales = calibrate_act_scales(model_f, params, [batch], act="gelu")
    cross = {p for p in scales if p[-1] == "crossattention"}
    assert len(cross) == MED.num_hidden_layers, sorted(scales)
    for p in cross:
        assert scales[p].shape == (3,)

    qparams = quantize_tree(params, act_scales=scales)
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    e_q = model_q.apply({"params": qparams}, *batch)
    assert np.all(np.isfinite(np.asarray(e_q, np.float32)))
    cos = _cosine(e_f, e_q)
    assert cos.min() > 0.98, cos


@pytest.mark.parametrize("backend", ["xla", "static"])
def test_flat_serving_matches_3d(backend, monkeypatch):
    """UNIIR_INT8_FLAT (padded-flat vision tower, round 5): physically pads
    L to ceil8(L) and runs every projection/MLP dot 2-D, threading
    l_valid into the attention kernel.  Must produce the SAME embeddings as
    the 3-D formulation -- same dots over the same data, pad rows masked in
    attention and discarded at pooling."""
    monkeypatch.setenv("UNIIR_INT8_BACKEND", backend)
    model_f, model_q, batch = _build("CLIPScoreFusion")
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    qparams = quantize_tree(params)

    monkeypatch.setenv("UNIIR_INT8_FLAT", "0")
    e_3d = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    monkeypatch.setenv("UNIIR_INT8_FLAT", "1")
    e_flat = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    np.testing.assert_allclose(e_flat, e_3d, atol=2e-2, rtol=0)
    cos = _cosine(e_flat, e_3d)
    assert cos.min() > 0.999, cos


def test_flat_serving_matches_3d_feature_mode(monkeypatch):
    """CLIP-FF keeps the full vision token sequence (pool="none"): the flat
    tower must drop the pad rows before ln_post/proj."""
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "xla")
    model_f, model_q, batch = _build("CLIPFeatureFusion")
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    qparams = quantize_tree(params)

    monkeypatch.setenv("UNIIR_INT8_FLAT", "0")
    e_3d = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    monkeypatch.setenv("UNIIR_INT8_FLAT", "1")
    e_flat = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    np.testing.assert_allclose(e_flat, e_3d, atol=2e-2, rtol=0)


@pytest.mark.parametrize("name", ["BLIPScoreFusion", "BLIPFeatureFusion"])
def test_flat_serving_matches_3d_blip(name, monkeypatch):
    """BLIP ViT adopts the padded-flat int8 tower too: BLIP-SF exercises the
    CLS-pooled last block (pad keys masked in its single-query attention),
    BLIP-FF the full-sequence output that feeds MED cross-attention (pad
    rows must be dropped before it)."""
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "xla")
    model_f, model_q, batch = _build(name)
    params = model_f.init(jax.random.PRNGKey(0), *batch)["params"]
    qparams = quantize_tree(params)

    monkeypatch.setenv("UNIIR_INT8_FLAT", "0")
    e_3d = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    monkeypatch.setenv("UNIIR_INT8_FLAT", "1")
    e_flat = np.asarray(model_q.apply({"params": qparams}, *batch), np.float32)
    np.testing.assert_allclose(e_flat, e_3d, atol=2e-2, rtol=0)
    cos = _cosine(e_flat, e_3d)
    assert cos.min() > 0.999, cos
