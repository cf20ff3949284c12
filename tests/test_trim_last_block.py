"""Last-block pooled-query trimming must be EXACT (same output as the full
forward for the pooled token) across every tower that enables it.

The optimization (layers.py TransformerBlock pool_idx, blip_vit.py BLIPBlock
pool_first, med.py BertLayer pool_first) skips computing final-layer outputs
for discarded positions; any divergence beyond float noise is a bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_clip_vision_trim_matches_full(rng):
    from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPVisionTower

    cfg = CLIP_CONFIGS["test-tiny"]
    img = rng.standard_normal((4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    pooled = CLIPVisionTower(cfg, pool="cls", dtype=jnp.float32)
    params = pooled.init(jax.random.PRNGKey(0), img)["params"]
    out_trim = pooled.apply({"params": params}, img)
    # pool="none" runs the untrimmed transformer; ln_post+proj then CLS row
    full = CLIPVisionTower(cfg, pool="none", dtype=jnp.float32)
    out_full = full.apply({"params": params}, img)[:, 0, :]
    np.testing.assert_allclose(np.asarray(out_trim), np.asarray(out_full), atol=1e-5)


def test_clip_text_trim_matches_full_varied_eot(rng):
    from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPTextTower

    cfg = CLIP_CONFIGS["test-tiny"]
    B, L = 5, cfg.context_length
    txt = rng.integers(1, cfg.vocab_size - 2, (B, L)).astype(np.int32)
    for r, e in enumerate([1, L - 1, 4, 9, 2]):  # EOT first-ish / last / middle
        txt[r, e] = cfg.vocab_size - 1
        txt[r, e + 1 :] = 0
    pooled = CLIPTextTower(cfg, pool="eot", dtype=jnp.float32)
    params = pooled.init(jax.random.PRNGKey(1), txt)["params"]
    out_trim = pooled.apply({"params": params}, txt)
    seq = CLIPTextTower(cfg, pool="none", dtype=jnp.float32).apply({"params": params}, txt)
    eot = txt.argmax(axis=-1)
    ref = np.take_along_axis(np.asarray(seq), eot[:, None, None], axis=1)[:, 0] @ np.asarray(
        params["text_projection"]
    )
    np.testing.assert_allclose(np.asarray(out_trim), ref, atol=1e-5)


def test_blip_vit_trim_matches_full(rng):
    from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS, BLIPVisionTransformer

    cfg = BLIP_VIT_CONFIGS["test-tiny"]
    img = rng.standard_normal((3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    vit = BLIPVisionTransformer(cfg, dtype=jnp.float32)
    params = vit.init(jax.random.PRNGKey(2), img)["params"]
    full = vit.apply({"params": params}, img)[:, 0]
    trim = vit.apply({"params": params}, img, pool_cls=True)
    assert trim.shape[1] == 1
    np.testing.assert_allclose(np.asarray(trim[:, 0]), np.asarray(full), atol=1e-5)


@pytest.mark.parametrize("mode", ["text", "multimodal"])
def test_med_trim_matches_full(rng, mode):
    from uniir_tpu.models.med import MED_CONFIGS, MedBertModel

    cfg = MED_CONFIGS["test-tiny"]
    B, L = 4, 10
    ids = rng.integers(1, cfg.vocab_size - 1, (B, L)).astype(np.int32)
    amask = np.ones((B, L), np.int32)
    amask[1, 6:] = 0  # ragged padding: trimmed query must see the same mask row
    kwargs = {}
    if mode == "multimodal":
        kwargs["encoder_hidden_states"] = rng.standard_normal((B, 13, cfg.encoder_width)).astype(np.float32)
    med = MedBertModel(cfg, add_pooling_layer=True, dtype=jnp.float32)
    params = med.init(jax.random.PRNGKey(3), ids, attention_mask=amask, mode=mode, **kwargs)["params"]
    xf, pf = med.apply({"params": params}, ids, attention_mask=amask, mode=mode, **kwargs)
    xt, pt = med.apply({"params": params}, ids, attention_mask=amask, mode=mode, trim_last=True, **kwargs)
    assert xt.shape[1] == 1
    np.testing.assert_allclose(np.asarray(xt[:, 0]), np.asarray(xf[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pt), np.asarray(pf), atol=1e-5)
