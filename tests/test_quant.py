"""int8 quantized inference path: accuracy vs the float path."""

import jax
import jax.numpy as jnp
import numpy as np

from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.ops.quant import int8_matmul, quantize_tree, quantize_weight

CFG = CLIP_CONFIGS["test-tiny"]


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale
    assert np.abs(deq - w).max() < np.abs(w).max() / 100  # <1% of range


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
    b = rng.normal(size=(32,)).astype(np.float32)
    q, scale = quantize_weight(w)
    y_q = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b)))
    y_f = x @ w + b
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.03, rel


def test_quantized_clip_sf_embeddings_agree():
    model_f = CLIPScoreFusion(CFG)
    model_q = CLIPScoreFusion(CFG, quant=True)
    rng = np.random.default_rng(2)
    n = 6
    txt = rng.integers(1, CFG.vocab_size - 1, size=(n, CFG.context_length)).astype(np.int32)
    img = rng.normal(size=(n, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    mask = np.ones((n,), np.int32)
    params = model_f.init(jax.random.PRNGKey(0), txt, img, mask, mask)["params"]
    qparams = quantize_tree(params)

    # structure: the quantized tree slots into the quant model exactly
    init_q = model_q.init(jax.random.PRNGKey(0), txt[:1], img[:1], mask[:1], mask[:1])["params"]
    s1 = {"/".join(str(getattr(k, "key", k)) for k in p): np.shape(l) for p, l in jax.tree_util.tree_flatten_with_path(init_q)[0]}
    s2 = {"/".join(str(getattr(k, "key", k)) for k in p): np.shape(l) for p, l in jax.tree_util.tree_flatten_with_path(qparams)[0]}
    assert s1 == s2

    e_f = np.asarray(model_f.apply({"params": params}, txt, img, mask, mask))
    e_q = np.asarray(model_q.apply({"params": qparams}, txt, img, mask, mask))
    cos = np.sum(e_f * e_q, -1) / (np.linalg.norm(e_f, axis=-1) * np.linalg.norm(e_q, axis=-1))
    assert cos.min() > 0.99, cos
