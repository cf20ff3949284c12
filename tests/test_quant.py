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


def test_int8_matmul_wonly_backend(monkeypatch):
    """Weight-only backend: int8 weights into a bf16 matmul, dequant in the
    output epilogue -- strictly MORE accurate than dynamic-activation int8
    (activations stay bf16)."""
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "wonly")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
    b = rng.normal(size=(32,)).astype(np.float32)
    q, scale = quantize_weight(w)
    y_q = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b)))
    y_f = x @ w + b
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.03, rel


def test_fused_pallas_int8_matmul_interpret():
    """quant_pallas kernel (interpret mode) == the XLA int8 formulation."""
    from uniir_tpu.ops.quant_pallas import fused_int8_matmul, fused_int8_matmul_supported

    rng = np.random.default_rng(3)
    M, K, N = 640, 256, 128  # M % tile != 0 exercises the pad/slice path
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    b = rng.normal(size=(N,)).astype(np.float32)
    q, scale = quantize_weight(w)
    assert fused_int8_matmul_supported(x.shape, K, N)
    y_pl = np.asarray(
        fused_int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b), interpret=True),
        np.float32,
    )
    y_f = x @ w + b
    rel = np.abs(y_pl - y_f).max() / np.abs(y_f).max()
    assert rel < 0.03, rel
    # 3-D leading dims flatten/restore
    y3 = fused_int8_matmul(
        jnp.asarray(x.reshape(2, M // 2, K)), jnp.asarray(q), jnp.asarray(scale), None, interpret=True
    )
    assert y3.shape == (2, M // 2, N)
    np.testing.assert_allclose(
        np.asarray(y3, np.float32).reshape(M, N), y_pl - b[None, :], rtol=0.05, atol=0.05
    )


def test_fused_pallas_int8_support_gate():
    from uniir_tpu.ops.quant_pallas import MAX_K, fused_int8_matmul_supported

    assert not fused_int8_matmul_supported((512, MAX_K * 2), MAX_K * 2, 1024)  # K too big
    assert not fused_int8_matmul_supported((512, 300), 300, 1024)  # K not lane-aligned
    assert not fused_int8_matmul_supported((512, 1024), 1024, 96)  # N not lane-aligned
    assert not fused_int8_matmul_supported((8, 1024), 1024, 1024)  # tiny M: XLA path
    assert fused_int8_matmul_supported((256, 77, 768), 768, 3072)


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


def test_quant_dense_columns_match_full():
    """QuantDense(columns=(lo,hi)) == full projection sliced [lo:hi) -- the
    fused-qkv self/cross attention paths rely on this (models/layers.py)."""
    import flax.linen as nn

    from uniir_tpu.ops.quant import QuantDense

    rng = np.random.default_rng(3)
    W = 32
    x = jnp.asarray(rng.normal(size=(4, 5, W)), jnp.float32)
    dense = QuantDense(3 * W, dtype=jnp.float32)
    params = {
        "kernel_q": rng.integers(-127, 128, size=(W, 3 * W)).astype(np.int8),
        "scale": rng.uniform(0.01, 0.1, size=(3 * W,)).astype(np.float32),
        "bias": rng.normal(size=(3 * W,)).astype(np.float32),
    }
    full = dense.apply({"params": params}, x)
    for lo, hi in [(0, W), (W, 2 * W), (2 * W, 3 * W), (W, 3 * W)]:
        part = dense.apply({"params": params}, x, columns=(lo, hi))
        np.testing.assert_allclose(np.asarray(part), np.asarray(full[..., lo:hi]), rtol=1e-5, atol=1e-5)


def test_quantize_tree_jax_matches_host():
    """quantize_tree_jax (the device-side path bench.py jits -- params never
    leave the accelerator) produces the same structure AND bit-identical int8
    kernels/scales as the host quantize_tree."""
    import jax

    from uniir_tpu.ops.quant import quantize_tree, quantize_tree_jax

    rng = np.random.default_rng(7)
    params = {
        "blk": {
            "proj": {
                "kernel": rng.normal(size=(16, 24)).astype(np.float32),
                "bias": rng.normal(size=(24,)).astype(np.float32),
            },
            "ln": {"scale": np.ones((16,), np.float32), "bias": np.zeros((16,), np.float32)},
            "mlp": {
                "fc1": {"kernel": rng.normal(size=(16, 64)).astype(np.float32)},
                "fc2": {"kernel": rng.normal(size=(64, 16)).astype(np.float32)},
            },
        },
        "embedding": rng.normal(size=(10, 16)).astype(np.float32),  # non-Dense leaf passes through
    }
    scales = {("blk", "mlp"): np.array([0.01, 0.02], np.float32)}
    host = quantize_tree(params, act_scales=dict(scales))
    dev = jax.device_get(jax.jit(lambda p: quantize_tree_jax(p, act_scales=dict(scales)))(params))
    assert jax.tree_util.tree_structure(host) == jax.tree_util.tree_structure(dev)
    for (kp, h), (_, d) in zip(
        jax.tree_util.tree_flatten_with_path(host)[0], jax.tree_util.tree_flatten_with_path(dev)[0]
    ):
        np.testing.assert_array_equal(np.asarray(h), np.asarray(d), err_msg=str(kp))
