"""Fused int8 MLP block kernel: interpret-mode equality with the jnp oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.ops.mlp_pallas import (
    fused_int8_mlp,
    fused_int8_mlp_supported,
    reference_int8_mlp,
)
from uniir_tpu.ops.quant import quantize_weight


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
@pytest.mark.parametrize("M", [256, 300])  # 300 exercises the masked boundary block
def test_fused_int8_mlp_matches_oracle(M, act):
    W, H = 256, 512
    rng = np.random.default_rng(0)
    h = rng.normal(size=(M, W)).astype(np.float32) * 0.5
    res = rng.normal(size=(M, W)).astype(np.float32)
    w1 = rng.normal(size=(W, H)).astype(np.float32) * 0.05
    w2 = rng.normal(size=(H, W)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1
    b2 = rng.normal(size=(W,)).astype(np.float32) * 0.1
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    def np_act(v):
        if act == "quick_gelu":
            return v * (1 / (1 + np.exp(-1.702 * v)))
        from uniir_tpu.ops.mlp_pallas import _act

        return np.asarray(_act(act, jnp.asarray(v, jnp.float32)), np.float32)

    a1 = np.float32(np.abs(h).max() / 127.0)
    # calibrated hidden scale: amax of the bf16 activation output
    hf = (np.clip(np.round(h / a1), -127, 127) @ w1q.astype(np.float32)) * (a1 * s1) + b1
    act_np = np_act(hf)
    a2 = np.float32(max(np.abs(act_np).max(), 1e-4) / 127.0)

    args = (
        jnp.asarray(h, jnp.bfloat16),
        jnp.asarray(res, jnp.bfloat16),
        jnp.asarray(w1q),
        jnp.asarray(s1),
        jnp.asarray(b1),
        jnp.asarray(w2q),
        jnp.asarray(s2),
        jnp.asarray(b2),
        jnp.float32(a1),
        jnp.float32(a2),
    )
    y_k = np.asarray(fused_int8_mlp(*args, act=act, tm=128, interpret=True), np.float32)
    y_r = np.asarray(reference_int8_mlp(*args[:8], a1, a2, act=act), np.float32)
    # identical quantized integers; differences only from bf16 IO rounding
    err = np.abs(y_k - y_r).max() / max(np.abs(y_r).max(), 1e-6)
    assert err < 0.02, err

    # and the int8 math tracks the float MLP closely (static-scale sanity)
    y_f = np_act(h @ w1 + b1) @ w2 + b2 + res
    cos = np.sum(y_k * y_f) / (np.linalg.norm(y_k) * np.linalg.norm(y_f))
    assert cos > 0.995, cos


def test_static_backend_end_to_end(monkeypatch):
    """Calibrate -> quantize_tree -> quant Transformer under
    UNIIR_INT8_BACKEND=static tracks the bf16 model (cosine per token)."""
    import jax

    from uniir_tpu.models.layers import Transformer
    from uniir_tpu.ops.calibrate import calibrate_act_scales
    from uniir_tpu.ops.quant import quantize_tree

    W, layers, heads = 128, 2, 2
    model = Transformer(W, layers, heads, act="quick_gelu", dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, W)) * 0.3, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y_f = np.asarray(model.apply({"params": params}, x), np.float32)

    scales = calibrate_act_scales(model, params, [(x,)], act="quick_gelu")
    # round 4: calibration also emits per-attention [a_qkv, a_out] scales
    assert set(scales) == {
        (f"resblocks_{i}", sub) for i in range(layers) for sub in ("mlp", "attn")
    }
    qparams = quantize_tree(params, act_scales=scales)
    for i in range(layers):
        assert qparams[f"resblocks_{i}"]["mlp"]["act_scales"].shape == (2,)
        assert qparams[f"resblocks_{i}"]["attn"]["act_scales"].shape == (2,)

    # UNIIR_INT8_MLP=fused: the Pallas megakernel formulation (opt-in since
    # round 4 -- on v5e the XLA formulation wins end-to-end, see layers.py)
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    monkeypatch.setenv("UNIIR_INT8_MLP", "fused")
    qmodel = Transformer(W, layers, heads, act="quick_gelu", dtype=jnp.bfloat16, quant=True)
    y_q = np.asarray(qmodel.apply({"params": qparams}, x), np.float32)
    cos = np.sum(y_q * y_f) / (np.linalg.norm(y_q) * np.linalg.norm(y_f))
    assert cos > 0.99, cos

    # UNIIR_INT8_MLP=xla (the default): same static scales through plain XLA
    # matmuls instead of the Pallas megakernel -- must track the float model
    # just as closely (the formulations differ only in intermediate rounding)
    monkeypatch.setenv("UNIIR_INT8_MLP", "xla")
    y_x = np.asarray(qmodel.apply({"params": qparams}, x), np.float32)
    cos_x = np.sum(y_x * y_f) / (np.linalg.norm(y_x) * np.linalg.norm(y_f))
    assert cos_x > 0.99, cos_x


def test_quantize_tree_rejects_stale_calibration():
    from uniir_tpu.ops.quant import quantize_tree

    params = {"fc1": {"kernel": np.ones((4, 4), np.float32)}}
    with pytest.raises(AssertionError, match="not found"):
        quantize_tree(params, act_scales={("nope", "mlp"): np.ones(2, np.float32)})


def test_supported_gate():
    assert fused_int8_mlp_supported(1024, 4096, "quick_gelu")
    assert fused_int8_mlp_supported(768, 3072, "gelu")
    assert not fused_int8_mlp_supported(1000, 4096, "quick_gelu")  # lane alignment
    assert not fused_int8_mlp_supported(4096, 16384, "quick_gelu")  # weights blow VMEM
    assert not fused_int8_mlp_supported(1024, 4096, "relu")


def test_3d_leading_dims():
    W, H = 256, 512
    rng = np.random.default_rng(1)
    h = rng.normal(size=(4, 32, W)).astype(np.float32)
    res = rng.normal(size=(4, 32, W)).astype(np.float32)
    w1q, s1 = quantize_weight(rng.normal(size=(W, H)).astype(np.float32) * 0.05)
    w2q, s2 = quantize_weight(rng.normal(size=(H, W)).astype(np.float32) * 0.05)
    out = fused_int8_mlp(
        jnp.asarray(h, jnp.bfloat16),
        jnp.asarray(res, jnp.bfloat16),
        jnp.asarray(w1q),
        jnp.asarray(s1),
        jnp.zeros((H,), jnp.float32),
        jnp.asarray(w2q),
        jnp.asarray(s2),
        jnp.zeros((W,), jnp.float32),
        jnp.float32(0.05),
        jnp.float32(0.05),
        interpret=True,
    )
    assert out.shape == (4, 32, W) and out.dtype == jnp.bfloat16
