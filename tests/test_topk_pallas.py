"""Fused Pallas top-k kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.ops.topk import topk_numpy_reference
from uniir_tpu.ops.topk_pallas import CHUNK, GROUP, _bucket_rows, bucket_max_scores, pallas_topk
from uniir_tpu.retrieval.index import normalize_l2

RNG = np.random.default_rng(0)
POOL = jnp.asarray(normalize_l2(RNG.normal(size=(4 * CHUNK, 64)).astype(np.float32)), jnp.bfloat16)
QUERIES = normalize_l2(RNG.normal(size=(16, 64)).astype(np.float32))


def test_bucket_rows_partition():
    ids = jnp.arange(4 * CHUNK // GROUP, dtype=jnp.int32)
    rows = np.asarray(_bucket_rows(ids)).reshape(-1)
    assert sorted(rows.tolist()) == list(range(4 * CHUNK))  # exact partition


def test_bucket_max_correct():
    maxima = np.asarray(bucket_max_scores(jnp.asarray(QUERIES), POOL, interpret=True)).astype(np.float32)
    scores = QUERIES @ np.asarray(POOL, np.float32).T
    ids = jnp.arange(maxima.shape[1], dtype=jnp.int32)
    rows = np.asarray(_bucket_rows(ids))  # [NB, GROUP]
    ref = scores[:, rows].max(axis=-1)
    np.testing.assert_allclose(maxima, ref, atol=2e-2)


def test_pallas_topk_matches_bruteforce():
    v, i = pallas_topk(jnp.asarray(QUERIES), POOL, k=5, interpret=True)
    rv, ri = topk_numpy_reference(QUERIES, np.asarray(POOL, np.float32), 5)
    for r in range(16):
        assert len(set(np.asarray(i[r]).tolist()) & set(ri[r].tolist())) >= 4
    np.testing.assert_allclose(np.asarray(v), rv, atol=2e-2)


def test_pallas_topk_valid_n():
    v, i = pallas_topk(jnp.asarray(QUERIES), POOL, k=5, valid_n=3000, interpret=True)
    assert (np.asarray(i) < 3000).all()
    rv, ri = topk_numpy_reference(QUERIES, np.asarray(POOL, np.float32)[:3000], 5)
    for r in range(16):
        assert len(set(np.asarray(i[r]).tolist()) & set(ri[r].tolist())) >= 4


def test_pallas_topk_int8_candidate_generation():
    """int8 bucket-max sweep + exact bf16 rescore: same results as the exact
    path, for BOTH scale granularities (per-bucket = the serving default with
    the int32-max kernel; per-row = the dequantize-then-max kernel)."""
    from uniir_tpu.ops.topk_pallas import quantize_pool

    v, i = pallas_topk(jnp.asarray(QUERIES), POOL, k=5, interpret=True)
    for per_bucket, scale_shape in [(True, (POOL.shape[0] // GROUP,)), (False, (POOL.shape[0],))]:
        pool_q, pool_scale = quantize_pool(POOL, per_bucket=per_bucket)
        assert pool_q.dtype == jnp.int8 and pool_scale.shape == scale_shape
        v8, i8 = pallas_topk(
            jnp.asarray(QUERIES), POOL, k=5, interpret=True, pool_quant=(pool_q, pool_scale)
        )
        # exact rescore means identical top-k sets and identical (bf16) scores
        for r in range(16):
            assert set(np.asarray(i8[r]).tolist()) == set(np.asarray(i[r]).tolist()), (per_bucket, r)
        np.testing.assert_allclose(np.asarray(v8), np.asarray(v), atol=1e-5)
        # valid_n masking works on the int8 path too (3000 is mid-chunk, so
        # the boundary chunk exercises partial buckets; the bucketed kernel
        # additionally NEG-masks fully-invalid buckets after dequant)
        v8b, i8b = pallas_topk(
            jnp.asarray(QUERIES), POOL, k=5, valid_n=3000, interpret=True, pool_quant=(pool_q, pool_scale)
        )
        assert (np.asarray(i8b) < 3000).all(), per_bucket


def test_pallas_topk_guard():
    """with_guard: exact path is always certain; the int8 path's per-query
    guard certifies that the k-th exact score clears the int8 cut line (on a
    well-separated Gaussian pool at overfetch=4, all queries should pass)."""
    from uniir_tpu.ops.topk_pallas import quantize_pool

    v, i, ok = pallas_topk(jnp.asarray(QUERIES), POOL, k=5, interpret=True, with_guard=True)
    assert np.asarray(ok).all() and v.shape == (16, 5)

    pool_q, pool_scale = quantize_pool(POOL)
    v8, i8, ok8 = pallas_topk(
        jnp.asarray(QUERIES), POOL, k=5, interpret=True,
        pool_quant=(pool_q, pool_scale), with_guard=True,
    )
    assert np.asarray(ok8).all()
    # a starved overfetch must trip the guard rather than silently degrade
    _, _, ok1 = pallas_topk(
        jnp.asarray(QUERIES), POOL, k=5, interpret=True,
        pool_quant=(pool_q, pool_scale), overfetch=1, with_guard=True,
    )
    assert np.asarray(ok1).dtype == bool  # shape/type contract; may or may not trip


def test_pallas_topk_q_padding():
    # Q not a multiple of the tile: padding is applied and trimmed
    q = normalize_l2(RNG.normal(size=(5, 64)).astype(np.float32))
    v, i = pallas_topk(jnp.asarray(q), POOL, k=3, interpret=True)
    assert v.shape == (5, 3)


def test_attention_pallas_matches_reference():
    from uniir_tpu.ops.attention_pallas import mha_nocausal, mha_reference

    rng = np.random.default_rng(3)
    B, L, H, D = 2, 13, 4, 16
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32), jnp.bfloat16)
    o1 = mha_nocausal(q, k, v, interpret=True)
    o2 = mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=2e-2
    )


def test_mha_paired_masked_boundary_blocks():
    """mha_paired with L not a multiple of 8 (the masked-boundary path that
    replaced the jnp.pad wrapper): exact vs the einsum reference, causal and
    non-causal, including an exact-multiple L as control."""
    from uniir_tpu.ops.attention_pallas import mha_paired, mha_reference

    rng = np.random.default_rng(7)
    for B, L, H, D, causal in [(2, 29, 4, 64, False), (2, 21, 4, 64, True), (2, 32, 4, 64, False)]:
        W = H * D
        q = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        out = np.asarray(mha_paired(q, k, v, H, interpret=True, causal=causal), np.float32)
        ref = np.asarray(
            mha_reference(
                jnp.asarray(np.asarray(q, np.float32).reshape(B, L, H, D)),
                jnp.asarray(np.asarray(k, np.float32).reshape(B, L, H, D)),
                jnp.asarray(np.asarray(v, np.float32).reshape(B, L, H, D)),
                causal=causal,
            ),
            np.float32,
        ).reshape(B, L, W)
        assert not np.isnan(out).any(), (L, causal)
        np.testing.assert_allclose(out, ref, atol=3e-2)


def test_paired_attention_in_model_and_grads():
    """Fused paired attention inside the vision tower (bf16): forward matches
    the einsum path and gradients flow (custom VJP through the fused bf16
    Pallas backward; _einsum_bwd is the retained oracle/fallback)."""
    from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPVisionTower

    cfg = CLIP_CONFIGS["test-tiny"]
    rng = np.random.default_rng(11)
    imgs = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    fused = CLIPVisionTower(cfg, dtype=jnp.bfloat16, fused_attention=True)
    plain = CLIPVisionTower(cfg, dtype=jnp.bfloat16, fused_attention=False)
    params = fused.init(jax.random.PRNGKey(0), imgs)["params"]

    o1 = fused.apply({"params": params}, imgs)
    o2 = plain.apply({"params": params}, imgs)
    np.testing.assert_allclose(np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=3e-2)

    def loss(p):
        return jnp.sum(fused.apply({"params": p}, imgs).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert any(np.abs(np.asarray(l, np.float32)).max() > 0 for l in leaves)

    def loss_plain(p):
        return jnp.sum(plain.apply({"params": p}, imgs).astype(jnp.float32) ** 2)

    g2 = jax.grad(loss_plain)(params)
    a = np.concatenate([np.asarray(l, np.float32).ravel() for l in jax.tree_util.tree_leaves(g)])
    b = np.concatenate([np.asarray(l, np.float32).ravel() for l in jax.tree_util.tree_leaves(g2)])
    # fused bf16 backward vs einsum VJP -> gradients agree to bf16 noise
    np.testing.assert_allclose(a, b, atol=0.6, rtol=0.2)


def test_paired_attention_causal_matches_reference():
    """Causal paired kernel (interpret mode) == causal einsum reference,
    values and gradients (the CLIP text tower path)."""
    import jax
    import jax.numpy as jnp

    from uniir_tpu.ops.attention_pallas import _einsum_flat, mha_paired, paired_attention

    rng = np.random.default_rng(11)
    B, L, H, D = 3, 13, 4, 8  # odd L exercises sublane padding + causal rows
    W = H * D
    q, k, v = (rng.standard_normal((B, L, W)).astype(np.float32) for _ in range(3))

    out_k = mha_paired(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, interpret=True, causal=True)
    out_r = _einsum_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, D**-0.5, causal=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-2)

    def loss_fused(q, k, v):
        return jnp.sum(paired_attention(q, k, v, H, D**-0.5, True, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_flat(q, k, v, H, D**-0.5, causal=True) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


def test_text_tower_fused_matches_einsum():
    """CLIPTextTower with fused causal attention == einsum path (bf16)."""
    import jax
    import jax.numpy as jnp

    from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPTextTower

    cfg = CLIP_CONFIGS["test-tiny"]
    rng = np.random.default_rng(12)
    txt = rng.integers(1, cfg.vocab_size - 2, (4, cfg.context_length)).astype(np.int32)
    txt[:, 5] = cfg.vocab_size - 1
    fused = CLIPTextTower(cfg, dtype=jnp.bfloat16, fused_attention=True)
    plain = CLIPTextTower(cfg, dtype=jnp.bfloat16, fused_attention=False)
    params = fused.init(jax.random.PRNGKey(0), txt)["params"]
    of = fused.apply({"params": params}, txt)
    op = plain.apply({"params": params}, txt)
    np.testing.assert_allclose(np.asarray(of, np.float32), np.asarray(op, np.float32), atol=3e-2)


def test_paired_stack_bwd_compiled_path_tpu():
    """Compiled (non-interpret) backward kernel smoke at a CLIP-L train shape:
    finite grads matching the einsum-VJP oracle.  Mosaic interpret-mode passes
    do not guarantee the compiled kernel lowers or that its numerics hold, so
    this must run on a real chip -- conftest pins the suite to CPU, so under
    pytest it standing-skips; the canonical on-chip runner is
    scripts/chip_check_attn_bwd.py (committed evidence:
    docs/chip_check_attn_bwd_r05.txt, 2026-08-19, ALL PASS)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("compiled-path smoke needs a real TPU (see chip_check_attn_bwd.py)")
    from uniir_tpu.ops.attention_pallas import _einsum_bwd, mha_paired_stack_bwd

    rng = np.random.default_rng(7)
    B, L, H, D = 8, 257, 16, 64
    q, k, v, g = (jnp.asarray(rng.standard_normal((B, L, H * D)), jnp.bfloat16) for _ in range(4))
    got = mha_paired_stack_bwd(q, k, v, g, H, D**-0.5, interpret=False, causal=False)
    want = _einsum_bwd(q, k, v, g, H, D**-0.5, False)
    for a, b, name in zip(got, want, "qkv"):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, b, atol=6e-2, err_msg=f"d{name} compiled path")


def test_paired_stack_bwd_kernel_matches_einsum_vjp():
    """The fused Pallas backward (dq/dk/dv in VMEM, no [L,L] HBM tensors) ==
    the einsum-VJP oracle, non-causal and causal, boundary and exact-multiple
    L, f32 and bf16 primals."""
    from uniir_tpu.ops.attention_pallas import _einsum_bwd, mha_paired_stack_bwd

    rng = np.random.default_rng(23)
    for B, L, H, D, causal, dt in [
        (2, 29, 4, 64, False, np.float32),
        (2, 21, 4, 64, True, np.float32),
        (2, 32, 4, 64, False, np.float32),
        (3, 13, 4, 8, True, np.float32),
        (2, 29, 4, 64, False, jnp.bfloat16),
    ]:
        W = H * D
        q, k, v, g = (jnp.asarray(rng.standard_normal((B, L, W)), dt) for _ in range(4))
        scale = D**-0.5
        got = mha_paired_stack_bwd(q, k, v, g, H, scale, interpret=True, causal=causal)
        want = _einsum_bwd(q, k, v, g, H, scale, causal)
        for a, b, name in zip(got, want, "qkv"):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            assert not np.isnan(a).any(), (L, causal, name)
            np.testing.assert_allclose(a, b, atol=6e-2, err_msg=f"d{name} L={L} causal={causal}")


def test_paired_stack_splitk_matches_reference(monkeypatch):
    """Split-K tail path (round 5): at l_valid % 128 == 1 the kernel runs its
    matmuls over the first l_valid-1 keys (whole lane tiles) and folds the
    last key in as a VPU rank-1 correction.  L=129 is the smallest engaging
    shape; checked against the einsum reference and against the non-splitk
    formulation (UNIIR_ATTN_SPLITK=0), both exact to bf16 tolerance."""
    from uniir_tpu.ops.attention_pallas import mha_paired_stack, mha_reference

    rng = np.random.default_rng(11)
    B, L, H, D = 2, 129, 4, 64
    W = H * D
    q = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
    ref = np.asarray(
        mha_reference(
            jnp.asarray(np.asarray(q, np.float32).reshape(B, L, H, D)),
            jnp.asarray(np.asarray(k, np.float32).reshape(B, L, H, D)),
            jnp.asarray(np.asarray(v, np.float32).reshape(B, L, H, D)),
        ),
        np.float32,
    ).reshape(B, L, W)

    monkeypatch.setenv("UNIIR_ATTN_SPLITK", "1")
    out = np.asarray(mha_paired_stack(q, k, v, H, interpret=True), np.float32)
    assert not np.isnan(out).any()
    np.testing.assert_allclose(out, ref, atol=3e-2)

    monkeypatch.setenv("UNIIR_ATTN_SPLITK", "0")
    out_nosplit = np.asarray(mha_paired_stack(q, k, v, H, interpret=True), np.float32)
    np.testing.assert_allclose(out, out_nosplit, atol=3e-2)

    # exp2 softmax variant under splitk
    monkeypatch.setenv("UNIIR_ATTN_SPLITK", "1")
    out2 = np.asarray(mha_paired_stack(q, k, v, H, interpret=True, softmax_impl="exp2"), np.float32)
    np.testing.assert_allclose(out2, ref, atol=3e-2)


def test_paired_stack_splitk_with_l_valid_padded(monkeypatch):
    """Padded-flat contract + split-K together: arrays physically padded to
    ceil8(L) with l_valid = true length; valid rows must match the reference
    over the valid region and keys past l_valid must not contribute."""
    from uniir_tpu.ops.attention_pallas import mha_paired_stack, mha_reference

    rng = np.random.default_rng(13)
    B, L, H, D = 2, 129, 4, 64
    W = H * D
    Lp = -(-L // 8) * 8  # 136
    q = rng.normal(size=(B, Lp, W)).astype(np.float32)
    k = rng.normal(size=(B, Lp, W)).astype(np.float32)
    v = rng.normal(size=(B, Lp, W)).astype(np.float32)
    # poison the pad rows: they must never contribute to valid outputs
    q[:, L:] = 1e4
    k[:, L:] = 1e4
    v[:, L:] = 1e4
    qb, kb, vb = (jnp.asarray(t, jnp.bfloat16) for t in (q, k, v))
    monkeypatch.setenv("UNIIR_ATTN_SPLITK", "1")
    out = np.asarray(mha_paired_stack(qb, kb, vb, H, interpret=True, l_valid=L), np.float32)
    ref = np.asarray(
        mha_reference(
            jnp.asarray(q[:, :L].reshape(B, L, H, D), jnp.bfloat16).astype(jnp.float32),
            jnp.asarray(k[:, :L].reshape(B, L, H, D), jnp.bfloat16).astype(jnp.float32),
            jnp.asarray(v[:, :L].reshape(B, L, H, D), jnp.bfloat16).astype(jnp.float32),
        ),
        np.float32,
    ).reshape(B, L, W)
    assert not np.isnan(out[:, :L]).any()
    np.testing.assert_allclose(out[:, :L], ref, atol=3e-2)
