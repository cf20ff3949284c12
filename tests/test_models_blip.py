import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.core.mesh import shard_batch
from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS, BLIPVisionTransformer
from uniir_tpu.models.med import MED_CONFIGS, MedBertModel
from uniir_tpu.models.blip_sf import BLIPScoreFusion
from uniir_tpu.models.blip_ff import BLIPFeatureFusion
from uniir_tpu.train.losses import momentum_distill_contrastive_loss
from uniir_tpu.train.optimizer import make_blip_optimizer
from uniir_tpu.train.state import MomentumTrainState
from uniir_tpu.train.steps import make_blip_train_step, make_blip_eval_step

VIT = BLIP_VIT_CONFIGS["test-tiny"]
MED = MED_CONFIGS["test-tiny"]
DIM = 16


def make_batch(rng, bs=4, neg=0, seq=12):
    n = bs * (2 + neg)
    ids = rng.integers(4, MED.vocab_size - 1, size=(n, seq)).astype(np.int32)
    attn = np.ones((n, seq), np.int32)
    attn[:, seq - 2 :] = 0
    img = rng.normal(size=(n, VIT.image_size, VIT.image_size, 3)).astype(np.float32)
    mask = np.ones((n,), np.int32)
    batch = {
        "txt_batched": {"input_ids": ids, "attention_mask": attn},
        "image_batched": img,
        "txt_mask_batched": mask,
        "image_mask_batched": mask,
        "p_did_list": (90_000_000 + rng.choice(10_000, size=bs, replace=False)).astype(np.int64),
    }
    if neg:
        batch["nc_dids_list"] = (95_000_000 + rng.choice(10_000, size=(bs, neg), replace=False)).astype(np.int64)
    return batch


def test_blip_vit_shapes():
    model = BLIPVisionTransformer(VIT)
    img = np.zeros((2, VIT.image_size, VIT.image_size, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    out = model.apply({"params": params}, img)
    n_patches = (VIT.image_size // VIT.patch_size) ** 2
    assert out.shape == (2, n_patches + 1, VIT.width)


def test_med_text_vs_multimodal():
    model = MedBertModel(MED, add_pooling_layer=True)
    ids = np.ones((2, 8), np.int32)
    attn = np.ones((2, 8), np.int32)
    enc = np.random.default_rng(0).normal(size=(2, 5, MED.encoder_width)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, attn, enc, None, "multimodal")["params"]
    # text mode skips cross-attention -> changing enc must not change output
    t1, _ = model.apply({"params": params}, ids, attn, enc, None, "text")
    t2, _ = model.apply({"params": params}, ids, attn, enc * 100, None, "text")
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
    # multimodal mode attends to the image tokens
    m1, p1 = model.apply({"params": params}, ids, attn, enc, None, "multimodal")
    m2, p2 = model.apply({"params": params}, ids, attn, enc * 100, None, "multimodal")
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    assert p1.shape == (2, MED.hidden_size)
    # crossattention params exist
    assert "crossattention" in params["layer_0"]


def test_med_attention_mask_blocks_padding():
    model = MedBertModel(MED, add_pooling_layer=False)
    ids = np.ones((1, 8), np.int32)
    attn = np.ones((1, 8), np.int32)
    attn[:, 4:] = 0
    params = model.init(jax.random.PRNGKey(0), ids, attn, None, None, "text")["params"]
    ids2 = ids.copy()
    ids2[:, 5] = 7  # change a masked-out position
    h1, _ = model.apply({"params": params}, ids, attn, None, None, "text")
    h2, _ = model.apply({"params": params}, ids2, attn, None, None, "text")
    # visible positions unaffected by masked-token change
    np.testing.assert_allclose(np.asarray(h1[:, :4]), np.asarray(h2[:, :4]), atol=1e-5)


@pytest.fixture(scope="module")
def blip_sf():
    rng = np.random.default_rng(0)
    model = BLIPScoreFusion(vit_cfg=VIT, med_cfg=MED, embed_dim=DIM)
    batch = make_batch(rng, bs=2)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["txt_batched"],
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )["params"]
    return model, params


def test_blip_sf_forward(blip_sf):
    model, params = blip_sf
    rng = np.random.default_rng(1)
    batch = make_batch(rng, bs=3)
    emb = model.apply(
        {"params": params},
        batch["txt_batched"],
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )
    assert emb.shape == (6, DIM)
    assert "temp" in params


def np_reference_momentum_loss(q, p, q_m, p_m, pc_idx, queue_q, queue_c, queue_idx, temp, alpha):
    """Reference blip loss without hard negs (blip_sf.py:214-287) in numpy.

    queue_q/queue_c are row-major [Q, D] (our layout; reference keeps [D, Q]).
    """

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def softmax(x, axis=1):
        m = x.max(axis=axis, keepdims=True)
        e = np.exp(x - m)
        return e / e.sum(axis=axis, keepdims=True)

    q, p, q_m, p_m = norm(q), norm(p), norm(q_m), norm(p_m)
    idx_all = np.concatenate([pc_idx, queue_idx])[None]  # [1, bs+Q]
    pos_idx = (pc_idx[:, None] == idx_all).astype(np.float32)
    sim_targets = pos_idx / pos_idx.sum(1, keepdims=True)
    q_m_all = np.concatenate([q_m, queue_q], axis=0)
    p_m_all = np.concatenate([p_m, queue_c], axis=0)
    sim_q2pc_m = q_m @ p_m_all.T / temp
    sim_pc2q_m = p_m @ q_m_all.T / temp
    t_q2pc = alpha * softmax(sim_q2pc_m) + (1 - alpha) * sim_targets
    t_pc2q = alpha * softmax(sim_pc2q_m) + (1 - alpha) * sim_targets
    sim_q2pc = q @ p_m_all.T / temp
    sim_pc2q = p @ q_m_all.T / temp

    def lsm(x):
        m = x.max(1, keepdims=True)
        return x - m - np.log(np.exp(x - m).sum(1, keepdims=True))

    loss = ((-(lsm(sim_q2pc) * t_q2pc).sum(1)).mean() + (-(lsm(sim_pc2q) * t_pc2q).sum(1)).mean()) / 2
    max_idxs = sim_q2pc.argmax(1)
    acc = pos_idx[np.arange(len(q)), max_idxs].mean()
    return loss, acc


def test_momentum_loss_matches_reference_semantics():
    rng = np.random.default_rng(5)
    bs, d, Q = 4, 8, 16
    emb = rng.normal(size=(2 * bs, d)).astype(np.float32)
    emb_m = rng.normal(size=(2 * bs, d)).astype(np.float32)
    pc_idx = np.array([11, 22, 33, 44], np.int64)
    qq = rng.normal(size=(Q, d)).astype(np.float32)
    qc = rng.normal(size=(Q, d)).astype(np.float32)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    qc /= np.linalg.norm(qc, axis=1, keepdims=True)
    qidx = np.full((Q,), -100, np.int64)
    qidx[3] = 22  # duplicate of query 1's positive in the queue

    out = momentum_distill_contrastive_loss(
        jnp.asarray(emb), jnp.asarray(emb_m), bs, jnp.asarray(pc_idx),
        jnp.asarray(qq), jnp.asarray(qc), jnp.asarray(qidx),
        jnp.asarray(0.07), jnp.asarray(0.4),
    )
    ref_loss, ref_acc = np_reference_momentum_loss(
        emb[:bs], emb[bs:], emb_m[:bs], emb_m[bs:], pc_idx, qq, qc, qidx, 0.07, 0.4
    )
    np.testing.assert_allclose(float(out["loss"]), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(float(out["accuracy"]), ref_acc, rtol=1e-6)


def test_blip_train_step_queue_and_momentum(mesh8, blip_sf):
    model, params = blip_sf
    params = jax.tree_util.tree_map(jnp.copy, params)
    bs, queue_size = 8, 16  # queue_size % global_bs == 0
    tx = make_blip_optimizer(params, 1e-3, total_steps=20)
    state = MomentumTrainState.create(params, tx, queue_size=queue_size, embed_dim=DIM)
    p_m_before = np.asarray(jax.tree_util.tree_leaves(state.params_m)[0]).copy()

    step = make_blip_train_step(model, mesh=mesh8, with_dropout=False)
    rng = np.random.default_rng(7)
    batch = make_batch(rng, bs=bs)
    dids0 = batch["p_did_list"].copy()
    sharded = shard_batch(mesh8, batch)
    state, m = step(state, sharded, jnp.asarray(0.4))
    assert int(state.queue_ptr) == bs
    np.testing.assert_array_equal(np.asarray(state.queue_idx[:bs]), dids0)
    assert np.isfinite(float(m["loss"]))
    # queue rows are normalized momentum embeddings
    norms = np.linalg.norm(np.asarray(state.queue_query[:bs]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    # second step wraps the pointer
    batch2 = make_batch(rng, bs=bs)
    state, _ = step(state, shard_batch(mesh8, batch2), jnp.asarray(0.4))
    assert int(state.queue_ptr) == 0  # wrapped: (8+8) % 16
    # momentum params moved toward online params but are not equal
    p_m_after = np.asarray(jax.tree_util.tree_leaves(state.params_m)[0])
    assert not np.allclose(p_m_before, p_m_after)

    # loss decreases over a few steps on a fixed batch
    losses = []
    for _ in range(6):
        state, m = step(state, shard_batch(mesh8, batch), jnp.asarray(0.0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # temp stays clamped
    assert 0.001 <= float(state.params["temp"]) <= 0.5


def _cross_leaves(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        path: np.asarray(v).copy()
        for path, v in flat
        if any("crossattention" in str(getattr(k, "key", k)) for k in path)
    }


def test_blip_sf_structural_crossattention_freeze(blip_sf):
    """BLIP-SF freezes cross-attention (reference blip_sf.py:75-78).

    In this rebuild the PRIMARY freeze is structural: mode="text" never
    traces the crossattention branch, so Flax init never creates those
    params, and convert_blip_sf_params drops them from published
    checkpoints (models/convert.py:310-313).  Frozen + never-read params
    affect nothing; omitting them saves 12 layers of dead weights in HBM,
    optimizer state, and checkpoints."""
    _, params = blip_sf
    assert _cross_leaves(params) == {}


def test_blip_freeze_mask_protects_grafted_crossattention(mesh8, blip_sf):
    """Optimizer-mask freeze for trees that DO carry crossattention params.

    A tree converted with include_cross_attention=True (convert_med_bert's
    default) carries the frozen subtree; torch `requires_grad=False` means
    AdamW neither steps NOR decays it.  The optax equivalent is routing the
    subtree to set_to_zero via freeze_path_sub -- a bare decay mask is NOT
    enough, because optax.adamw still applies weight decay to zero-grad
    leaves, silently decaying the frozen pretrained weights toward zero.
    Assert the frozen subtree is bit-identical after real train steps while
    the rest of the model moves, the momentum twin's cross-attention stays
    at its init values (EMA of an unchanged target), and that WITHOUT the
    mask the subtree decays (the exact corruption the mask prevents)."""
    from uniir_tpu.models.med import MedBertModel

    model, params = blip_sf
    params = jax.tree_util.tree_map(jnp.copy, params)
    # graft a crossattention subtree, as a checkpoint converted with
    # include_cross_attention=True would carry
    med = MedBertModel(MED, add_pooling_layer=False)
    rng = np.random.default_rng(11)
    ids = rng.integers(4, MED.vocab_size - 1, size=(2, 12)).astype(np.int32)
    attn = np.ones((2, 12), np.int32)
    enc = rng.normal(size=(2, 5, MED.encoder_width)).astype(np.float32)
    mp = med.init(jax.random.PRNGKey(1), ids, attn, enc, None, "multimodal")["params"]
    for i in range(MED.num_hidden_layers):
        layer = dict(params["text_encoder"][f"layer_{i}"])
        layer["crossattention"] = jax.tree_util.tree_map(jnp.copy, mp[f"layer_{i}"]["crossattention"])
        params["text_encoder"][f"layer_{i}"] = layer

    # snapshot BEFORE stepping: the jitted step donates state buffers, so
    # the original param arrays are deleted after the first step
    params_copy = jax.tree_util.tree_map(jnp.copy, params)
    vp_before = np.asarray(params["vision_proj"]["kernel"]).copy()
    before = _cross_leaves(params)
    assert before, "graft failed: crossattention subtree missing"

    tx = make_blip_optimizer(
        params, 1e-3, total_steps=20, weight_decay=0.05, freeze_path_sub="crossattention"
    )
    state = MomentumTrainState.create(params, tx, queue_size=16, embed_dim=DIM)

    step = make_blip_train_step(model, mesh=mesh8, with_dropout=False)
    for _ in range(3):
        state, m = step(state, shard_batch(mesh8, make_batch(rng, bs=8)), jnp.asarray(0.4))
    assert np.isfinite(float(m["loss"]))

    after = _cross_leaves(state.params)
    after_m = _cross_leaves(state.params_m)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=f"online {k} moved")
        # momentum EMA of an unchanged target: pm*m + p*(1-m) with pm == p
        # drifts at most ~1 ulp/step in fp32, never materially
        np.testing.assert_allclose(before[k], after_m[k], rtol=1e-6, atol=1e-7)
    # sanity: the non-frozen params actually trained
    assert not np.allclose(vp_before, np.asarray(state.params["vision_proj"]["kernel"]))

    # counterfactual: WITHOUT the freeze, adamw decays the zero-grad subtree
    tx_bad = make_blip_optimizer(params_copy, 1e-3, total_steps=20, weight_decay=0.05)
    state_bad = MomentumTrainState.create(params_copy, tx_bad, queue_size=16, embed_dim=DIM)
    state_bad, _ = step(state_bad, shard_batch(mesh8, make_batch(rng, bs=8)), jnp.asarray(0.4))
    after_bad = _cross_leaves(state_bad.params)
    changed = any(not np.array_equal(before[k], after_bad[k]) for k in before)
    assert changed, "expected unmasked adamw to decay the zero-grad crossattention subtree"


def test_blip_eval_step(blip_sf):
    model, params = blip_sf
    tx = make_blip_optimizer(params, 1e-3, total_steps=10)
    state = MomentumTrainState.create(params, tx, queue_size=8, embed_dim=DIM)
    rng = np.random.default_rng(9)
    batch = make_batch(rng, bs=4)
    out = make_blip_eval_step(model)(state, batch, jnp.asarray(0.4))
    assert np.isfinite(float(out["loss"]))
    assert int(state.queue_ptr) == 0  # eval is side-effect free


def test_blip_ff_forward():
    rng = np.random.default_rng(2)
    model = BLIPFeatureFusion(vit_cfg=VIT, med_cfg=MED, embed_dim=MED.hidden_size)
    batch = make_batch(rng, bs=2)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["txt_batched"],
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )["params"]
    emb = model.apply(
        {"params": params},
        batch["txt_batched"],
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )
    assert emb.shape == (4, MED.hidden_size)
    # fused: changing the image changes the text-pooled embedding
    batch2 = dict(batch)
    batch2["image_batched"] = batch["image_batched"] + 1.0
    emb2 = model.apply(
        {"params": params},
        batch2["txt_batched"],
        batch2["image_batched"],
        batch2["txt_mask_batched"],
        batch2["image_mask_batched"],
    )
    assert not np.allclose(np.asarray(emb), np.asarray(emb2))
