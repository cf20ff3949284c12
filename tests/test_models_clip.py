import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.core.mesh import shard_batch
from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPTextTower, CLIPVisionTower
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.train.losses import inbatch_contrastive_loss, l2_normalize
from uniir_tpu.train.optimizer import make_clip_optimizer, clip_decay_mask
from uniir_tpu.train.state import TrainState
from uniir_tpu.train.steps import make_clip_train_step, make_clip_eval_step, make_embed_step

CFG = CLIP_CONFIGS["test-tiny"]


def make_batch(rng, bs=8, neg=0):
    n = bs * (2 + neg)
    txt = rng.integers(1, CFG.vocab_size - 1, size=(n, CFG.context_length)).astype(np.int32)
    txt[:, -1] = CFG.vocab_size - 1  # ensure a max (EOT-ish) position
    img = rng.normal(size=(n, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    txt_mask = rng.integers(0, 2, size=(n,)).astype(np.int32)
    img_mask = 1 - txt_mask  # at least one modality each
    txt_mask[: n // 2] = 1
    img_mask[n // 2 :] = 1
    return {
        "txt_batched": txt,
        "image_batched": img,
        "txt_mask_batched": txt_mask,
        "image_mask_batched": img_mask,
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = CLIPScoreFusion(CFG)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, bs=2)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["txt_batched"],
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )["params"]
    return model, params


def test_clip_sf_forward_shapes(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    batch = make_batch(rng, bs=4)
    emb = model.apply({"params": params}, *[batch[k] for k in ("txt_batched", "image_batched", "txt_mask_batched", "image_mask_batched")])
    assert emb.shape == (8, CFG.embed_dim)
    assert emb.dtype == jnp.float32


def test_clip_sf_masked_fusion(model_and_params):
    """txt_mask=0 must zero the text contribution exactly (ref clip_sf.py:61-63)."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    batch = make_batch(rng, bs=2)
    txt_mask = np.array([0, 0, 1, 1], dtype=np.int32)
    img_mask = np.array([1, 1, 1, 1], dtype=np.int32)
    full = model.apply({"params": params}, batch["txt_batched"], batch["image_batched"], txt_mask, img_mask)
    img_only = model.apply(
        {"params": params},
        batch["txt_batched"],
        batch["image_batched"],
        np.zeros(4, np.int32),
        img_mask,
    )
    np.testing.assert_allclose(np.asarray(full[:2]), np.asarray(img_only[:2]), rtol=1e-6)
    assert not np.allclose(np.asarray(full[2:]), np.asarray(img_only[2:]))


def np_reference_inbatch_loss(q, p, scale):
    """Simulated reference DDP loss: per-rank CE vs gathered positives, mean over ranks."""
    world, bs_local = 4, q.shape[0] // 4
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=-1, keepdims=True)
    losses, accs = [], []
    for r in range(world):
        q_r = qn[r * bs_local : (r + 1) * bs_local]
        score = q_r @ pn.T * scale  # [bs_local, bs_global]
        targets = r * bs_local + np.arange(bs_local)
        lsm = score - np.log(np.sum(np.exp(score - score.max(1, keepdims=True)), 1, keepdims=True)) - score.max(1, keepdims=True)
        losses.append(-lsm[np.arange(bs_local), targets].mean())
        accs.append((score.argmax(1) == targets).mean())
    return np.mean(losses), np.mean(accs)


def test_global_loss_equals_simulated_ddp():
    rng = np.random.default_rng(3)
    bs, d = 16, 8
    emb = rng.normal(size=(2 * bs, d)).astype(np.float32)
    out = inbatch_contrastive_loss(jnp.asarray(emb), bs, jnp.asarray(10.0))
    ref_loss, ref_acc = np_reference_inbatch_loss(emb[:bs], emb[bs:], 10.0)
    np.testing.assert_allclose(float(out["loss"]), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(float(out["accuracy"]), ref_acc, rtol=1e-6)


def np_reference_hardneg_loss(q, p, n, scale, in_batch_neg_num):
    """The reference hard-neg NLL path (clip_sf.py:105-131) in numpy.

    Note: the reference's in-batch-negs expression
    ``p.unsqueeze(1).expand(-1,bs,-1)[eye==0]`` selects each query's OWN
    positive repeated bs-1 times (expand along dim 1), contradicting its code
    comment ("positive candidates from other queries").  We implement the
    documented intent: row i's in-batch negatives are p_j for j != i.
    """
    bs = q.shape[0]
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=-1, keepdims=True)
    nn_ = n / np.linalg.norm(n, axis=-1, keepdims=True)
    k = min(bs - 1, in_batch_neg_num)
    in_batch = np.stack([np.concatenate([pn[:i], pn[i + 1 :]], axis=0)[:k] for i in range(bs)], axis=0)
    aug = np.concatenate([nn_, in_batch], axis=1)
    pos = (qn * pn).sum(-1) * scale
    negs = (qn[:, None] * aug).sum(-1) * scale
    lm = np.concatenate([pos[:, None], negs], 1)
    m = lm.max(1, keepdims=True)
    lsm = lm - m - np.log(np.exp(lm - m).sum(1, keepdims=True))
    loss = (-lsm[:, 0]).mean()
    acc = (lm.argmax(1) == 0).mean()
    return loss, acc


def test_hardneg_loss_matches_reference_semantics():
    rng = np.random.default_rng(4)
    bs, neg, d = 6, 2, 8
    q = rng.normal(size=(bs, d)).astype(np.float32)
    p = rng.normal(size=(bs, d)).astype(np.float32)
    n = rng.normal(size=(bs, neg, d)).astype(np.float32)
    emb = np.concatenate([q, p, n.reshape(bs * neg, d)], axis=0)
    out = inbatch_contrastive_loss(jnp.asarray(emb), bs, jnp.asarray(5.0), hard_neg_num=neg, in_batch_neg_num=3)
    ref_loss, ref_acc = np_reference_hardneg_loss(q, p, n, 5.0, 3)
    np.testing.assert_allclose(float(out["loss"]), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(float(out["accuracy"]), ref_acc, rtol=1e-6)


def test_decay_mask_groups(model_and_params):
    _, params = model_and_params
    mask = clip_decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    names_decayed = {"/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat}
    # logit_scale and LN/bias excluded, kernels included
    for name, decayed in names_decayed.items():
        lname = name.lower()
        if "logit_scale" in lname or "bias" in lname or "ln_" in lname or "layernorm" in lname:
            assert not decayed, name
    assert any(v for v in names_decayed.values())


def test_train_step_learns_and_shards(mesh8, model_and_params):
    model, params = model_and_params
    # the train step donates the state, so give it its own copy of the params
    params = jax.tree_util.tree_map(jnp.copy, params)
    tx = make_clip_optimizer(params, learning_rate=3e-3, total_steps=50)
    state = TrainState.create(params=params, tx=tx)
    step = make_clip_train_step(model, mesh=mesh8)

    rng = np.random.default_rng(5)
    batch = make_batch(rng, bs=16)
    sharded = shard_batch(mesh8, batch)
    state, m0 = step(state, sharded)
    losses = [float(m0["loss"])]
    for _ in range(8):
        state, m = step(state, sharded)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 9


def test_eval_step_matches_loss(mesh8, model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(6)
    batch = make_batch(rng, bs=8)
    eval_step = make_clip_eval_step(model)
    out = eval_step(params, batch)
    direct = inbatch_contrastive_loss(
        model.apply({"params": params}, *[batch[k] for k in ("txt_batched", "image_batched", "txt_mask_batched", "image_mask_batched")]),
        8,
        jnp.exp(params["logit_scale"]),
    )
    np.testing.assert_allclose(float(out["loss"]), float(direct["loss"]), rtol=1e-6)


def test_embed_step_fp16(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(7)
    batch = make_batch(rng, bs=4)
    embed = make_embed_step(model)
    emb = embed(params, batch)
    assert emb.dtype == jnp.float16
    assert emb.shape == (8, CFG.embed_dim)


def test_vision_tower_pool_none():
    tower = CLIPVisionTower(CFG, pool="none")
    imgs = np.zeros((2, CFG.image_size, CFG.image_size, 3), np.float32)
    params = tower.init(jax.random.PRNGKey(0), imgs)["params"]
    out = tower.apply({"params": params}, imgs)
    n_patches = (CFG.image_size // CFG.patch_size) ** 2
    assert out.shape == (2, n_patches + 1, CFG.embed_dim)


def test_text_tower_pool_none():
    tower = CLIPTextTower(CFG, pool="none")
    txt = np.ones((2, CFG.context_length), np.int32)
    params = tower.init(jax.random.PRNGKey(0), txt)["params"]
    out = tower.apply({"params": params}, txt)
    assert out.shape == (2, CFG.context_length, CFG.text_width)
    assert "text_projection" not in params
