import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.core.mesh import shard_batch
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_ff import CLIPFeatureFusion
from uniir_tpu.models.t5_fusion import T5FusionConfig, T5FusionStack, relative_position_bucket
from uniir_tpu.train.optimizer import make_clip_optimizer
from uniir_tpu.train.state import TrainState
from uniir_tpu.train.steps import make_clip_train_step

CFG = CLIP_CONFIGS["test-tiny-ff"]


def make_batch(rng, bs=4):
    n = 2 * bs
    txt = rng.integers(1, CFG.vocab_size - 1, size=(n, CFG.context_length)).astype(np.int32)
    img = rng.normal(size=(n, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    mask = np.ones((n,), np.int32)
    return {
        "txt_batched": txt,
        "image_batched": img,
        "txt_mask_batched": mask,
        "image_mask_batched": mask,
    }


def test_t5_relative_buckets():
    rel = np.array([[-130, -5, 0, 5, 130]])
    b = np.asarray(relative_position_bucket(jnp.asarray(rel)))
    assert b[0, 2] == 0  # zero distance
    assert 0 < b[0, 1] < 16  # small negative -> exact bucket
    assert 16 <= b[0, 3] < 32  # positive side offset by num_buckets//2
    assert b[0, 0] < 16 and b[0, 0] >= 8  # large negative -> log bucket
    # symmetric distances map to different sides
    assert b[0, 1] != b[0, 3]


def test_t5_stack_no_bias_params():
    cfg = T5FusionConfig(d_model=32, num_heads=2, d_kv=8, d_ff=64, num_layers=2)
    stack = T5FusionStack(cfg)
    x = np.zeros((2, 10, 32), np.float32)
    params = stack.init(jax.random.PRNGKey(0), x)["params"]
    # q/k/v/o and FFN layers have no bias (T5 parity)
    assert set(params["block_0"]["attn"]["q"].keys()) == {"kernel"}
    assert set(params["block_0"]["wi"].keys()) == {"kernel"}
    # relative bias only on block 0
    assert "relative_attention_bias" in params["block_0"]["attn"]
    assert "relative_attention_bias" not in params["block_1"]["attn"]
    out = stack.apply({"params": params}, x)
    assert out.shape == x.shape


@pytest.fixture(scope="module")
def model_and_params():
    model = CLIPFeatureFusion(CFG)
    rng = np.random.default_rng(0)
    b = make_batch(rng, bs=1)
    params = model.init(jax.random.PRNGKey(0), b["txt_batched"], b["image_batched"], b["txt_mask_batched"], b["image_mask_batched"])["params"]
    return model, params


def test_clip_ff_forward_shapes(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    b = make_batch(rng, bs=3)
    emb = model.apply({"params": params}, b["txt_batched"], b["image_batched"], b["txt_mask_batched"], b["image_mask_batched"])
    assert emb.shape == (6, CFG.embed_dim)
    # no text_projection param (deleted in the reference)
    assert "text_projection" not in params["text"]


def test_clip_ff_fuses_modalities(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    b = make_batch(rng, bs=2)
    e1 = model.apply({"params": params}, b["txt_batched"], b["image_batched"], b["txt_mask_batched"], b["image_mask_batched"])
    e2 = model.apply({"params": params}, b["txt_batched"], b["image_batched"] + 0.5, b["txt_mask_batched"], b["image_mask_batched"])
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_clip_ff_train_step(mesh8, model_and_params):
    model, params = model_and_params
    params = jax.tree_util.tree_map(jnp.copy, params)
    # fusion params get their own LR group (reference clip_featurefusion/train.py:52-66)
    tx = make_clip_optimizer(params, 1e-3, total_steps=30, fusion_learning_rate=3e-3, fusion_path_sub="t5")
    state = TrainState.create(params=params, tx=tx)
    step = make_clip_train_step(model, mesh=mesh8)
    rng = np.random.default_rng(3)
    batch = make_batch(rng, bs=8)
    sharded = shard_batch(mesh8, batch)
    losses = []
    for _ in range(6):
        state, m = step(state, sharded)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_t5_stack_parity_with_hf():
    """T5FusionStack matches transformers' T5Stack numerically through the
    weight converter (the reference instantiates HF T5Stack, clip_ff.py:80-98)."""
    import torch
    from transformers.models.t5 import T5Config
    from transformers.models.t5.modeling_t5 import T5Stack

    from uniir_tpu.models import convert
    from uniir_tpu.models.t5_fusion import T5FusionConfig, T5FusionStack

    conf = T5Config()
    conf.num_layers = 2
    conf.num_decoder_layers = 2
    conf.num_heads = 4
    conf.d_model = 32
    conf.d_kv = 8
    conf.d_ff = 64
    conf.dropout_rate = 0.0
    conf.is_decoder = False
    conf.use_cache = False
    torch.manual_seed(0)
    hf = T5Stack(conf)
    hf.eval()

    x = torch.randn(2, 9, 32) * 0.5
    with torch.no_grad():
        ref = hf(inputs_embeds=x, use_cache=False, return_dict=True).last_hidden_state.numpy()

    sd = convert.to_numpy_state_dict({f"t5_layers.{k}": v for k, v in hf.state_dict().items()})
    params = convert.convert_t5_fusion_params(sd, 2)
    ours = T5FusionStack(
        T5FusionConfig(d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout_rate=0.0)
    )
    out = ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
