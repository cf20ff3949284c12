import os

import jax
import numpy as np
import pytest

from tests.helpers import build_mbeir_fixture, identity_image_transform, simple_tokenizer, simple_bert_tokenizer
from uniir_tpu.core.config import Config
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.models.blip_sf import BLIPScoreFusion
from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS
from uniir_tpu.models.med import MED_CONFIGS
from uniir_tpu.models.registry import ModelBundle
from uniir_tpu.train import trainer

CFG = CLIP_CONFIGS["test-tiny"]


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_root")
    mbeir = root / "mbeir_data"
    build_mbeir_fixture(str(mbeir), n_queries=16, n_cands=24)
    return str(root)


def make_train_config(root, model_name="CLIPScoreFusion", epochs=2, enable_eval=False):
    return Config.from_dict(
        {
            "uniir_dir": root,
            "mbeir_data_dir": os.path.join(root, "mbeir_data"),
            "seed": 2023,
            "experiment": {"path_suffix": "X/Tiny/Instruct/InBatch/"},
            "data_config": {
                "image_size": "32, 32",
                "hard_neg_num": 0,
                "in_batch_neg_num": 0,
                "shuffle_cand": True,
                "returns": None,
                "enable_query_instruct": True,
                "query_instruct_path": "instructions.tsv",
                "train_query_data_path": "queries.jsonl",
                "train_cand_pool_path": "cand_pool.jsonl",
                "val_query_data_path": "queries.jsonl",
                "val_cand_pool_path": "cand_pool.jsonl",
            },
            "dataloader_config": {"num_workers": 2, "train_batch_size": 8, "valid_batch_size": 8},
            "trainer_config": {
                "gradient_accumulation_steps": 1,
                "num_train_epochs": epochs,
                "learning_rate": 3e-3,
                "warmup_steps": 0,
                "print_freq": 50,
            },
            "evaluator": {"enable_eval": enable_eval, "eval_freq": 1, "print_freq": 10},
            "model": {
                "name": model_name,
                "short_name": "TEST_SF",
                "size": "Tiny",
                "alpha": 0.4,
                "ckpt_config": {"ckpt_dir": "checkpoint/test/", "resume_training": False, "ckpt_name": ""},
            },
        }
    )


def clip_bundle():
    model = CLIPScoreFusion(CFG)
    tok = simple_tokenizer(max_len=CFG.context_length, vocab_size=CFG.vocab_size)
    img_fn = identity_image_transform(CFG.image_size)
    params = model.init(
        jax.random.PRNGKey(0),
        tok(["x", "y"]),
        np.zeros((2, 32, 32, 3), np.float32),
        np.ones(2, np.int32),
        np.ones(2, np.int32),
    )["params"]
    return ModelBundle("CLIPScoreFusion", model, params, tok, img_fn, img_fn, (32, 32), CFG.embed_dim)


def blip_bundle():
    vit, med = BLIP_VIT_CONFIGS["test-tiny"], MED_CONFIGS["test-tiny"]
    model = BLIPScoreFusion(vit_cfg=vit, med_cfg=med, embed_dim=16)
    tok = simple_bert_tokenizer(max_len=12, vocab_size=med.vocab_size)
    img_fn = identity_image_transform(vit.image_size)
    params = model.init(
        jax.random.PRNGKey(0),
        tok(["x", "y"]),
        np.zeros((2, 32, 32, 3), np.float32),
        np.ones(2, np.int32),
        np.ones(2, np.int32),
    )["params"]
    return ModelBundle(
        "BLIPScoreFusion", model, params, tok, img_fn, img_fn, (32, 32), 16,
        extra={"queue_size": 16, "momentum": 0.995},
    )


def test_trainer_main_clip(train_root, mesh8):
    config = make_train_config(train_root, epochs=2, enable_eval=True)
    out = trainer.main(config, mesh=mesh8, bundle=clip_bundle())
    assert "train_loss" in out["stats"] and "val_loss" in out["stats"]
    ckpt_dir = os.path.join(train_root, "checkpoint/test")
    assert os.path.isdir(os.path.join(ckpt_dir, "test_sf_epoch_0"))
    assert os.path.isdir(os.path.join(ckpt_dir, "test_sf_epoch_1"))
    # 16 queries / bs 8 = 2 steps/epoch * 2 epochs
    assert int(out["state"].step) == 4


def test_trainer_resume(train_root, mesh8):
    config = make_train_config(train_root, epochs=3)
    config.model.ckpt_config.resume_training = True
    config.model.ckpt_config.ckpt_name = "test_sf_epoch_1"
    out = trainer.main(config, mesh=mesh8, bundle=clip_bundle())
    # resumed from epoch 2: one more epoch (2 steps) on top of the restored 4
    assert int(out["state"].step) == 6
    assert out["stats"]["epoch"] == 2


def test_trainer_main_blip(train_root, mesh8):
    config = make_train_config(train_root, model_name="BLIPScoreFusion", epochs=1)
    config.model.short_name = "TEST_BLIP"
    out = trainer.main(config, mesh=mesh8, bundle=blip_bundle())
    assert "train_loss" in out["stats"]
    state = out["state"]
    # queue advanced: 2 steps x global bs 8 = 16 = queue_size -> wrapped to 0
    assert int(state.queue_ptr) == 0
    assert np.asarray(state.queue_idx >= 0).sum() == 16  # all slots filled with real dids


def test_load_train_params_from_epoch_ckpt(train_root, mesh8):
    """Eval-style loading: extract params from an epoch train-state checkpoint."""
    from uniir_tpu.core.checkpoint import load_train_params

    bundle = clip_bundle()
    ckpt = os.path.join(train_root, "checkpoint/test/test_sf_epoch_1")
    assert os.path.isdir(ckpt)
    params = load_train_params(ckpt, like=bundle.params)
    # loaded params differ from fresh init (they were trained)
    fresh = jax.tree_util.tree_leaves(bundle.params)[0]
    loaded = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(fresh), np.asarray(loaded))


def test_gradient_accumulation(train_root, mesh8):
    """accumulation_steps > 1: optimizer applies every k-th step (optax.MultiSteps)."""
    config = make_train_config(train_root, epochs=1)
    config.trainer_config.gradient_accumulation_steps = 2
    bundle = clip_bundle()
    before = np.asarray(jax.tree_util.tree_leaves(bundle.params)[0]).copy()
    out = trainer.main(config, mesh=mesh8, bundle=bundle)
    # 2 loader steps with accum 2 -> exactly one real optimizer update
    after = np.asarray(jax.tree_util.tree_leaves(out["state"].params)[0])
    assert not np.allclose(before, after)
    assert np.isfinite(float(out["stats"]["train_loss"]))


def test_trainer_main_blip_ff(train_root, mesh8):
    """BLIP-FeatureFusion end-to-end: cross-attention fusion + momentum/queues."""
    from uniir_tpu.models.blip_ff import BLIPFeatureFusion

    vit, med = BLIP_VIT_CONFIGS["test-tiny"], MED_CONFIGS["test-tiny"]
    model = BLIPFeatureFusion(vit_cfg=vit, med_cfg=med, embed_dim=med.hidden_size)
    tok = simple_bert_tokenizer(max_len=12, vocab_size=med.vocab_size)
    img_fn = identity_image_transform(vit.image_size)
    params = model.init(
        jax.random.PRNGKey(0),
        tok(["x", "y"]),
        np.zeros((2, 32, 32, 3), np.float32),
        np.ones(2, np.int32),
        np.ones(2, np.int32),
    )["params"]
    bundle = ModelBundle(
        "BLIPFeatureFusion", model, params, tok, img_fn, img_fn, (32, 32), med.hidden_size,
        extra={"queue_size": 16, "momentum": 0.995},
    )
    config = make_train_config(train_root, model_name="BLIPFeatureFusion", epochs=1)
    config.model.short_name = "TEST_BLIP_FF"
    out = trainer.main(config, mesh=mesh8, bundle=bundle)
    assert np.isfinite(float(out["stats"]["train_loss"]))
    assert int(out["state"].queue_ptr) == 0  # 2 steps x 8 = 16 = queue -> wrapped
