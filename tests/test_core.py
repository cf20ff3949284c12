import numpy as np
import pytest

from uniir_tpu.core.config import Config, load_config, parse_image_size
from uniir_tpu.data.registry import (
    hash_qid,
    unhash_qid,
    hash_did,
    unhash_did,
    get_mbeir_task_id,
    get_mbeir_task_name,
    format_string,
    DATASET_IDS,
    MBEIR_TASK,
)


def test_config_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
experiment:
    instruct_status: "Instruct"
    exp_name: "InBatch"
    description: "${model.name} ${model.size} ${experiment.instruct_status} ${experiment.exp_name}"
    path_suffix: "${model.short_name}/${model.size}/${experiment.instruct_status}/${experiment.exp_name}/"
model:
    name: "CLIPScoreFusion"
    short_name: "CLIP_SF"
    size: "Large"
    ckpt_config:
        ckpt_dir: "checkpoint/${experiment.path_suffix}"
data_config:
    image_size: 224, 224
    returns: null
"""
    )
    cfg = load_config(str(p))
    assert cfg.experiment.description == "CLIPScoreFusion Large Instruct InBatch"
    assert cfg.model.ckpt_config.ckpt_dir == "checkpoint/CLIP_SF/Large/Instruct/InBatch/"
    # late key injection participates in interpolation (OmegaConf parity)
    cfg.uniir_dir = "/data/UniIR"
    assert cfg.uniir_dir == "/data/UniIR"
    # mutation flows through interpolation
    cfg.experiment.instruct_status = "NoInstruct"
    assert "NoInstruct" in cfg.experiment.path_suffix
    # missing key raises AttributeError so getattr(default) works
    assert getattr(cfg, "nonexistent", None) is None
    with pytest.raises(AttributeError):
        _ = cfg.nonexistent
    assert cfg.data_config.returns is None
    assert parse_image_size(cfg.data_config.image_size) == (224, 224)
    assert parse_image_size(224) == (224, 224)


def test_config_roundtrip():
    cfg = Config.from_dict({"a": {"b": [1, 2, {"c": "${a.d}"}], "e": 5}, "d": None})
    # interpolation inside a nested structure; "${a.d}" -> KeyError path is not
    # triggered because we only resolve on access
    cfg2 = Config.from_dict(cfg.to_dict(resolve=False))
    assert cfg2.a.e == 5


def test_id_hash_roundtrip():
    for name, ds_id in DATASET_IDS.items():
        for idx in [0, 1, 499_999]:
            qid = f"{ds_id}:{idx}"
            assert unhash_qid(hash_qid(qid)) == qid
        for idx in [0, 1, 9_999_999]:
            did = f"{ds_id}:{idx}"
            assert unhash_did(hash_did(did)) == did
    # hashes don't collide across datasets
    assert hash_qid("1:0") != hash_qid("0:499999")
    assert hash_did("9:123") == 9 * 10_000_000 + 123


def test_task_registry():
    assert get_mbeir_task_id("text", "image") == 0
    assert get_mbeir_task_id("image,text", "image,text") == 8
    assert get_mbeir_task_name(4) == "image -> image"
    assert get_mbeir_task_id("bogus", "image") is None
    assert len(MBEIR_TASK) == 9


def test_format_string():
    assert format_string("hello world") == "Hello world."
    assert format_string("  what? ") == "What?"
    assert format_string('"quoted"') == "Quoted."
    assert format_string("") == ""
    assert format_string(None) == ""
    assert format_string("Already done.") == "Already done."


def test_mesh_and_shard(mesh8):
    import jax
    from uniir_tpu.core.mesh import shard_batch, DATA_AXIS

    assert mesh8.shape[DATA_AXIS] == 8
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2), "y": np.arange(16, dtype=np.int32)}
    sharded = shard_batch(mesh8, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS, None)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])
