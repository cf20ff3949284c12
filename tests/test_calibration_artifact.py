"""Offline static-int8 calibration artifact: save/load + CLI probe flow +
registry serving wiring (tools/calibrate_int8.py, ops/calibrate.py,
models/registry.py int8 mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_eval_config, tiny_clip_bundle
from uniir_tpu.ops.calibrate import calibrate_act_scales, load_act_scales, save_act_scales


def test_save_load_roundtrip(tmp_path):
    scales = {
        ("visual", "transformer", "resblocks_0", "mlp"): np.array([0.1, 0.2], np.float32),
        ("text", "resblocks_1", "mlp"): np.array([0.3, 0.4], np.float32),
    }
    path = str(tmp_path / "calib.npz")
    save_act_scales(path, scales)
    loaded = load_act_scales(path)
    assert set(loaded) == set(scales)
    for k in scales:
        np.testing.assert_array_equal(loaded[k], scales[k])


def test_save_rejects_empty(tmp_path):
    with pytest.raises(AssertionError, match="empty"):
        save_act_scales(str(tmp_path / "x.npz"), {})


def _probe_batches(bundle, config, n=2):
    """The CLI's probe path: fixture loader -> model-arg tuples."""
    import itertools

    from uniir_tpu.tools.calibrate_int8 import first_probe_loader
    from uniir_tpu.train.steps import _model_inputs

    loader = first_probe_loader(bundle, config, batch_size=4)
    batches = []
    for batch in itertools.islice(iter(loader), n):
        for key in ("n_valid", "did_list", "qid_list", "task_id_list", "index_mapping"):
            batch.pop(key, None)
        batches.append(_model_inputs(batch))
    return batches


def test_cli_probe_flow_on_fixture_tree(pipeline_root, bundle, tmp_path, monkeypatch):
    """calibrate over real fixture batches -> npz -> quantize_tree -> static
    serving tracks the bf16 model."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.ops.quant import quantize_tree

    config = make_eval_config(pipeline_root)
    batches = _probe_batches(bundle, config)
    assert batches, "fixture probe loader yielded no batches"

    scales = calibrate_act_scales(bundle.model, bundle.params, batches, act="quick_gelu")
    path = str(tmp_path / "calib_tiny.npz")
    save_act_scales(path, scales)
    qparams = quantize_tree(bundle.params, act_scales=load_act_scales(path))

    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    qmodel = CLIPScoreFusion(CLIP_CONFIGS["test-tiny"], dtype=jnp.bfloat16, quant=True)
    txt, img, tmask, imask = batches[0]
    y_f = np.asarray(bundle.model.apply({"params": bundle.params}, txt, img, tmask, imask), np.float32)
    y_q = np.asarray(qmodel.apply({"params": qparams}, txt, img, tmask, imask), np.float32)
    assert np.all(np.isfinite(y_q))
    cos = np.sum(y_q * y_f, -1) / (np.linalg.norm(y_q, axis=-1) * np.linalg.norm(y_f, axis=-1))
    assert cos.min() > 0.98, cos.min()


def _registry_config(calib_path=None):
    from uniir_tpu.core.config import Config

    model = {"name": "CLIPScoreFusion", "clip_vision_model_name": "test-tiny", "int8": True}
    if calib_path:
        model["int8_calibration"] = calib_path
    return Config.from_dict({"uniir_dir": "/nonexistent", "model": model})


def test_registry_static_requires_calibration(monkeypatch):
    from uniir_tpu.models import registry as reg

    monkeypatch.setattr(reg, "build_clip_sf", lambda config, rng=None: tiny_clip_bundle())
    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    with pytest.raises(ValueError, match="calibrate_int8"):
        reg.build_model_from_config(_registry_config())


def test_registry_loads_calibration_artifact(pipeline_root, bundle, tmp_path, monkeypatch):
    """model.int8_calibration path -> act_scales leaves in the served params."""
    from uniir_tpu.models import registry as reg

    config = make_eval_config(pipeline_root)
    scales = calibrate_act_scales(bundle.model, bundle.params, _probe_batches(bundle, config, n=1))
    path = str(tmp_path / "calib_reg.npz")
    save_act_scales(path, scales)

    monkeypatch.setattr(reg, "build_clip_sf", lambda config, rng=None: tiny_clip_bundle())
    qbundle = reg.build_model_from_config(_registry_config(path))
    flat = jax.tree_util.tree_flatten_with_path(qbundle.params)[0]
    n_scales = sum(1 for kp, _ in flat if getattr(kp[-1], "key", None) == "act_scales")
    assert n_scales == len(scales) and n_scales > 0
