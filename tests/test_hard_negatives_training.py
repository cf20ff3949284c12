"""End-to-end training with hard negatives through trainer.main (both families)."""

import os

import numpy as np
import pytest

from tests.test_trainer import blip_bundle, clip_bundle, make_train_config, train_root  # noqa: F401
from uniir_tpu.train import trainer


def test_clip_hard_neg_training(train_root, mesh8):
    config = make_train_config(train_root, epochs=1)
    config.data_config.hard_neg_num = 2
    config.data_config.in_batch_neg_num = 3
    out = trainer.main(config, mesh=mesh8, bundle=clip_bundle())
    assert np.isfinite(float(out["stats"]["train_loss"]))


def test_blip_hard_neg_training(train_root, mesh8):
    config = make_train_config(train_root, model_name="BLIPScoreFusion", epochs=1)
    config.data_config.hard_neg_num = 2
    # queue_size must be divisible by global batch (8); hard-neg path slices
    # the first bs*neg queue slots (reference blip_sf.py:224)
    out = trainer.main(config, mesh=mesh8, bundle=blip_bundle())
    assert np.isfinite(float(out["stats"]["train_loss"]))
    # queue holds real dids after enqueue (pos or first-neg by coin flip)
    state = out["state"]
    assert np.asarray(state.queue_idx >= 0).sum() >= 8


def test_profiling_utils():
    from uniir_tpu.utils.profiling import StepTimer, annotate, device_memory_stats

    t = StepTimer()
    with t:
        with annotate("test-region"):
            sum(range(1000))
    assert t.elapsed > 0
    device_memory_stats()  # must not raise
