"""The checked-in config surface loads and interpolates correctly."""

import glob
import os

import pytest

from uniir_tpu.core.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_YAMLS = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*", "*", "*", "*.yaml")))


def test_config_tree_complete():
    models = {"clip_sf", "clip_ff", "blip_sf", "blip_ff"}
    found = {p.split(os.sep)[-5] for p in ALL_YAMLS}
    assert found == models
    # every model x size has the 4 archetypes
    for m in models:
        for size in ("base", "large"):
            base = os.path.join(REPO, "configs", m, size)
            assert os.path.exists(os.path.join(base, "train/inbatch/inbatch.yaml"))
            for y in ("embed.yaml", "index.yaml", "retrieval.yaml"):
                assert os.path.exists(os.path.join(base, "eval/inbatch", y))


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, REPO))
def test_yaml_loads_and_interpolates(path):
    cfg = load_config(path)
    assert cfg.experiment.path_suffix.count("/") >= 3
    assert cfg.model.name in ("CLIPScoreFusion", "CLIPFeatureFusion", "BLIPScoreFusion", "BLIPFeatureFusion")
    if path.endswith("inbatch.yaml"):
        assert cfg.trainer_config.num_train_epochs == 20
        assert float(cfg.trainer_config.learning_rate) == 1e-5
    if path.endswith("retrieval.yaml"):
        t = cfg.retrieval_config.test_datasets_config
        assert len(t.datasets_name) == len(t.correspond_cand_pools_name)
    if path.endswith("index.yaml"):
        assert cfg.index_config.faiss_config.dim in (512, 768)


def test_run_scripts_executable():
    scripts = glob.glob(os.path.join(REPO, "configs", "*", "*", "*", "*", "*.sh"))
    # census parity with the reference configs_scripts tree: 22 scripts
    # (incl. the clip_sf no-instruct ablations and the two unirag pipelines)
    assert len(scripts) == 22
    for s in scripts:
        assert os.access(s, os.X_OK), s
        text = open(s).read()
        # no-instruct variants delegate to their sibling script
        assert "uniir_tpu" in text or "exec \"$(dirname" in text, s


def test_config_census_matches_reference():
    """38 yamls / 22 scripts, the reference's configs_scripts census."""
    assert len(ALL_YAMLS) == 38
    # the unirag archetypes exist for the two models the reference ships
    for m in ("clip_sf", "blip_ff"):
        for y in ("embed.yaml", "index.yaml", "retrieval.yaml"):
            assert os.path.exists(os.path.join(REPO, "configs", m, "large/eval/unirag", y))
