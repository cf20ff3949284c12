"""End-to-end mini pipeline: embed -> index -> retrieve -> Recall@k.

The CPU-runnable 'minimum end-to-end slice' (SURVEY.md section 7 build order,
step 1): tiny CLIP-SF over the synthetic M-BEIR fixture, through the exact
file-artifact contract of the reference pipeline.
"""

import json
import os

import jax
import numpy as np
import pytest

from tests.helpers import make_eval_config  # noqa: F401
from uniir_tpu.core.config import Config
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.models.registry import ModelBundle
from uniir_tpu.retrieval.embedder import generate_embeds_for_config
from uniir_tpu.retrieval.index import create_index
from uniir_tpu.retrieval.eval import run_retrieval
from uniir_tpu.data.registry import hash_qid, get_mbeir_task_id

CFG = CLIP_CONFIGS["test-tiny"]


def test_full_pipeline(pipeline_root, bundle):
    config = make_eval_config(pipeline_root)

    # 1. Embed
    written = generate_embeds_for_config(bundle, config)
    expt = config.experiment.path_suffix
    embed_dir = os.path.join(pipeline_root, "embed", expt)
    q_embed = np.load(os.path.join(embed_dir, "test", "mbeir_mscoco_task0_test_embed.npy"))
    assert q_embed.dtype == np.float16
    assert q_embed.shape == (12, CFG.embed_dim)
    pool_embed = np.load(os.path.join(embed_dir, "cand_pool", "mbeir_mscoco_task0_cand_pool_embed.npy"))
    assert pool_embed.shape == (24, CFG.embed_dim)
    union_embed = np.load(os.path.join(embed_dir, "cand_pool", "mbeir_union_cand_pool_embed.npy"))
    assert union_embed.shape == pool_embed.shape  # single-pool union

    # 2. Index
    index_paths = create_index(config)
    assert len(index_paths) == 2
    assert all(os.path.exists(p) for p in index_paths)

    # 3. Retrieve + eval
    results = run_retrieval(config)
    assert len(results) >= 1
    for r in results:
        assert set(r) >= {"TaskID", "Task", "Dataset", "Split", "CandPool", "Recall@1", "Recall@5"}
        # recall must be within [0,1] and monotone in k
        assert 0.0 <= r["Recall@1"] <= r["Recall@5"] <= r.get("Recall@10", 1.0) <= 1.0
    # the test split rows carry Recall@10 too
    assert any("Recall@10" in r for r in results if r["Split"] == "test")

    # run files + tsv written
    results_dir = os.path.join(pipeline_root, "retrieval_results", expt)
    run_files = os.listdir(os.path.join(results_dir, "run_files"))
    assert any("union_pool" in f for f in run_files)
    assert any("single_pool" in f for f in run_files)
    tsvs = os.listdir(os.path.join(results_dir, "final_tsv"))
    assert len(tsvs) == 1


def test_pipeline_with_mesh(pipeline_root, bundle, mesh8):
    """Sharded retrieval matches the single-device pipeline artifacts."""
    config = make_eval_config(pipeline_root)
    results = run_retrieval(config, mesh=mesh8)
    assert len(results) >= 1
    for r in results:
        assert 0.0 <= r["Recall@5"] <= 1.0


def test_embed_with_mesh(pipeline_root, bundle, mesh8):
    """Embedding with batches data-sharded over the 8-device mesh."""
    config = make_eval_config(pipeline_root)
    config.experiment.path_suffix = "CLIP_SF/TinyMesh/Instruct/InBatch/"
    written = generate_embeds_for_config(bundle, config, mesh=mesh8)
    # candidate-pool embeddings are deterministic (no instruction sampling):
    # the mesh-sharded run must match the unsharded artifacts bit-for-bit
    q = np.load(os.path.join(pipeline_root, "embed", config.experiment.path_suffix, "cand_pool", "mbeir_mscoco_task0_cand_pool_embed.npy"))
    ref = np.load(os.path.join(pipeline_root, "embed", "CLIP_SF/Tiny/Instruct/InBatch/", "cand_pool", "mbeir_mscoco_task0_cand_pool_embed.npy"))
    np.testing.assert_allclose(q.astype(np.float32), ref.astype(np.float32), atol=2e-3)


def test_embed_pipeline_with_int8_bundle(pipeline_root, bundle):
    """The embedder runs an int8 quant twin end to end through the file
    pipeline, and its fp16 artifacts track the float bundle's (round-4: int8
    serving is a first-class mode for the whole eval surface)."""
    from uniir_tpu.models.registry import ModelBundle
    from uniir_tpu.ops.quant import quantize_tree

    config = make_eval_config(pipeline_root)
    expt_float = "CLIP_SF/TinyInt8Ref/Instruct/InBatch/"
    config.experiment.path_suffix = expt_float
    generate_embeds_for_config(bundle, config)  # float reference artifacts
    config.experiment.path_suffix = "CLIP_SF/TinyInt8/Instruct/InBatch/"

    qbundle = ModelBundle(
        bundle.name,
        bundle.model.clone(quant=True),
        quantize_tree(bundle.params),
        bundle.tokenizer,
        bundle.img_preprocess_fn,
        bundle.img_preprocess_fn_eval,
        bundle.image_size,
        bundle.embed_dim,
    )
    generate_embeds_for_config(qbundle, config)

    embed_dir = os.path.join(pipeline_root, "embed")
    rel = os.path.join("cand_pool", "mbeir_mscoco_task0_cand_pool_embed.npy")
    e_q = np.load(os.path.join(embed_dir, config.experiment.path_suffix, rel)).astype(np.float32)
    e_f = np.load(os.path.join(embed_dir, expt_float, rel)).astype(np.float32)
    assert e_q.shape == e_f.shape
    cos = np.sum(e_q * e_f, -1) / (np.linalg.norm(e_q, axis=-1) * np.linalg.norm(e_f, axis=-1) + 1e-9)
    assert cos.min() > 0.98, cos.min()


def test_non_main_process_writes_nothing(pipeline_root, bundle, monkeypatch, tmp_path):
    """Pod-safe rank discipline (reference mbeir_embedder.py:79-116,
    train.py:140-151): on a multi-process run only process 0 writes the
    index files, run files, retrieved jsonl, and TSV.  Simulate rank 1 by
    monkeypatching is_main_process; create_index/run_retrieval import it
    from core.mesh at call time, so patching the module attribute suffices.
    The barrier must also be exercised (as a no-op here: process_count==1
    in tests, and sync_global_devices on one process returns immediately)."""
    import shutil

    import uniir_tpu.core.mesh as mesh_mod

    # fresh root, RAW inputs only: copying derived dirs (index/, results/)
    # from pipeline_root would carry rank-0 leftovers from other tests that
    # mask a missing-write assertion
    root = str(tmp_path / "rank1")
    os.makedirs(root)
    shutil.copytree(
        os.path.join(pipeline_root, "mbeir_data"), os.path.join(root, "mbeir_data")
    )
    config = make_eval_config(root)
    expt = config.experiment.path_suffix

    # rank 0 embeds (the embedder's own part-file discipline is covered by
    # test_multihost.py); then wipe downstream dirs and replay as rank 1
    generate_embeds_for_config(bundle, config)

    monkeypatch.setattr(mesh_mod, "is_main_process", lambda: False)
    index_paths = create_index(config)
    assert index_paths == []
    index_dir = os.path.join(root, "index")
    assert not os.path.exists(index_dir) or not any(
        f.endswith(".index") for _, _, fs in os.walk(index_dir) for f in fs
    )

    # rank 0 builds the index so rank 1's retrieval has inputs to read
    monkeypatch.setattr(mesh_mod, "is_main_process", lambda: True)
    assert len(create_index(config)) == 2

    monkeypatch.setattr(mesh_mod, "is_main_process", lambda: False)
    results = run_retrieval(config)
    assert results, "rank 1 must still compute results (metrics are global)"
    results_dir = os.path.join(root, "retrieval_results", expt)
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(results_dir) for f in fs
    ]
    assert written == [], f"rank 1 wrote files: {written}"
