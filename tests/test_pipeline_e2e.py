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

from tests.helpers import build_mbeir_fixture, identity_image_transform, simple_tokenizer
from uniir_tpu.core.config import Config
from uniir_tpu.models.clip import CLIP_CONFIGS
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.models.registry import ModelBundle
from uniir_tpu.retrieval.embedder import generate_embeds_for_config
from uniir_tpu.retrieval.index import create_index
from uniir_tpu.retrieval.eval import run_retrieval
from uniir_tpu.data.registry import hash_qid, get_mbeir_task_id

CFG = CLIP_CONFIGS["test-tiny"]
DS_ID = 9  # MSCOCO


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    """Lay out an mbeir_data tree in the reference's directory structure."""
    root = tmp_path_factory.mktemp("uniir")
    mbeir = root / "mbeir_data"
    build_mbeir_fixture(str(mbeir), n_queries=12, n_cands=24)

    # Move fixture files into the reference layout
    os.makedirs(mbeir / "query" / "test", exist_ok=True)
    os.makedirs(mbeir / "cand_pool" / "local", exist_ok=True)
    os.makedirs(mbeir / "qrels" / "test", exist_ok=True)
    os.makedirs(mbeir / "instructions", exist_ok=True)
    os.rename(mbeir / "queries.jsonl", mbeir / "query" / "test" / "mbeir_mscoco_task0_test.jsonl")
    os.rename(mbeir / "cand_pool.jsonl", mbeir / "cand_pool" / "local" / "mbeir_mscoco_task0_cand_pool.jsonl")
    os.rename(mbeir / "instructions.tsv", mbeir / "instructions" / "query_instructions.tsv")

    # qrels: qid 0 did 1 task_id
    with open(mbeir / "query" / "test" / "mbeir_mscoco_task0_test.jsonl") as f:
        queries = [json.loads(l) for l in f]
    with open(mbeir / "cand_pool" / "local" / "mbeir_mscoco_task0_cand_pool.jsonl") as f:
        pool = {json.loads(l)["did"]: json.loads(l) for l in f}
    with open(mbeir / "qrels" / "test" / "mbeir_mscoco_task0_test_qrels.txt", "w") as f:
        for q in queries:
            for did in q["pos_cand_list"]:
                task_id = get_mbeir_task_id(q["query_modality"], pool[did]["modality"]) or 0
                f.write(f"{q['qid']} 0 {did} 1 {task_id}\n")
    return str(root)


@pytest.fixture(scope="module")
def bundle():
    model = CLIPScoreFusion(CFG)
    tok = simple_tokenizer(max_len=CFG.context_length, vocab_size=CFG.vocab_size)
    img_fn = identity_image_transform(CFG.image_size)
    txt = tok(["x", "y"])
    img = np.zeros((2, CFG.image_size, CFG.image_size, 3), np.float32)
    mask = np.ones((2,), np.int32)
    params = model.init(jax.random.PRNGKey(0), txt, img, mask, mask)["params"]
    return ModelBundle(
        name="CLIPScoreFusion",
        model=model,
        params=params,
        tokenizer=tok,
        img_preprocess_fn=img_fn,
        img_preprocess_fn_eval=img_fn,
        image_size=(CFG.image_size, CFG.image_size),
        embed_dim=CFG.embed_dim,
    )


def make_config(root):
    return Config.from_dict(
        {
            "uniir_dir": root,
            "mbeir_data_dir": os.path.join(root, "mbeir_data"),
            "experiment": {"path_suffix": "CLIP_SF/Tiny/Instruct/InBatch/"},
            "data_config": {
                "image_size": f"{CFG.image_size}, {CFG.image_size}",
                "enable_query_instruct": True,
                "shuffle_cand": False,
                "train_dir_name": "query/train",
                "val_dir_name": "query/val",
                "test_dir_name": "query/test",
                "cand_pool_dir_name": "cand_pool/local",
                "query_instruct_path": "instructions/query_instructions.tsv",
            },
            "dataloader_config": {"num_workers": 2, "batch_size": 8},
            "embed_config": {
                "embed_dir_name": "embed",
                "use_fp16": True,
                "train_datasets_config": {"enable_embed": False},
                "val_datasets_config": {"enable_embed": False},
                "test_datasets_config": {
                    "enable_embed": True,
                    "datasets_name": ["mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0"],
                },
                "cand_pools_config": {
                    "enable_embed": True,
                    "embed_union_pool": True,
                    "cand_pools_name_to_embed": ["mscoco_task0"],
                },
            },
            "index_config": {
                "embed_dir_name": "embed",
                "index_dir_name": "index",
                "cand_pools_config": {"enable_idx": True, "cand_pools_name_to_idx": ["mscoco_task0", "union"]},
                "faiss_config": {"dim": CFG.embed_dim, "idx_type": "Flat", "metric": "METRIC_INNER_PRODUCT"},
            },
            "retrieval_config": {
                "qrel_dir_name": "qrels",
                "embed_dir_name": "embed",
                "index_dir_name": "index",
                "query_dir_name": "query",
                "candidate_dir_name": "cand_pool/local",
                "results_dir_name": "retrieval_results",
                "raw_retrieval": False,
                "write_to_tsv": True,
                "train_datasets_config": {"enable_retrieve": False},
                "val_datasets_config": {"enable_retrieve": False},
                "test_datasets_config": {
                    "enable_retrieve": True,
                    "datasets_name": ["mscoco_task0", "mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0", "union"],
                    "correspond_qrels_name": ["mscoco_task0", "mscoco_task0"],
                    "correspond_metrics_name": ["Recall@1, Recall@5, Recall@10"] * 2,
                },
            },
        }
    )


def test_full_pipeline(pipeline_root, bundle):
    config = make_config(pipeline_root)

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
        assert set(r) >= {"TaskID", "Task", "Dataset", "Split", "CandPool", "Recall@1", "Recall@5", "Recall@10"}
        # recall must be within [0,1] and monotone in k
        assert 0.0 <= r["Recall@1"] <= r["Recall@5"] <= r["Recall@10"] <= 1.0

    # run files + tsv written
    results_dir = os.path.join(pipeline_root, "retrieval_results", expt)
    run_files = os.listdir(os.path.join(results_dir, "run_files"))
    assert any("union_pool" in f for f in run_files)
    assert any("single_pool" in f for f in run_files)
    tsvs = os.listdir(os.path.join(results_dir, "final_tsv"))
    assert len(tsvs) == 1


def test_pipeline_with_mesh(pipeline_root, bundle, mesh8):
    """Sharded retrieval matches the single-device pipeline artifacts."""
    config = make_config(pipeline_root)
    results = run_retrieval(config, mesh=mesh8)
    assert len(results) >= 1
    for r in results:
        assert 0.0 <= r["Recall@10"] <= 1.0
