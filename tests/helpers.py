"""Synthetic M-BEIR fixture builders for tests."""

from __future__ import annotations

import json
import os
import random

import numpy as np
from PIL import Image

from uniir_tpu.data.tokenizers.bert_wordpiece import PAD, UNK, CLS, SEP, MASK

WORDS = ["red", "blue", "dress", "shirt", "cat", "dog", "news", "photo", "find", "image", "match", "style"]


def tiny_bert_vocab() -> list:
    sub = ["##s", "##ing", "##ed", "a", "the", "of", "."]
    return [PAD, UNK, CLS, SEP, MASK] + WORDS + sub


def tiny_clip_merges() -> list:
    """A few deterministic merges over the test word list."""
    merges = []
    for w in WORDS:
        if len(w) >= 2:
            merges.append((w[0], w[1]))
    # dedupe preserving order
    seen = set()
    out = []
    for m in merges:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def make_image(path: str, size=(64, 48), color=None, seed=0) -> None:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8) if color is None else np.full((size[1], size[0], 3), color, dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def build_mbeir_fixture(root: str, n_queries: int = 12, n_cands: int = 24, dataset_id: int = 9, with_negs: int = 2, modalities=("text", "image")):
    """Create a miniature M-BEIR tree: queries jsonl, cand pool jsonl, instructions tsv, images."""
    rng = random.Random(0)
    os.makedirs(root, exist_ok=True)
    img_dir = os.path.join(root, "images")

    cands = []
    for i in range(n_cands):
        modality = modalities[i % len(modalities)]
        entry = {"did": f"{dataset_id}:{i}", "modality": modality}
        if modality in ("text", "image,text"):
            entry["txt"] = " ".join(rng.choices(WORDS, k=4))
        if modality in ("image", "image,text"):
            rel = f"images/cand_{i}.jpg"
            make_image(os.path.join(root, rel), seed=i)
            entry["img_path"] = rel
        cands.append(entry)

    queries = []
    for i in range(n_queries):
        pos = [f"{dataset_id}:{(i * 2) % n_cands}"]
        negs = [f"{dataset_id}:{(i * 2 + 1 + j) % n_cands}" for j in range(max(4, with_negs))]
        q = {
            "qid": f"{dataset_id}:{i}",
            "query_modality": "text",
            "query_txt": " ".join(rng.choices(WORDS, k=5)),
            "pos_cand_list": pos,
            "neg_cand_list": negs,
        }
        if i % 3 == 0:  # some image queries
            rel = f"images/query_{i}.jpg"
            make_image(os.path.join(root, rel), seed=100 + i)
            q["query_modality"] = "image"
            q["query_img_path"] = rel
            q["query_txt"] = ""
        queries.append(q)

    with open(os.path.join(root, "queries.jsonl"), "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
    with open(os.path.join(root, "cand_pool.jsonl"), "w") as f:
        for c in cands:
            f.write(json.dumps(c) + "\n")

    # instructions tsv: columns query_modality, cand_modality, dataset_name, dataset_id, prompts...
    keys = set()
    for q in queries:
        for c in cands:
            keys.add((q["query_modality"], c["modality"]))
    with open(os.path.join(root, "instructions.tsv"), "w") as f:
        f.write("query_modality\tcand_modality\tdataset\tdataset_id\tprompt1\tprompt2\n")
        for qm, cm in sorted(keys):
            f.write(f"{qm}\t{cm}\ttest\t{dataset_id}\tfind the {cm} for this {qm}\tretrieve {cm}\n")

    return {"queries": "queries.jsonl", "cand_pool": "cand_pool.jsonl", "instructions": "instructions.tsv"}


def identity_image_transform(size: int = 32):
    """Cheap image transform for tests: resize to (size, size), scale to [0,1]."""

    def fn(img):
        img = img.resize((size, size))
        return np.asarray(img, dtype=np.float32) / 255.0

    return fn


def simple_tokenizer(max_len: int = 16, vocab_size: int = 97):
    """Deterministic hash tokenizer returning CLIP-style int32 [N, L]."""

    def fn(texts):
        out = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [1] + [2 + (hash(w) % (vocab_size - 3)) for w in t.lower().split()][: max_len - 2]
            toks.append(vocab_size - 1)
            out[i, : len(toks)] = toks
        return out

    return fn


def simple_bert_tokenizer(max_len: int = 16, vocab_size: int = 97):
    """Deterministic hash tokenizer returning BERT-style dict batches."""

    def fn(texts):
        input_ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [1] + [4 + (hash(w) % (vocab_size - 5)) for w in t.lower().split()][: max_len - 2] + [2]
            input_ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}

    return fn


# ---------------------------------------------------------------------------
# Shared pipeline fixture helpers (used by e2e + tools tests)
# ---------------------------------------------------------------------------

def build_pipeline_tree(root: str, n_queries: int = 12, n_cands: int = 24):
    """M-BEIR tree in the reference directory layout + qrels, under `root`."""
    import json as _json
    from uniir_tpu.data.registry import get_mbeir_task_id

    mbeir = os.path.join(root, "mbeir_data")
    build_mbeir_fixture(mbeir, n_queries=n_queries, n_cands=n_cands)
    os.makedirs(os.path.join(mbeir, "query/test"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "query/train"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "cand_pool/local"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "qrels/test"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "instructions"), exist_ok=True)
    os.rename(os.path.join(mbeir, "queries.jsonl"), os.path.join(mbeir, "query/test/mbeir_mscoco_task0_test.jsonl"))
    os.rename(os.path.join(mbeir, "cand_pool.jsonl"), os.path.join(mbeir, "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl"))
    os.rename(os.path.join(mbeir, "instructions.tsv"), os.path.join(mbeir, "instructions/query_instructions.tsv"))

    with open(os.path.join(mbeir, "query/test/mbeir_mscoco_task0_test.jsonl")) as f:
        queries = [_json.loads(l) for l in f]
    with open(os.path.join(mbeir, "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl")) as f:
        pool = {_json.loads(l)["did"]: _json.loads(l) for l in f}
    with open(os.path.join(mbeir, "qrels/test/mbeir_mscoco_task0_test_qrels.txt"), "w") as f:
        for q in queries:
            for did in q["pos_cand_list"]:
                task_id = get_mbeir_task_id(q["query_modality"], pool[did]["modality"]) or 0
                f.write(f"{q['qid']} 0 {did} 1 {task_id}\n")
    # mirror the test split as a train split (hard-neg mining + analyst tests)
    import shutil

    os.makedirs(os.path.join(mbeir, "train"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "test"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "qrels/train"), exist_ok=True)
    os.makedirs(os.path.join(mbeir, "cand_pool/union_pool"), exist_ok=True)
    test_q = os.path.join(mbeir, "query/test/mbeir_mscoco_task0_test.jsonl")
    shutil.copy(test_q, os.path.join(mbeir, "query/train/mbeir_mscoco_task0_train.jsonl"))
    # the reference reads train queries from mbeir_data/train/ (hard negs) and
    # split-level query files from mbeir_data/<split>/ (analyst)
    shutil.copy(test_q, os.path.join(mbeir, "train/mbeir_mscoco_task0_train.jsonl"))
    shutil.copy(test_q, os.path.join(mbeir, "test/mbeir_mscoco_task0_test.jsonl"))
    shutil.copy(
        os.path.join(mbeir, "qrels/test/mbeir_mscoco_task0_test_qrels.txt"),
        os.path.join(mbeir, "qrels/train/mbeir_mscoco_task0_train_qrels.txt"),
    )
    shutil.copy(
        os.path.join(mbeir, "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl"),
        os.path.join(mbeir, "cand_pool/mbeir_mscoco_task0_cand_pool.jsonl"),
    )
    shutil.copy(
        os.path.join(mbeir, "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl"),
        os.path.join(mbeir, "cand_pool/union_pool/mbeir_union_test_cand_pool.jsonl"),
    )
    return mbeir


# The 16 (dataset, task) runs of the reference union-pool retrieval sweep
# (reference large/eval/inbatch/retrieval.yaml:147-181): run name, dataset
# registry name, task id.  MSCOCO's pools carry a _test suffix (separate
# val/test pools in the real data).
SWEEP_RUNS = [
    ("visualnews_task0", "VisualNews", 0),
    ("mscoco_task0", "MSCOCO", 0),
    ("fashion200k_task0", "Fashion200K", 0),
    ("webqa_task1", "WebQA", 1),
    ("edis_task2", "EDIS", 2),
    ("webqa_task2", "WebQA", 2),
    ("visualnews_task3", "VisualNews", 3),
    ("mscoco_task3", "MSCOCO", 3),
    ("fashion200k_task3", "Fashion200K", 3),
    ("nights_task4", "NIGHTS", 4),
    ("oven_task6", "OVEN", 6),
    ("infoseek_task6", "INFOSEEK", 6),
    ("fashioniq_task7", "FashionIQ", 7),
    ("cirr_task7", "CIRR", 7),
    ("oven_task8", "OVEN", 8),
    ("infoseek_task8", "INFOSEEK", 8),
]

TASK_MODALITIES = {
    0: ("text", "image"),
    1: ("text", "text"),
    2: ("text", "image,text"),
    3: ("image", "text"),
    4: ("image", "image"),
    6: ("image,text", "text"),
    7: ("image,text", "image"),
    8: ("image,text", "image,text"),
}


def sweep_pool_name(run_name: str) -> str:
    """Pool name for a sweep run (MSCOCO's is suffixed _test)."""
    return run_name + "_test" if run_name.startswith("mscoco") else run_name


def build_union_sweep_tree(root: str, n_queries: int = 4, n_cands: int = 8):
    """Miniature M-BEIR tree covering ALL 16 runs of the reference
    retrieval.yaml sweep (every task type, correct query/candidate
    modalities, per-run qrels) plus the union candidate pool -- the fixture
    for the full-parity dress rehearsal (scripts/parity_smoke.py --sweep)."""
    import json as _json

    from uniir_tpu.data.registry import DATASET_IDS

    mbeir = os.path.join(root, "mbeir_data")
    for sub in ("query/test", "cand_pool/local", "cand_pool/union_pool", "qrels/test", "instructions", "images"):
        os.makedirs(os.path.join(mbeir, sub), exist_ok=True)

    rng = random.Random(0)
    union_entries = []
    instr_keys = set()
    for run_idx, (run_name, ds_name, task) in enumerate(SWEEP_RUNS):
        ds_id = DATASET_IDS[ds_name]
        qmod, cmod = TASK_MODALITIES[task]
        off = 1000 * run_idx  # within-dataset id ranges stay disjoint per run
        instr_keys.add((qmod, cmod, ds_name, ds_id))

        cands = []
        for i in range(n_cands):
            entry = {"did": f"{ds_id}:{off + i}", "modality": cmod}
            if "text" in cmod:
                entry["txt"] = " ".join(rng.choices(WORDS, k=4))
            if "image" in cmod:
                rel = f"images/{run_name}_cand_{i}.jpg"
                make_image(os.path.join(mbeir, rel), seed=run_idx * 100 + i)
                entry["img_path"] = rel
            cands.append(entry)
        union_entries.extend(cands)

        queries = []
        for i in range(n_queries):
            q = {
                "qid": f"{ds_id}:{off + i}",
                "query_modality": qmod,
                "query_txt": " ".join(rng.choices(WORDS, k=5)) if "text" in qmod else "",
                "pos_cand_list": [f"{ds_id}:{off + (i * 2) % n_cands}"],
                "neg_cand_list": [f"{ds_id}:{off + (i * 2 + 1 + j) % n_cands}" for j in range(2)],
            }
            if "image" in qmod:
                rel = f"images/{run_name}_query_{i}.jpg"
                make_image(os.path.join(mbeir, rel), seed=5000 + run_idx * 100 + i)
                q["query_img_path"] = rel
            queries.append(q)

        pool = sweep_pool_name(run_name)
        with open(os.path.join(mbeir, f"cand_pool/local/mbeir_{pool}_cand_pool.jsonl"), "w") as f:
            for c in cands:
                f.write(_json.dumps(c) + "\n")
        with open(os.path.join(mbeir, f"query/test/mbeir_{run_name}_test.jsonl"), "w") as f:
            for q in queries:
                f.write(_json.dumps(q) + "\n")
        with open(os.path.join(mbeir, f"qrels/test/mbeir_{run_name}_test_qrels.txt"), "w") as f:
            for q in queries:
                for did in q["pos_cand_list"]:
                    f.write(f"{q['qid']} 0 {did} 1 {task}\n")

    with open(os.path.join(mbeir, "cand_pool/union_pool/mbeir_union_test_cand_pool.jsonl"), "w") as f:
        for c in union_entries:
            f.write(_json.dumps(c) + "\n")
    with open(os.path.join(mbeir, "instructions/query_instructions.tsv"), "w") as f:
        f.write("query_modality\tcand_modality\tdataset\tdataset_id\tprompt1\tprompt2\n")
        for qmod, cmod, ds_name, ds_id in sorted(instr_keys):
            f.write(f"{qmod}\t{cmod}\t{ds_name}\t{ds_id}\tfind the {cmod} for this {qmod}\tretrieve {cmod}\n")
    return mbeir


def make_eval_config(root: str, embed_dim: int = 16, image_size: int = 32):
    from uniir_tpu.core.config import Config

    return Config.from_dict(
        {
            "uniir_dir": root,
            "mbeir_data_dir": os.path.join(root, "mbeir_data"),
            "seed": 2023,
            "experiment": {"path_suffix": "CLIP_SF/Tiny/Instruct/InBatch/"},
            "data_config": {
                "image_size": f"{image_size}, {image_size}",
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
                "train_datasets_config": {
                    "enable_embed": True,
                    "datasets_name": ["mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0"],
                },
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
                "faiss_config": {"dim": embed_dim, "idx_type": "Flat", "metric": "METRIC_INNER_PRODUCT"},
            },
            "retrieval_config": {
                "qrel_dir_name": "qrels",
                "embed_dir_name": "embed",
                "index_dir_name": "index",
                "query_dir_name": "query",
                "candidate_dir_name": "cand_pool/local",
                "results_dir_name": "retrieval_results",
                "hard_negs_dir_name": "hard_negs",
                "num_hard_negs": 3,
                "k": 8,
                "raw_retrieval": False,
                "retrieve_image_text_pairs": False,
                "write_to_tsv": True,
                "train_datasets_config": {
                    "enable_retrieve": True,
                    "datasets_name": ["mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0"],
                    "correspond_qrels_name": ["mscoco_task0"],
                    "correspond_metrics_name": ["Recall@1, Recall@5"],
                },
                "val_datasets_config": {"enable_retrieve": False},
                "test_datasets_config": {
                    "enable_retrieve": True,
                    "datasets_name": ["mscoco_task0", "mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0", "union"],
                    "correspond_qrels_name": ["mscoco_task0", "mscoco_task0"],
                    "correspond_metrics_name": ["Recall@1, Recall@5, Recall@10"] * 2,
                },
            },
            "analysis_config": {
                "qrel_dir_name": "qrels",
                "results_dir_name": "retrieval_results",
                "write_to_tsv": True,
                "train_datasets_config": {"enable_retrieve": False},
                "val_datasets_config": {"enable_retrieve": False},
                "test_datasets_config": {
                    "enable_retrieve": True,
                    "datasets_name": ["mscoco_task0"],
                    "correspond_cand_pools_name": ["mscoco_task0"],
                    "correspond_qrels_name": ["mscoco_task0"],
                    "correspond_metrics_name": ["Recall@1, Recall@5, Recall@10"],
                },
            },
        }
    )


def tiny_clip_bundle(embed_dim: int = 16, image_size: int = 32):
    import jax
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.models.registry import ModelBundle

    cfg = CLIP_CONFIGS["test-tiny"]
    model = CLIPScoreFusion(cfg)
    tok = simple_tokenizer(max_len=cfg.context_length, vocab_size=cfg.vocab_size)
    img_fn = identity_image_transform(cfg.image_size)
    params = model.init(
        jax.random.PRNGKey(0),
        tok(["x", "y"]),
        np.zeros((2, cfg.image_size, cfg.image_size, 3), np.float32),
        np.ones(2, np.int32),
        np.ones(2, np.int32),
    )["params"]
    return ModelBundle(
        "CLIPScoreFusion", model, params, tok, img_fn, img_fn,
        (cfg.image_size, cfg.image_size), cfg.embed_dim,
    )
