import json
import os
import random

import pytest

from uniir_tpu.data.preprocessing import generator as gen
from uniir_tpu.data.preprocessing.io_utils import (
    aggregate_candidates_for_mbeir_format_dataset,
    check_duplicates_in_mbeir_format_cand_pool,
    generate_mbeir_format_doc_key,
    get_modality_stats,
    load_jsonl_as_list,
    load_mbeir_format_pool_file_as_dict,
    save_list_as_jsonl,
)

# Two tiny datasets: VisualNews (id 0) and MSCOCO (id 9)
INFO = {
    "VisualNews": {"target": 20, "up_sampling": True, "include": True},
    "MSCOCO": {"target": 20, "up_sampling": False, "include": True},
}


def write_dataset(root, name, ds_id, n_queries, n_cands, task_middle):
    cands = [
        {"did": f"{ds_id}:{i}", "txt": f"cand {name} {i}", "modality": "text" if i % 2 else "image", "img_path": None if i % 2 else f"images/{name}_{i}.jpg"}
        for i in range(n_cands)
    ]
    queries = [
        {
            "qid": f"{ds_id}:{i}",
            "query_txt": f"query {name} {i}",
            "query_img_path": None,
            "query_modality": "text",
            "query_src_content": None,
            "pos_cand_list": [f"{ds_id}:{i % n_cands}"],
            "neg_cand_list": [f"{ds_id}:{(i + 1) % n_cands}"],
        }
        for i in range(n_queries)
    ]
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "val"), exist_ok=True)
    save_list_as_jsonl(queries, os.path.join(root, "train", f"mbeir_{name.lower()}_train.jsonl"))
    save_list_as_jsonl(queries, os.path.join(root, "val", f"mbeir_{name.lower()}_{task_middle}_val.jsonl"))
    save_list_as_jsonl(cands, os.path.join(root, "cand_pool", "train_cand_pool", f"mbeir_{name.lower()}_train_cand_pool.jsonl"))
    save_list_as_jsonl(cands, os.path.join(root, "cand_pool", f"mbeir_{name.lower()}_{task_middle}_cand_pool.jsonl"))
    return queries, cands


@pytest.fixture()
def gen_root(tmp_path):
    root = str(tmp_path / "mbeir_data")
    write_dataset(root, "VisualNews", 0, 7, 6, "task0")
    write_dataset(root, "MSCOCO", 9, 9, 6, "task0")
    # MSCOCO val pool is split-specific in the union val map
    save_list_as_jsonl(
        load_jsonl_as_list(os.path.join(root, "cand_pool", "mbeir_mscoco_task0_cand_pool.jsonl")),
        os.path.join(root, "cand_pool", "mbeir_mscoco_task0_val_cand_pool.jsonl"),
    )
    return root


VN_ONLY = {
    "VisualNews": {**INFO["VisualNews"]},
    "MSCOCO": {**INFO["MSCOCO"]},
}
VAL_NAMES = {"VisualNews": ["visualnews_task0"], "MSCOCO": ["mscoco_task0"]}
VAL_POOLS = {"VisualNews": ["visualnews_task0"], "MSCOCO": ["mscoco_task0_val"]}


def test_union_train_cand_pool_sorted(gen_root):
    out = gen.generate_union_train_cand_pool(gen_root, INFO)
    pool = load_jsonl_as_list(out)
    assert len(pool) == 12
    dids = [(int(p["did"].split(":")[0]), int(p["did"].split(":")[1])) for p in pool]
    assert dids == sorted(dids)


def test_unify_and_upsample(gen_root):
    gen.generate_union_train_cand_pool(gen_root, INFO)
    rng = random.Random(0)
    out = gen.unify_train_data(gen_root, upsample=True, datasets_info=INFO, rng=rng)
    data = load_jsonl_as_list(out)
    # VisualNews upsampled 7 -> 20; MSCOCO not upsampled (9)
    vn = [e for e in data if e["qid"].startswith("0:")]
    coco = [e for e in data if e["qid"].startswith("9:")]
    assert len(vn) == 20
    assert len(coco) == 9


def test_assign_task_ids_and_qrels(gen_root):
    gen.generate_union_train_cand_pool(gen_root, INFO)
    rng = random.Random(0)
    gen.unify_train_data(gen_root, upsample=True, datasets_info=INFO, rng=rng)
    gen.assign_task_ids(gen_root)
    data = load_jsonl_as_list(os.path.join(gen_root, "train", "mbeir_visualnews_train.jsonl"))
    assert all("task_id" in e for e in data)
    # text query -> image/text cand: task 0 or 1
    assert set(e["task_id"] for e in data) <= {0, 1}

    gen.generate_qrels(gen_root)
    qrels = open(os.path.join(gen_root, "qrels", "mbeir_visualnews_train_qrels.txt")).read().strip().split("\n")
    assert len(qrels) == 7
    parts = qrels[0].split()
    assert len(parts) == 5 and parts[1] == "0" and parts[3] == "1"


def test_union_val_data_trims_pool(gen_root, monkeypatch):
    monkeypatch.setattr(gen, "VAL_DATA_NAMES", VAL_NAMES)
    monkeypatch.setattr(gen, "VAL_POOL_NAMES", VAL_POOLS)
    out = gen.generate_union_val_data(gen_root, INFO)
    data = load_jsonl_as_list(out)
    assert len(data) == 16
    pool = load_jsonl_as_list(os.path.join(gen_root, "cand_pool", "union_pool", "mbeir_union_val_cand_pool.jsonl"))
    referenced = {d for e in data for d in e["pos_cand_list"] + e["neg_cand_list"]}
    assert {p["did"] for p in pool} == referenced  # trimmed to referenced dids


def test_held_out_filters(gen_root):
    gen.generate_union_train_cand_pool(gen_root, INFO)
    rng = random.Random(0)
    gen.unify_train_data(gen_root, upsample=True, datasets_info=INFO, rng=rng)
    gen.assign_task_ids(gen_root)
    # re-unify so the union file has task ids
    gen.unify_train_data(gen_root, upsample=True, datasets_info=INFO, rng=random.Random(0))

    out = gen.generate_held_n_dataset_out_data(gen_root)
    held_in = load_jsonl_as_list(out)
    # VisualNews is in HELD_OUT_DATASETS -> only MSCOCO remains
    assert all(e["qid"].startswith("9:") for e in held_in)

    out = gen.generate_held_1_domain_out_data(gen_root)
    held_in = load_jsonl_as_list(out)
    assert all(e["qid"].startswith("9:") for e in held_in)  # news domain dropped


def test_doc_key_and_pool_dict(tmp_path):
    entries = [
        {"did": "9:0", "txt": "hello", "modality": "text"},
        {"did": "9:1", "img_path": "a.jpg", "modality": "image"},
        {"did": "9:2", "txt": "hello", "modality": "text"},  # content duplicate of 9:0
    ]
    assert generate_mbeir_format_doc_key(entries[0]) == "hello-text"
    assert generate_mbeir_format_doc_key(entries[1]) == "a.jpg-image"
    dups = check_duplicates_in_mbeir_format_cand_pool(entries, print_duplicate=False)
    assert len(dups) == 1 and dups[0]["did"] == "9:2"

    p = tmp_path / "pool.jsonl"
    save_list_as_jsonl(entries[:2], str(p))
    d = load_mbeir_format_pool_file_as_dict(str(p), key_type="did")
    assert d == {"9:0": "9:0", "9:1": "9:1"}


def test_aggregate_candidates():
    data = [
        {"qid": "9:0", "query_txt": "q", "query_img_path": None, "query_modality": "text", "query_src_content": None, "pos_cand_list": ["9:1"], "neg_cand_list": ["9:2"]},
        {"qid": "9:5", "query_txt": "q", "query_img_path": None, "query_modality": "text", "query_src_content": None, "pos_cand_list": ["9:3", "9:1"], "neg_cand_list": []},
    ]
    agg = aggregate_candidates_for_mbeir_format_dataset(data, print_duplicate=False)
    assert len(agg) == 1
    assert agg[0]["pos_cand_list"] == ["9:1", "9:3"]
    assert agg[0]["qid"] == "9:0"


def test_modality_stats():
    pool = {"9:0": {"did": "9:0", "txt": "two words", "modality": "text"}, "9:1": {"did": "9:1", "img_path": "x.jpg", "modality": "image", "txt": None}}
    data = [
        {"qid": "9:0", "query_txt": "a b c", "query_modality": "text", "pos_cand_list": ["9:0"], "neg_cand_list": ["9:1"]},
    ]
    stats = get_modality_stats(data, pool)
    assert stats["pos"]["examples"]["text-text"] == 1
    assert stats["neg"]["examples"]["text-image"] == 1
    assert stats["avg_query_txt_words"] == 3.0
    assert stats["pos"]["avg_txt_words"] == 2.0
