"""Dataset preprocessors over tiny synthetic raw data."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from uniir_tpu.data.preprocessing import cirr, infoseek, mscoco, nights, oven, webqa
from uniir_tpu.data.preprocessing.io_utils import load_jsonl_as_list, save_list_as_jsonl


def make_jpg(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(path, "JPEG")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path)


def test_mscoco_pool_and_conversion(root):
    mscoco_dir = os.path.join(root, "src_data/mscoco")
    os.makedirs(mscoco_dir, exist_ok=True)
    data = [
        {"image": "train2014/img_0.png", "caption": "a cat on a mat"},
        {"image": "train2014/img_1.png", "caption": ["a dog", "a brown dog", "dog outside", "puppy", "canine", "sixth ignored"]},
    ]
    for e in data:
        make_jpg(os.path.join(root, mscoco.coco_image_rel_path(e["image"])))
    with open(os.path.join(mscoco_dir, "coco_karpathy_train.json"), "w") as f:
        json.dump(data, f)
    with open(os.path.join(mscoco_dir, "coco_karpathy_val.json"), "w") as f:
        json.dump(data[:1], f)
    with open(os.path.join(mscoco_dir, "coco_karpathy_test.json"), "w") as f:
        json.dump(data[1:], f)

    out_paths = {
        "all": os.path.join(mscoco_dir, "mbeir_mscoco_cand_pool.jsonl"),
        "txt_val": os.path.join(mscoco_dir, "txt_val.jsonl"),
        "txt_test": os.path.join(mscoco_dir, "txt_test.jsonl"),
        "img_val": os.path.join(mscoco_dir, "img_val.jsonl"),
        "img_test": os.path.join(mscoco_dir, "img_test.jsonl"),
    }
    pool = mscoco.generate_mscoco_candidate_pool(mscoco_dir, root, out_paths)
    entries = load_jsonl_as_list(out_paths["all"])
    # 2 images + (1 + 5) captions, content-deduplicated; max 5 captions per image
    assert len([e for e in entries if e["modality"] == "image"]) == 2
    assert len([e for e in entries if e["modality"] == "text"]) == 6
    assert entries[0]["did"].startswith("9:")
    # val/test sub-pools
    assert len(load_jsonl_as_list(out_paths["img_val"])) == 1
    assert len(load_jsonl_as_list(out_paths["txt_test"])) == 5

    mscoco.convert_splits(mscoco_dir, root, out_paths["all"])
    train = load_jsonl_as_list(os.path.join(mscoco_dir, "mbeir_mscoco_train.jsonl"))
    # 6 t2i + 2 i2t queries
    assert len([e for e in train if e["query_modality"] == "text"]) == 6
    assert len([e for e in train if e["query_modality"] == "image"]) == 2
    assert all(e["qid"].startswith("9:") and e["pos_cand_list"] for e in train)


def test_webqa_pool_and_conversion(root):
    make_jpg(os.path.join(root, webqa.webqa_image_rel_path(30001234)))
    data = {
        "guid1": {
            "Guid": "guid1",
            "Qcate": "text",
            "Q": "what color is the sky",
            "split": "train",
            "img_posFacts": [{"image_id": 30001234, "caption": "the sky at noon"}],
            "img_negFacts": [],
            "txt_posFacts": [{"fact": "the sky is blue"}],
            "txt_negFacts": [{"fact": "grass is green"}],
        },
        "guid2": {
            "Guid": "guid2",
            "Qcate": "text",
            "Q": "",
            "split": "train",
            "img_posFacts": [],
            "img_negFacts": [],
            "txt_posFacts": [{"fact": "ignored"}],
            "txt_negFacts": [],
        },
    }
    pool_path = os.path.join(root, "webqa_pool.jsonl")
    webqa.generate_webqa_candidate_pool(data, pool_path)
    pool = load_jsonl_as_list(pool_path)
    assert {e["modality"] for e in pool} == {"image,text", "text"}
    assert all(e["did"].startswith("2:") for e in pool)

    entries = webqa.webqa_to_mbeir(data, pool_path)
    assert len(entries) == 1  # empty-question query dropped
    e = entries[0]
    assert len(e["pos_cand_list"]) == 2 and len(e["neg_cand_list"]) == 1
    assert json.loads(e["query_src_content"])["Guid"] == "guid1"


def test_cirr_conversion(root):
    names = ["ref1", "tgtA", "tgtB"]
    split_map = {n: f"train/{n}.png" for n in names}
    for n in names:
        make_jpg(os.path.join(root, "mbeir_images/cirr_images/train", n + ".jpg"))
    pool_path = os.path.join(root, "cirr_pool.jsonl")
    cirr.generate_cirr_candidate_pool(split_map, pool_path, root)
    data = [
        {"reference": "ref1", "caption": "make it red", "target_soft": {"tgtA": 1.0, "tgtB": 0.2}},
        {"reference": "ref1", "caption": "make it red", "target_soft": {"tgtB": -1.0}},  # dedup merge
        {"reference": "missing", "caption": "x", "target_soft": {"tgtA": 1.0}},
    ]
    entries = cirr.cirr_to_mbeir(data, pool_path, root)
    assert len(entries) == 1
    e = entries[0]
    assert e["query_modality"] == "image,text"
    assert len(e["pos_cand_list"]) == 1 and len(e["neg_cand_list"]) == 1


def test_nights_conversion(root):
    rows = []
    for i, vote in enumerate(["0", "1"]):
        for p in (f"ref/000/r{i}.png", f"distort/000/l{i}.png", f"distort/000/ri{i}.png"):
            make_jpg(os.path.join(root, nights.nights_image_rel_path(p)))
        rows.append(
            {
                "id": str(i),
                "ref_path": f"ref/000/r{i}.png",
                "left_path": f"distort/000/l{i}.png",
                "right_path": f"distort/000/ri{i}.png",
                "right_vote": vote,
                "split": "train",
                "is_imagenet": "True",
            }
        )
    pool_path = os.path.join(root, "nights_pool.jsonl")
    nights.generate_nights_candidate_pool(rows, pool_path, root)
    entries = nights.nights_to_mbeir(rows, pool_path, root)
    assert len(entries) == 2
    # vote 0 -> left is positive; vote 1 -> right is positive
    pool = nights.load_nights_pool_as_dict(pool_path)
    assert entries[0]["pos_cand_list"] == [pool["000/l0"]["did"]]
    assert entries[1]["pos_cand_list"] == [pool["000/ri1"]["did"]]


def test_oven_and_infoseek_flow(root):
    wiki = [
        {"wikidata_id": "Q1", "wikipedia_title": "Cat", "wikipedia_content": "the cat is a small feline " * 30, "wikipedia_image_url": None},
        {"wikidata_id": "Q2", "wikipedia_title": "Dog", "wikipedia_content": "the dog answer42 is a canine", "wikipedia_image_url": None},
    ]
    wiki_path = os.path.join(root, "Wiki6M.jsonl")
    save_list_as_jsonl(wiki, wiki_path)

    pool_path = os.path.join(root, "oven_pool.jsonl")
    oven.parallel_generate_oven_candidate_pool(wiki_path, pool_path, root, num_processes=2)
    pool = load_jsonl_as_list(pool_path)
    assert len(pool) == 2 and all(e["modality"] == "text" for e in pool)
    # summary truncation to 100 tokens
    assert len(pool[0]["txt"].split()) <= 102

    # OVEN query conversion
    make_jpg(os.path.join(root, oven.oven_query_image_rel_path("oven_05000042")))
    oven_data = [
        {"data_id": "d1", "image_id": "oven_05000042", "question": "what animal", "entity_id": "Q1", "data_split": "train"}
    ]
    entries = oven.oven_to_mbeir(oven_data, pool_path, root)
    assert len(entries) == 1
    assert entries[0]["query_modality"] == "image,text"

    # INFOSEEK: positive only when answer is contained in the wiki content
    kb = [{"data_id": "i1", "entity_id": "Q2"}, {"data_id": "i2", "entity_id": "Q1"}]
    kb_path = os.path.join(root, "withkb.jsonl")
    save_list_as_jsonl(kb, kb_path)
    info_data = [
        {"data_id": "i1", "image_id": "oven_05000042", "question": "which answer", "answer": ["answer42"], "answer_eval": [], "data_split": "train"},
        {"data_id": "i2", "image_id": "oven_05000042", "question": "which answer", "answer": ["nope"], "answer_eval": [], "data_split": "train"},
    ]
    raw_pool_path = os.path.join(root, "infoseek_raw.jsonl")
    entries = infoseek.infoseek_to_mbeir_and_create_raw_cand_pool(info_data, wiki_path, raw_pool_path, kb_path, None, root)
    assert len(entries) == 1  # i2's answer not contained -> dropped
    raw_pool = load_jsonl_as_list(raw_pool_path)
    assert len(raw_pool) == 1 and raw_pool[0]["wikidata_id"] == "Q2"

    # chunked candidate conversion: Q1 content (~180 words) -> 2 chunks
    save_list_as_jsonl(wiki, raw_pool_path)
    cands = infoseek.convert_raw_infoseek_cand_pool_to_mbeir_format(raw_pool_path, root)
    q1_chunks = [c for c in cands if json.loads(c["src_content"])["wikidata_id"] == "Q1"]
    assert len(q1_chunks) == 2
    assert all(c["did"].startswith("6:") for c in cands)

    resolved = infoseek.update_mbeir_format_infoseek_data_with_cand_pool(entries, cands)
    assert len(resolved) == 1
    assert len(resolved[0]["pos_cand_list"]) == 1  # all Q2 chunks
