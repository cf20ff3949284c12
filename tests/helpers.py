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
