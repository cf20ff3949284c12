import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import build_mbeir_fixture, identity_image_transform, simple_tokenizer
from uniir_tpu.ops.topk import chunked_topk, sharded_topk, topk_numpy_reference
from uniir_tpu.retrieval.index import DenseIndex, normalize_l2
from uniir_tpu.retrieval.search import search_dense_index
from uniir_tpu.retrieval.eval import (
    compute_recall_at_k,
    evaluate_recall,
    load_qrel,
    write_run_file,
    write_tsv_report,
)


def test_chunked_topk_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    pool = rng.normal(size=(1000, 32)).astype(np.float32)
    # normalize so bf16 rounding can't reorder near-ties catastrophically
    q = normalize_l2(q)
    pool = normalize_l2(pool)
    s, idx = chunked_topk(q, pool, k=10, chunk_size=128)
    ref_s, ref_idx = topk_numpy_reference(q, pool, 10)
    # bf16 matmul: compare by set overlap of retrieved ids + score closeness
    for r in range(q.shape[0]):
        overlap = len(set(np.asarray(idx[r]).tolist()) & set(ref_idx[r].tolist()))
        assert overlap >= 9, (r, overlap)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=2e-2)


def test_chunked_topk_respects_valid_n():
    rng = np.random.default_rng(1)
    pool = rng.normal(size=(100, 16)).astype(np.float32)
    pool[90:] = 100.0  # padding rows would dominate if not masked
    q = rng.normal(size=(3, 16)).astype(np.float32)
    _, idx = chunked_topk(q, pool, k=5, chunk_size=32, valid_n=90)
    assert (np.asarray(idx) < 90).all()


def test_sharded_topk_matches_single_device(mesh8):
    rng = np.random.default_rng(2)
    q = normalize_l2(rng.normal(size=(5, 64)).astype(np.float32))
    pool = normalize_l2(rng.normal(size=(803, 64)).astype(np.float32))  # non-divisible
    s1, i1 = chunked_topk(q, pool, k=7, chunk_size=128)
    s8, i8 = sharded_topk(q, pool, k=7, mesh=mesh8, chunk_size=64)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s8), atol=1e-2)
    for r in range(5):
        assert len(set(np.asarray(i1[r]).tolist()) & set(np.asarray(i8[r]).tolist())) >= 6


def test_dense_index_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    embeds = rng.normal(size=(50, 16)).astype(np.float16)
    ids = np.arange(50, dtype=np.int64) * 7
    index = DenseIndex.build(embeds, ids)
    p = str(tmp_path / "test.index")
    index.save(p)
    loaded = DenseIndex.load(p)
    np.testing.assert_array_equal(loaded.ids, ids)
    norms = np.linalg.norm(loaded.embeds.astype(np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)

    with pytest.raises(AssertionError):
        DenseIndex.build(embeds, np.zeros(50, np.int64))  # duplicate ids


def test_search_returns_hashed_ids():
    rng = np.random.default_rng(4)
    embeds = normalize_l2(rng.normal(size=(100, 16)).astype(np.float32))
    ids = 90_000_000 + np.arange(100, dtype=np.int64)
    index = DenseIndex.build(embeds, ids)
    # query = candidate 17 -> top hit must be id 90_000_017
    scores, hashed = search_dense_index(embeds[17:18], index, num_cand_to_retrieve=3)
    assert hashed[0, 0] == 90_000_017
    assert scores[0, 0] > 0.99


def test_recall_hit_rate_semantics():
    assert compute_recall_at_k(["a", "b"], ["x", "a", "y"], 2) == 1.0
    assert compute_recall_at_k(["a"], ["x", "y", "a"], 2) == 0.0
    assert compute_recall_at_k([], ["x"], 5) == 0.0
    # hit-rate, not fraction: only one of two relevants retrieved -> still 1.0
    assert compute_recall_at_k(["a", "b"], ["a"], 1) == 1.0


def test_qrel_runfile_tsv_roundtrip(tmp_path):
    qrel_path = str(tmp_path / "qrels.txt")
    with open(qrel_path, "w") as f:
        f.write("9:0 0 9:0 1 0\n9:0 0 9:5 1 0\n9:1 0 9:2 1 3\n")
    qrel, qid_to_taskid = load_qrel(qrel_path)
    assert qrel["9:0"] == ["9:0", "9:5"]
    assert qid_to_taskid["9:1"] == "3"

    # retrieved: query 9:0 hits 9:0 at rank1; query 9:1 misses
    hashed_qids = np.array([9 * 500_000 + 0, 9 * 500_000 + 1])
    retrieved = np.array([[90_000_000 + 0, 90_000_000 + 9], [90_000_000 + 7, 90_000_000 + 8]])
    dist = np.array([[0.9, 0.5], [0.8, 0.4]])

    run_path = str(tmp_path / "run.txt")
    write_run_file(run_path, dist, retrieved, hashed_qids, qid_to_taskid, "test_run")
    lines = open(run_path).read().strip().split("\n")
    assert len(lines) == 4
    assert lines[0].split() == ["9:0", "Q0", "9:0", "1", "0.9", "test_run", "0"]

    per_task = evaluate_recall(retrieved, hashed_qids, qrel, qid_to_taskid, ["Recall@1", "Recall@2"])
    assert per_task["0"]["Recall@1"] == 1.0
    assert per_task["3"]["Recall@1"] == 0.0

    results = [
        {"TaskID": 0, "Task": "text -> image", "Dataset": "mscoco_task0", "Split": "test", "CandPool": "mscoco_task0", "Recall@1": 1.0},
        {"TaskID": 0, "Task": "text -> image", "Dataset": "mscoco_task0", "Split": "test", "CandPool": "union", "Recall@1": 0.5},
    ]
    tsv_path = str(tmp_path / "out.tsv")
    write_tsv_report(results, tsv_path)
    rows = [l.split("\t") for l in open(tsv_path).read().strip().split("\n")]
    assert rows[0][:4] == ["TaskID", "Task", "Dataset", "Split"]
    assert rows[1][6] == "1.0" and rows[1][8] == "0.5"  # single-pool value + union column


def test_bucketed_topk_exact():
    from uniir_tpu.ops.topk import bucketed_topk
    import jax
    rng = np.random.default_rng(7)
    scores = rng.normal(size=(5, 4096)).astype(np.float32)
    for k in (1, 7, 10):
        v, i = bucketed_topk(jnp.asarray(scores), k)
        rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv), atol=1e-6)
        # indices must point at the same values (ties may reorder)
        np.testing.assert_allclose(np.take_along_axis(scores, np.asarray(i), 1), np.asarray(rv), atol=1e-6)
    # clustered case: all top values in ONE bucket (the k<=buckets guarantee)
    scores2 = np.zeros((2, 4096), np.float32)
    scores2[:, 256:266] = np.arange(10, 0, -1)
    v, i = bucketed_topk(jnp.asarray(scores2), 10)
    assert set(np.asarray(i[0]).tolist()) == set(range(256, 266))


def test_search_int8_pool_matches_exact(monkeypatch):
    """search_dense_index(pool_dtype="int8") == the exact bf16 search (round-4
    wiring of the int8-pool Pallas sweep + certainty guard + exact-rerun
    fallback; VERDICT r3 item 4).  Runs on CPU via interpret mode."""
    from uniir_tpu.ops.topk_pallas import CHUNK

    monkeypatch.setenv("UNIIR_TOPK_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(11)
    n, dim = 3 * CHUNK - 17, 32
    embeds = normalize_l2(rng.normal(size=(n, dim)).astype(np.float32))
    ids = 70_000_000 + np.arange(n, dtype=np.int64)
    index = DenseIndex.build(embeds, ids)
    q = normalize_l2(rng.normal(size=(16, dim)).astype(np.float32))

    s_ref, h_ref = search_dense_index(q, index, num_cand_to_retrieve=5)
    stats = {}
    s_i8, h_i8 = search_dense_index(q, index, num_cand_to_retrieve=5, pool_dtype="int8", stats=stats)

    assert stats["pool_dtype"] == "int8" and stats["guard_pass_rate"] is not None
    # exactness contract: guard + whole-batch rerun make the result identical
    # to the bf16 path whenever the guard logic is sound
    np.testing.assert_array_equal(h_i8, h_ref)
    np.testing.assert_allclose(s_i8, s_ref, atol=1e-2)

    # env opt-in path reaches the same wiring
    monkeypatch.setenv("UNIIR_TOPK_POOL", "int8")
    stats2 = {}
    _, h_env = search_dense_index(q, index, num_cand_to_retrieve=5, stats=stats2)
    assert stats2["pool_dtype"] == "int8"
    np.testing.assert_array_equal(h_env, h_ref)
