"""Native C++ host data-path: build, parity with json / numpy."""

import json
import os

import numpy as np
import pytest

from uniir_tpu import native


@pytest.fixture(scope="module")
def built():
    ok = native.ensure_native(build=True)
    if not ok:
        pytest.skip("no compiler available for the native extension")
    return ok


def test_load_jsonl_parity(built, tmp_path):
    entries = [
        {"did": "9:1", "txt": "hello \"quoted\" é中文", "img_path": None, "modality": "text"},
        {"qid": "9:2", "pos_cand_list": ["9:1", "9:3"], "score": 1.5, "n": -42, "ok": True, "no": False},
        {"nested": {"a": [1, 2, {"b": None}], "c": "\\backslash\\"}},
        {"unicode_escape": "café 😀"},
    ]
    p = tmp_path / "test.jsonl"
    with open(p, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
        f.write("\n")  # blank line tolerated
    out = native.load_jsonl(str(p))
    ref = [json.loads(l) for l in open(p) if l.strip()]
    assert out == ref


def test_load_jsonl_large(built, tmp_path):
    p = tmp_path / "big.jsonl"
    with open(p, "w") as f:
        for i in range(5000):
            f.write(json.dumps({"did": f"9:{i}", "txt": f"entry {i}", "modality": "text"}) + "\n")
    out = native.load_jsonl(str(p))
    assert len(out) == 5000
    assert out[4999]["did"] == "9:4999"


def test_load_jsonl_bad_line(built, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"ok": 1}\n{broken\n')
    with pytest.raises(ValueError, match="line 2"):
        native.load_jsonl(str(p))


def test_load_jsonl_missing_file(built):
    with pytest.raises(FileNotFoundError):
        native.load_jsonl("/nonexistent/file.jsonl")


def test_cpu_topk_parity(built):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    pool = rng.normal(size=(500, 32)).astype(np.float32)
    s, i = native.cpu_topk(q, pool, 10)
    sim = q @ pool.T
    ref_i = np.argsort(-sim, axis=1)[:, :10]
    ref_s = np.take_along_axis(sim, ref_i, axis=1)
    np.testing.assert_allclose(s, ref_s, rtol=1e-5)
    np.testing.assert_array_equal(i, ref_i)


def test_cpu_topk_python_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("UNIIR_TPU_NO_NATIVE", "1")
    rng = np.random.default_rng(1)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    pool = rng.normal(size=(50, 8)).astype(np.float32)
    s, i = native.cpu_topk(q, pool, 5)
    sim = q @ pool.T
    ref_i = np.argsort(-sim, axis=1)[:, :5]
    np.testing.assert_array_equal(i, ref_i)
