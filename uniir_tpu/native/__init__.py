"""Native host data-path (C++ CPython extension) with pure-Python fallback.

`load_jsonl(path)` -- jsonl parser that releases the GIL for the whole parse
phase (python json holds it per line, starving concurrent image-decode
threads in the data loader); throughput is on par with the C json module.
`cpu_topk(queries, pool, k)` -- threaded exact inner-product top-k for
CPU-only environments (the FAISS-fallback role; on TPU use ops.topk*).

The extension builds on first import if a compiler is available; everything
degrades gracefully to Python/numpy otherwise.  `NATIVE_AVAILABLE` reports
which path is active; set UNIIR_TPU_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import List, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ext = None


def _try_import():
    global _ext
    if os.environ.get("UNIIR_TPU_NO_NATIVE"):
        return None
    if _ext is not None:
        return _ext
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        import fastjsonl  # type: ignore

        _ext = fastjsonl
        return _ext
    except ImportError:
        return None


def _try_build() -> bool:
    try:
        result = subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_HERE,
            capture_output=True,
            timeout=300,
        )
        return result.returncode == 0
    except Exception:
        return False


def ensure_native(build: bool = True) -> bool:
    """Import (building if needed) the native extension; returns availability."""
    if _try_import() is not None:
        return True
    if build and not os.environ.get("UNIIR_TPU_NO_NATIVE") and _try_build():
        return _try_import() is not None
    return False


def load_jsonl(path: str) -> list:
    """Parse a jsonl file into a list of python objects (native when available)."""
    ext = _try_import()
    if ext is not None:
        return ext.load_jsonl(path)
    out = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def cpu_topk(queries: np.ndarray, pool: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact inner-product top-k on the host. Returns (scores f32, indices i64)."""
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    pool = np.ascontiguousarray(pool, dtype=np.float32)
    assert queries.ndim == 2 and pool.ndim == 2 and queries.shape[1] == pool.shape[1]
    Q = queries.shape[0]
    ext = _try_import()
    if ext is not None:
        Q, D = queries.shape
        N = pool.shape[0]
        s_bytes, i_bytes = ext.topk(queries, int(Q), int(D), pool, int(N), int(k))
        scores = np.frombuffer(s_bytes, dtype=np.float32).reshape(Q, k).copy()
        indices = np.frombuffer(i_bytes, dtype=np.int64).reshape(Q, k).copy()
        return scores, indices
    # numpy fallback
    sim = queries @ pool.T
    idx = np.argpartition(-sim, kth=min(k, sim.shape[1] - 1), axis=1)[:, :k]
    part = np.take_along_axis(sim, idx, axis=1)
    order = np.argsort(-part, axis=1)
    return np.take_along_axis(part, order, axis=1), np.take_along_axis(idx, order, axis=1).astype(np.int64)


NATIVE_AVAILABLE = ensure_native(build=False)
