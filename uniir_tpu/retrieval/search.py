"""Index search (reference search_index, src/common/mbeir_retriever.py:188-232).

Loads a DenseIndex into (sharded) device HBM and runs exact top-k with the
tiled-matmul kernel.  Returns (distances, hashed_indices) with the same
shapes/semantics as the FAISS path: indices are the hashed ids added at build.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from uniir_tpu.ops.topk import chunked_topk, pad_pool_for_chunks, shard_pool, sharded_topk
from uniir_tpu.ops.topk_pallas import CHUNK as PALLAS_CHUNK, PAD_ROWS, pallas_topk, quantize_pool
from uniir_tpu.retrieval.index import DenseIndex, normalize_l2


def search_dense_index(
    query_embeddings: np.ndarray,
    index: DenseIndex,
    num_cand_to_retrieve: int = 10,
    batch_size: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    chunk_size: int = 16384,
    pool_dtype: Optional[str] = None,
    stats: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact IP search; queries are L2-normalized first (reference :194).

    `pool_dtype` ("bf16" default, or "int8"; env `UNIIR_TOPK_POOL` when None)
    opts the single-device Pallas sweep into the int8 pool: half the HBM
    bytes and 2x the MXU rate on the one full-pool pass, with the selected
    buckets rescored exactly against the bf16 pool.  Every batch runs with
    the certainty guard (ops/topk_pallas.py pallas_topk docstring); a batch
    whose guard fails for ANY query is transparently re-run on the exact
    bf16 path, so results remain exact w.r.t. bf16 scores unconditionally.
    `stats` (optional dict) receives `guard_pass_rate` / `pool_dtype` /
    `exact_reruns` for observability.
    """
    q = normalize_l2(np.asarray(query_embeddings))
    k = num_cand_to_retrieve
    batch_size = batch_size or q.shape[0]

    multi_device = mesh is not None and np.prod(list(mesh.shape.values())) > 1
    on_tpu = jax.devices()[0].platform != "cpu"
    # UNIIR_TOPK_FORCE_PALLAS=interpret exercises the Pallas paths (incl. the
    # int8 pool + guard wiring) on CPU in interpret mode -- tests only
    interp = not on_tpu and os.environ.get("UNIIR_TOPK_FORCE_PALLAS") == "interpret"
    use_pallas = (on_tpu or interp) and not multi_device and index.ntotal > PALLAS_CHUNK

    chunk = min(chunk_size, index.ntotal)
    # one H2D transfer for the whole sweep (the pool can be multi-GB)
    if multi_device:
        pool_dev = shard_pool(index.embeds, mesh)
    else:
        # pad to the tallest DMA block height so the sweep can run tall blocks
        pool_host = pad_pool_for_chunks(index.embeds, PAD_ROWS if use_pallas else chunk)
        pool_dev = jax.device_put(pool_host)

    pool_dtype = pool_dtype or os.environ.get("UNIIR_TOPK_POOL", "bf16")
    assert pool_dtype in ("bf16", "int8"), pool_dtype
    pool_quant = None
    if use_pallas and pool_dtype == "int8":
        pool_quant = quantize_pool(pool_dev)  # [N,D] int8 + [N] f32 scales, on device
    n_guard, n_guard_ok, n_reruns = 0, 0, 0

    all_scores, all_idx = [], []
    for i in range(0, q.shape[0], batch_size):
        qb = q[i : i + batch_size]
        if multi_device:
            s, idx = sharded_topk(qb, pool_dev, k, mesh, chunk_size=chunk_size, valid_n=index.ntotal)
        elif pool_quant is not None:
            s, idx, ok = pallas_topk(
                qb, pool_dev, k, valid_n=index.ntotal, pool_quant=pool_quant,
                with_guard=True, interpret=interp,
            )
            ok = np.asarray(ok)
            n_guard += ok.size
            n_guard_ok += int(ok.sum())
            if not ok.all():
                # whole-batch exact re-run: guard failures are rare, and a
                # per-query re-dispatch would recompile per failure count
                n_reruns += 1
                s, idx = pallas_topk(qb, pool_dev, k, valid_n=index.ntotal, interpret=interp)
        elif use_pallas:
            # fused Pallas kernel: matmul + bucket-max epilogue, ~2-4x the
            # chunked XLA path on v5e (see ops/topk_pallas.py)
            s, idx = pallas_topk(qb, pool_dev, k, valid_n=index.ntotal, interpret=interp)
        else:
            s, idx = chunked_topk(qb, pool_dev, k, chunk_size=chunk, valid_n=index.ntotal)
        all_scores.append(np.asarray(s))
        all_idx.append(np.asarray(idx))
    if stats is not None:
        stats["pool_dtype"] = "int8" if pool_quant is not None else "bf16"
        stats["guard_pass_rate"] = (n_guard_ok / n_guard) if n_guard else None
        stats["exact_reruns"] = n_reruns
    scores = np.vstack(all_scores)
    pool_rows = np.vstack(all_idx)
    hashed = index.ids[np.clip(pool_rows, 0, index.ntotal - 1)]
    return scores, hashed


def search_index(
    query_embed_path: str,
    cand_index_path: str,
    batch_size: int = 2048,
    num_cand_to_retrieve: int = 10,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """File-level API mirroring the reference signature (:188-222)."""
    query_embeddings = np.load(query_embed_path)
    index = DenseIndex.load(cand_index_path)
    return search_dense_index(
        query_embeddings, index, num_cand_to_retrieve=num_cand_to_retrieve, batch_size=batch_size, mesh=mesh
    )
