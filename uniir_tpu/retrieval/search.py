"""Index search (reference search_index, src/common/mbeir_retriever.py:188-232).

Loads a DenseIndex into (sharded) device HBM and runs exact top-k with the
tiled-matmul kernel.  Returns (distances, hashed_indices) with the same
shapes/semantics as the FAISS path: indices are the hashed ids added at build.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from uniir_tpu.ops.topk import chunked_topk, pad_pool_for_chunks, shard_pool, sharded_topk
from uniir_tpu.ops.topk_pallas import CHUNK as PALLAS_CHUNK, pallas_topk
from uniir_tpu.retrieval.index import DenseIndex, normalize_l2


def search_dense_index(
    query_embeddings: np.ndarray,
    index: DenseIndex,
    num_cand_to_retrieve: int = 10,
    batch_size: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    chunk_size: int = 16384,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact IP search; queries are L2-normalized first (reference :194)."""
    q = normalize_l2(np.asarray(query_embeddings))
    k = num_cand_to_retrieve
    batch_size = batch_size or q.shape[0]

    multi_device = mesh is not None and np.prod(list(mesh.shape.values())) > 1
    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = on_tpu and not multi_device and index.ntotal > PALLAS_CHUNK

    chunk = min(chunk_size, index.ntotal)
    # one H2D transfer for the whole sweep (the pool can be multi-GB)
    if multi_device:
        pool_dev = shard_pool(index.embeds, mesh)
    else:
        pool_host = pad_pool_for_chunks(index.embeds, PALLAS_CHUNK if use_pallas else chunk)
        pool_dev = jax.device_put(pool_host)

    all_scores, all_idx = [], []
    for i in range(0, q.shape[0], batch_size):
        qb = q[i : i + batch_size]
        if multi_device:
            s, idx = sharded_topk(qb, pool_dev, k, mesh, chunk_size=chunk_size, valid_n=index.ntotal)
        elif use_pallas:
            # fused Pallas kernel: matmul + bucket-max epilogue, ~2-4x the
            # chunked XLA path on v5e (see ops/topk_pallas.py)
            s, idx = pallas_topk(qb, pool_dev, k, valid_n=index.ntotal)
        else:
            s, idx = chunked_topk(qb, pool_dev, k, chunk_size=chunk, valid_n=index.ntotal)
        all_scores.append(np.asarray(s))
        all_idx.append(np.asarray(idx))
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
