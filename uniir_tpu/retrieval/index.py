"""Dense index build/load (FAISS `IDMap,Flat` replacement).

The reference builds a FAISS flat-IP index from the embedding `.npy` artifacts
(reference src/common/mbeir_retriever.py:34-129).  Here the "index" is simply
the L2-normalized embedding matrix plus hashed ids, stored as an .npz behind
the same `mbeir_{pool}_cand_pool.index` filename so retrieval.yaml drives it
unchanged; search loads it into (sharded) HBM and runs exact tiled-matmul
top-k (`uniir_tpu.ops.topk`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def normalize_l2(x: np.ndarray) -> np.ndarray:
    """faiss.normalize_L2 semantics in fp32 (zero rows stay zero)."""
    x = x.astype(np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms == 0, 1.0, norms)


@dataclass
class DenseIndex:
    embeds: np.ndarray  # [N, D] fp16, L2-normalized
    ids: np.ndarray  # [N] int64 hashed ids

    @property
    def ntotal(self) -> int:
        return self.embeds.shape[0]

    @property
    def dim(self) -> int:
        return self.embeds.shape[1]

    @classmethod
    def build(cls, embeds: np.ndarray, ids: np.ndarray) -> "DenseIndex":
        ids = np.asarray(ids, dtype=np.int64)
        assert len(ids) == len(set(ids.tolist())), "IDs should be unique"
        assert embeds.shape[0] == ids.shape[0]
        return cls(embeds=normalize_l2(embeds).astype(np.float16), ids=ids)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # .index filename, npz payload (np.savez needs .npz, so write then move)
        tmp = path + ".npz"
        np.savez(tmp, embeds=self.embeds, ids=self.ids)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "DenseIndex":
        with np.load(path) as z:
            return cls(embeds=z["embeds"], ids=z["ids"])


def create_index(config) -> list:
    """Build indexes for every pool in index_config (reference create_index :34-129).

    Reads `mbeir_{pool}_cand_pool_embed.npy` + `_ids.npy` written by the
    embedder, L2-normalizes, and writes `mbeir_{pool}_cand_pool.index`.

    Pod-safe: pure host-side numpy, so only process 0 builds and writes
    (every process would otherwise write the same files -- the reference's
    rank-0 discipline, mbeir_embedder.py:79-116); everyone then syncs at the
    barrier before downstream stages read the index files.
    """
    from uniir_tpu.core.mesh import barrier, is_main_process

    if not is_main_process():
        barrier("create_index_done")
        return []
    uniir_dir = config.uniir_dir
    index_config = config.index_config
    embed_dir_name = index_config.embed_dir_name
    index_dir_name = index_config.index_dir_name
    expt_dir_name = config.experiment.path_suffix

    idx_cfg = index_config.cand_pools_config
    assert idx_cfg.enable_idx, "Indexing is not enabled for candidate pool"
    split_name = "cand_pool"
    written = []
    for cand_pool_name in idx_cfg.cand_pools_name_to_idx:
        cand_pool_name = cand_pool_name.lower()
        embed_dir = os.path.join(uniir_dir, embed_dir_name, expt_dir_name, split_name)
        embed_path = os.path.join(embed_dir, f"mbeir_{cand_pool_name}_{split_name}_embed.npy")
        ids_path = os.path.join(embed_dir, f"mbeir_{cand_pool_name}_{split_name}_ids.npy")

        embeds = np.load(embed_path)
        ids = np.load(ids_path)
        faiss_cfg = getattr(index_config, "faiss_config", None)
        if faiss_cfg is not None and getattr(faiss_cfg, "dim", None):
            assert faiss_cfg.dim == embeds.shape[1], (
                "The dimension of the index does not match the dimension of the embeddings!"
            )
        index = DenseIndex.build(embeds, ids)

        index_path = os.path.join(
            uniir_dir, index_dir_name, expt_dir_name, split_name, f"mbeir_{cand_pool_name}_{split_name}.index"
        )
        index.save(index_path)
        print(f"Successfully indexed {index.ntotal} documents")
        print(f"Index saved to: {index_path}")
        written.append(index_path)
    barrier("create_index_done")
    return written
