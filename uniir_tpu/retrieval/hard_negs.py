"""Hard-negative mining (reference run_hard_negative_mining,
src/common/mbeir_retriever.py:606-709).

Search train queries against the index, drop dids already in pos/neg lists,
pad/truncate to num_hard_negs, append to neg_cand_list, write
`mbeir_{ds}_hard_negs_train.jsonl`.
"""

from __future__ import annotations

import os

import numpy as np

from uniir_tpu.data.dataset import load_jsonl, save_jsonl
from uniir_tpu.data.registry import unhash_did, unhash_qid
from uniir_tpu.retrieval.index import DenseIndex
from uniir_tpu.retrieval.search import search_dense_index


def run_hard_negative_mining(config, mesh=None) -> str:
    uniir_dir = config.uniir_dir
    mbeir_data_dir = config.mbeir_data_dir
    retrieval_config = config.retrieval_config
    expt_dir_name = config.experiment.path_suffix
    embed_dir_name = retrieval_config.embed_dir_name
    index_dir_name = retrieval_config.index_dir_name
    hard_negs_dir_name = retrieval_config.hard_negs_dir_name

    train_cfg = retrieval_config.train_datasets_config
    assert train_cfg.enable_retrieve, "Hard negative mining is not enabled for training data"
    dataset_name = train_cfg.datasets_name[0].lower()  # first dataset only (reference :618-620)
    split = "train"

    query_data_path = os.path.join(mbeir_data_dir, "train", f"mbeir_{dataset_name}_{split}.jsonl")
    query_data_list = load_jsonl(query_data_path)

    dataset_embed_dir = os.path.join(uniir_dir, embed_dir_name, expt_dir_name, split)
    query_ids = np.load(os.path.join(dataset_embed_dir, f"mbeir_{dataset_name}_{split}_ids.npy"))
    query_embeds = np.load(os.path.join(dataset_embed_dir, f"mbeir_{dataset_name}_{split}_embed.npy"))

    cand_pool_name = train_cfg.correspond_cand_pools_name[0].lower()
    cand_index_path = os.path.join(
        uniir_dir, index_dir_name, expt_dir_name, "cand_pool", f"mbeir_{cand_pool_name}_cand_pool.index"
    )
    index = DenseIndex.load(cand_index_path)

    num_hard_negs = int(retrieval_config.num_hard_negs)
    k = int(retrieval_config.k)
    _, retrieved_indices = search_dense_index(query_embeds, index, num_cand_to_retrieve=k, mesh=mesh)
    assert len(query_ids) == len(retrieved_indices)

    for i, query_id in enumerate(query_ids):
        query_data = query_data_list[i]
        assert unhash_qid(query_id) == query_data["qid"]
        retrieved_dids = [unhash_did(x) for x in retrieved_indices[i]]

        pos_cand_list = query_data["pos_cand_list"]
        neg_cand_list = query_data["neg_cand_list"]
        hard_negatives = [d for d in retrieved_dids if d not in pos_cand_list and d not in neg_cand_list]

        # Pad to num_hard_negs by cycling (reference :677-680)
        if 0 < len(hard_negatives) < num_hard_negs:
            multiplier = num_hard_negs // len(hard_negatives)
            remainder = num_hard_negs % len(hard_negatives)
            hard_negatives = hard_negatives * multiplier + hard_negatives[:remainder]
        elif len(hard_negatives) == 0:
            print("Warning: hard_negatives list is empty.")

        query_data["neg_cand_list"].extend(hard_negatives[:num_hard_negs])

    out_path = os.path.join(
        mbeir_data_dir, "train", hard_negs_dir_name, f"mbeir_{dataset_name}_hard_negs_{split}.jsonl"
    )
    save_jsonl(query_data_list, out_path)
    print(f"MBEIR Train Data with Hard Negatives saved to {out_path} ({len(query_data_list)} entries)")
    return out_path
