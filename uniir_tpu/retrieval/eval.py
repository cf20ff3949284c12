"""Retrieval evaluation: qrels, run files, Recall@k, TSV reports.

Byte-compatible with the reference formats
(reference src/common/mbeir_retriever.py:149-185,312-603):
  * qrels:    `qid 0 did relevance task_id` whitespace rows
  * run file: `qid Q0 did rank score run_id task_id`
  * Recall@k: hit-rate -- 1.0 if any relevant doc in top-k else 0.0
  * TSV:      TaskID/Task/Dataset/Split/Metric/CandPool/Value/UnionPool/UnionValue
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from datetime import datetime
from typing import Dict, List, Optional, Tuple

import numpy as np

from uniir_tpu.data.registry import get_mbeir_task_name, unhash_did, unhash_qid
from uniir_tpu.retrieval.index import DenseIndex
from uniir_tpu.retrieval.search import search_dense_index

AVAILABLE_RECALL_METRICS = ["Recall@1", "Recall@5", "Recall@10", "Recall@20", "Recall@50"]

# Sort orders matching the reference's report (mbeir_retriever.py:507-534).
DATASET_ORDER = {
    "visualnews_task0": 1,
    "mscoco_task0": 2,
    "fashion200k_task0": 3,
    "webqa_task1": 4,
    "edis_task2": 5,
    "webqa_task2": 6,
    "visualnews_task3": 7,
    "mscoco_task3": 8,
    "fashion200k_task3": 9,
    "nights_task4": 10,
    "oven_task6": 11,
    "infoseek_task6": 12,
    "fashioniq_task7": 13,
    "cirr_task7": 14,
    "oven_task8": 15,
    "infoseek_task8": 16,
}
SPLIT_ORDER = {"val": 1, "test": 2}
CAND_POOL_ORDER = {"union": 99}


def compute_recall_at_k(relevant_docs, retrieved_indices, k: int) -> float:
    """Hit-rate recall (reference :149-166)."""
    if not relevant_docs:
        return 0.0
    if set(relevant_docs).intersection(set(retrieved_indices[:k])):
        return 1.0
    return 0.0


def load_qrel(filename: str) -> Tuple[Dict[str, list], Dict[str, str]]:
    """Load qrels + qid->task_id map (reference :169-185)."""
    qrel: Dict[str, list] = {}
    qid_to_taskid: Dict[str, str] = {}
    with open(filename, "r") as f:
        for line in f:
            query_id, _, doc_id, relevance_score, task_id = line.strip().split()
            if int(relevance_score) > 0:
                qrel.setdefault(query_id, []).append(doc_id)
                qid_to_taskid.setdefault(query_id, task_id)
    print(f"Retriever: Loaded {len(qrel)} queries from {filename}")
    return qrel, qid_to_taskid


def write_run_file(run_file_path, retrieved_dist, retrieved_indices, hashed_query_ids, qid_to_taskid, run_id):
    """TREC-style run file (reference :427-444)."""
    os.makedirs(os.path.dirname(run_file_path) or ".", exist_ok=True)
    with open(run_file_path, "w") as run_file:
        for idx, (distances, indices) in enumerate(zip(retrieved_dist, retrieved_indices)):
            qid = unhash_qid(hashed_query_ids[idx])
            task_id = qid_to_taskid[qid]
            for rank, (hashed_doc_id, score) in enumerate(zip(indices, distances), start=1):
                doc_id = unhash_did(hashed_doc_id)
                run_file.write(f"{qid} Q0 {doc_id} {rank} {score} {run_id} {task_id}\n")


def load_run_file(run_file_path: str) -> Dict[str, list]:
    """qid -> ranked [did,...] (for the analyst; reference common/utils.py:33-61)."""
    run: Dict[str, list] = defaultdict(list)
    with open(run_file_path, "r") as f:
        for line in f:
            qid, _, did, rank, score, run_id, task_id = line.strip().split()
            run[qid].append((int(rank), did, float(score), task_id))
    return {qid: [did for _, did, _, _ in sorted(rows)] for qid, rows in run.items()}


def evaluate_recall(
    retrieved_indices: np.ndarray,
    hashed_query_ids: np.ndarray,
    qrel: Dict[str, list],
    qid_to_taskid: Dict[str, str],
    metric_recall_list: List[str],
) -> Dict[str, Dict[str, float]]:
    """Per-task mean Recall@k (reference :476-503)."""
    recall_values_by_task: Dict[str, Dict[str, list]] = defaultdict(lambda: defaultdict(list))
    for i, retrieved in enumerate(retrieved_indices):
        retrieved_dids = [unhash_did(x) for x in retrieved]
        qid = unhash_qid(hashed_query_ids[i])
        relevant_docs = qrel[qid]
        task_id = qid_to_taskid[qid]
        for metric in metric_recall_list:
            k = int(metric.split("@")[1])
            recall_values_by_task[task_id][metric].append(compute_recall_at_k(relevant_docs, retrieved_dids, k))
    out: Dict[str, Dict[str, float]] = {}
    for task_id, recalls in recall_values_by_task.items():
        out[task_id] = {m: round(sum(v) / len(v), 4) for m, v in recalls.items()}
    return out


def sort_eval_results(eval_results: List[dict]) -> List[dict]:
    return sorted(
        eval_results,
        key=lambda x: (
            x["TaskID"],
            DATASET_ORDER.get(x["Dataset"].lower(), 99),
            SPLIT_ORDER.get(x["Split"].lower(), 99),
            CAND_POOL_ORDER.get(x["CandPool"].lower(), 0),
        ),
    )


def write_tsv_report(eval_results: List[dict], tsv_file_path: str) -> None:
    """Grouped TSV with single-pool vs UNION columns (reference :537-603)."""
    eval_results_sorted = sort_eval_results(eval_results)
    grouped: Dict[tuple, Dict[str, dict]] = defaultdict(lambda: defaultdict(dict))
    for result in eval_results_sorted:
        key = (result["TaskID"], result["Task"], result["Dataset"], result["Split"])
        for metric in AVAILABLE_RECALL_METRICS:
            grouped[key][result["CandPool"]].update({metric: result.get(metric, None)})

    rows = [["TaskID", "Task", "Dataset", "Split", "Metric", "CandPool", "Value", "UnionPool", "UnionValue"]]
    for (task_id, task, dataset, split), cand_pools in grouped.items():
        union_results = cand_pools.get("union", {})
        for metric in AVAILABLE_RECALL_METRICS:
            for cand_pool, metrics in cand_pools.items():
                if cand_pool == "union":
                    continue
                value = metrics.get(metric, None)
                if value is None:
                    continue
                row = [task_id, task, dataset, split, metric, cand_pool, value]
                if union_results:
                    row.extend(["union", union_results.get(metric, "N/A")])
                else:
                    row.extend(["", ""])
                rows.append(row)

    os.makedirs(os.path.dirname(tsv_file_path) or ".", exist_ok=True)
    with open(tsv_file_path, "w", newline="") as tsvfile:
        writer = csv.writer(tsvfile, delimiter="\t")
        for row in rows:
            writer.writerow(row)
    print(f"Retriever: Results saved to {tsv_file_path}")


def get_raw_retrieved_candidates(
    queries_path: str,
    candidates_path: str,
    retrieved_indices,
    hashed_query_ids,
    complement_retriever=None,
) -> dict:
    """Raw {query, candidates} dump for UniRAG (reference :235-309).

    With a complement retriever, each single-modality candidate is re-queried
    against the pool to fetch its image/text complement so results form
    (image, text) pairs (reference :264-308; README:147-151).
    """
    import json as _json

    qid_to_queries = {}
    with open(queries_path, "r") as f:
        for l in f:
            q = _json.loads(l.strip())
            assert q["qid"] not in qid_to_queries, "qids must be unique"
            qid_to_queries[q["qid"]] = q

    did_to_candidates = {}
    with open(candidates_path, "r") as f:
        for l in f:
            c = _json.loads(l.strip())
            assert c["did"] not in did_to_candidates, "dids must be unique"
            did_to_candidates[c["did"]] = c

    complement_modalities = {"text": "image", "image": "text"}
    retrieved_dict = {}
    complement_queries_list = []
    for idx, indices in enumerate(retrieved_indices):
        qid = unhash_qid(hashed_query_ids[idx])
        query = qid_to_queries[qid]
        retrieved_cands = [did_to_candidates[unhash_did(h)] for h in indices]
        retrieved_dict[qid] = {"query": query, "candidates": retrieved_cands}
        if complement_retriever:
            complement_queries = [
                (c.get("modality"), c.get("txt"), c.get("img_path"), complement_modalities[c.get("modality")])
                for c in retrieved_cands
                if c["modality"] in complement_modalities
            ]
            complement_queries_list.append((qid, complement_queries))
            complement_retriever.add_queries(complement_queries)

    if complement_retriever:
        retrieved_complements = complement_retriever.retrieve(k=10)
        start = 0
        for qid, complement_queries in complement_queries_list:
            complement_candidates = []
            end = start + len(complement_queries)
            comp_cands = retrieved_complements[start:end]
            start = end
            for i, cq in enumerate(complement_queries):
                complement_cand = None
                q_modality = cq[0]
                for cand in comp_cands[i]:
                    if cand["modality"] == complement_modalities[q_modality]:
                        # must not be the original query itself (reference :295-302)
                        if cand.get("img_path") and cand.get("img_path") != retrieved_dict[qid]["query"].get("query_img_path"):
                            complement_cand = cand
                            break
                        if cand.get("txt") and cand.get("txt") != retrieved_dict[qid]["query"].get("query_txt"):
                            complement_cand = cand
                            break
                complement_candidates.append(complement_cand)
            retrieved_dict[qid]["complement_candidates"] = complement_candidates
    return retrieved_dict


def run_retrieval(config, mesh=None, query_embedder_config=None, bundle=None) -> List[dict]:
    """Full retrieval sweep driven by retrieval.yaml (reference run_retrieval :312-603).

    Pod-safe: every process runs the (possibly mesh-sharded) searches, but
    only process 0 writes run files / retrieved jsonl / TSV (the reference's
    rank-0 discipline), with a barrier before returning so non-main
    processes cannot race ahead of the artifacts."""
    from uniir_tpu.core.mesh import barrier, is_main_process

    main_proc = is_main_process()
    uniir_dir = config.uniir_dir
    mbeir_data_dir = config.mbeir_data_dir
    retrieval_config = config.retrieval_config
    qrel_dir_name = retrieval_config.qrel_dir_name
    embed_dir_name = retrieval_config.embed_dir_name
    index_dir_name = retrieval_config.index_dir_name
    expt_dir_name = config.experiment.path_suffix

    results_dir_name = retrieval_config.results_dir_name
    exp_results_dir = os.path.join(uniir_dir, results_dir_name, expt_dir_name)
    exp_run_file_dir = os.path.join(exp_results_dir, "run_files")
    exp_tsv_results_dir = os.path.join(exp_results_dir, "final_tsv")
    exp_retrieved_cands_dir = os.path.join(exp_results_dir, "retrieved_candidates")
    if main_proc:
        os.makedirs(exp_run_file_dir, exist_ok=True)
        os.makedirs(exp_tsv_results_dir, exist_ok=True)
        os.makedirs(exp_retrieved_cands_dir, exist_ok=True)

    splits = []
    for split_name in ("train", "val", "test"):
        ds_cfg = getattr(retrieval_config, f"{split_name}_datasets_config", None)
        if ds_cfg and ds_cfg.enable_retrieve:
            dataset_embed_dir = os.path.join(uniir_dir, embed_dir_name, expt_dir_name, split_name)
            splits.append(
                (
                    split_name,
                    dataset_embed_dir,
                    ds_cfg.datasets_name,
                    ds_cfg.correspond_cand_pools_name,
                    ds_cfg.correspond_qrels_name,
                    ds_cfg.correspond_metrics_name,
                )
            )
            assert len(ds_cfg.datasets_name) == len(ds_cfg.correspond_cand_pools_name) == len(ds_cfg.correspond_qrels_name) == len(ds_cfg.correspond_metrics_name), "Mismatch between datasets and candidate pools and qrels."

    eval_results = []
    cand_index_dir = os.path.join(uniir_dir, index_dir_name, expt_dir_name, "cand_pool")
    qrel_dir = os.path.join(mbeir_data_dir, qrel_dir_name)
    for split, dataset_embed_dir, dataset_names, cand_pool_names, qrel_names, metric_names_list in splits:
        for dataset_name, cand_pool_name, qrel_name, metric_names in zip(dataset_names, cand_pool_names, qrel_names, metric_names_list):
            dataset_name = dataset_name.lower()
            cand_pool_name = cand_pool_name.lower()
            qrel_name = qrel_name.lower()

            qrel_path = os.path.join(qrel_dir, split, f"mbeir_{qrel_name}_{split}_qrels.txt")
            qrel, qid_to_taskid = load_qrel(qrel_path)

            hashed_query_ids = np.load(os.path.join(dataset_embed_dir, f"mbeir_{dataset_name}_{split}_ids.npy"))
            query_embeds = np.load(os.path.join(dataset_embed_dir, f"mbeir_{dataset_name}_{split}_embed.npy"))

            index = DenseIndex.load(os.path.join(cand_index_dir, f"mbeir_{cand_pool_name}_cand_pool.index"))

            metric_list = [m.strip() for m in metric_names.split(",")]
            metric_recall_list = [m for m in metric_list if "recall" in m.lower()]
            k = max(int(m.split("@")[1]) for m in metric_recall_list)

            print(f"Retriever: query:{dataset_name} | split:{split} | pool:{cand_pool_name} | k={k}")
            # retrieval_config.pool_dtype: "int8" opts the single-device
            # Pallas sweep into the guarded int8 pool (results stay exact --
            # see search_dense_index); default bf16
            search_stats = {}
            retrieved_dist, retrieved_indices = search_dense_index(
                query_embeds, index, num_cand_to_retrieve=k, mesh=mesh,
                pool_dtype=getattr(retrieval_config, "pool_dtype", None),
                stats=search_stats,
            )
            if search_stats.get("pool_dtype") == "int8":
                print(
                    f"Retriever: int8 pool sweep, guard_pass_rate="
                    f"{search_stats['guard_pass_rate']:.4f}, exact_reruns={search_stats['exact_reruns']}"
                )

            pool_kind = "union_pool" if cand_pool_name == "union" else "single_pool"
            run_id = f"mbeir_{dataset_name}_{pool_kind}_{split}_k{k}"
            run_file_path = os.path.join(exp_run_file_dir, f"{run_id}_run.txt")
            if main_proc:
                write_run_file(run_file_path, retrieved_dist, retrieved_indices, hashed_query_ids, qid_to_taskid, run_id)
                print(f"Retriever: Run file saved to {run_file_path}")

            # Raw retrieved candidates for UniRAG (reference :446-473)
            if getattr(retrieval_config, "raw_retrieval", False):
                import json as _json

                queries_path = os.path.join(
                    mbeir_data_dir, retrieval_config.query_dir_name, split, f"mbeir_{dataset_name}_{split}.jsonl"
                )
                candidates_path = os.path.join(
                    mbeir_data_dir, retrieval_config.candidate_dir_name, f"mbeir_{cand_pool_name}_{split}_cand_pool.jsonl"
                )
                if not os.path.exists(candidates_path):
                    candidates_path = os.path.join(
                        mbeir_data_dir, retrieval_config.candidate_dir_name, f"mbeir_{cand_pool_name}_cand_pool.jsonl"
                    )
                complement_retriever = None
                if getattr(retrieval_config, "retrieve_image_text_pairs", False):
                    from uniir_tpu.retrieval.interactive import InteractiveRetriever

                    cand_index_path = os.path.join(cand_index_dir, f"mbeir_{cand_pool_name}_cand_pool.index")
                    # MSCOCO supports both i->t and t->i queries (reference :458)
                    complement_retriever = InteractiveRetriever(
                        cand_index_path, candidates_path, "MSCOCO", query_embedder_config, bundle=bundle, mesh=mesh
                    )
                retrieved_dict = get_raw_retrieved_candidates(
                    queries_path, candidates_path, retrieved_indices, hashed_query_ids, complement_retriever
                )
                retrieved_file_path = os.path.join(exp_retrieved_cands_dir, f"{run_id}_retrieved.jsonl")
                if main_proc:
                    with open(retrieved_file_path, "w") as rf:
                        for _, v in retrieved_dict.items():
                            _json.dump(v, rf)
                            rf.write("\n")
                    print(f"Retriever: Retrieved file saved to {retrieved_file_path}")

            per_task = evaluate_recall(retrieved_indices, hashed_query_ids, qrel, qid_to_taskid, metric_recall_list)
            for task_id, metrics in per_task.items():
                result = {
                    "TaskID": int(task_id),
                    "Task": get_mbeir_task_name(int(task_id)),
                    "Dataset": dataset_name,
                    "Split": split,
                    "CandPool": cand_pool_name,
                }
                result.update(metrics)
                eval_results.append(result)

    if retrieval_config.write_to_tsv and main_proc:
        date_time = datetime.now().strftime("%m-%d-%H")
        tsv_file_path = os.path.join(exp_tsv_results_dir, f"eval_results_{date_time}.tsv")
        write_tsv_report(eval_results, tsv_file_path)

    barrier("run_retrieval_done")
    return eval_results
