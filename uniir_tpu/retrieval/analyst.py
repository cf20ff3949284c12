"""Automatic error analysis (reference src/common/mbeir_analyst.py:29-305).

Classifies rank-1 false positives per task:
  Type1 -- retrieved candidate has the wrong modality
  Type2 -- right modality, wrong domain (dataset domain map)
  Type3 -- right modality and domain: a same-kind miss
Emits the same grouped TSV shape as the retrieval report.
"""

from __future__ import annotations

import os
from collections import defaultdict
from datetime import datetime
from typing import Dict, List

from uniir_tpu.data.dataset import load_jsonl
from uniir_tpu.data.registry import (
    MBEIR_DATASET_TO_DOMAIN,
    get_dataset_name,
    get_mbeir_query_modality_cand_modality_from_task_id,
    get_mbeir_task_name,
)
from uniir_tpu.retrieval.eval import load_qrel, sort_eval_results

ERROR_TYPES = ["Type1", "Type2", "Type3"]


def load_runfile_with_ranks(run_file_path: str) -> Dict[str, List[dict]]:
    run: Dict[str, List[dict]] = defaultdict(list)
    with open(run_file_path, "r") as f:
        for line in f:
            qid, _, did, rank, score, run_id, task_id = line.strip().split()
            run[qid].append({"rank": int(rank), "did": did, "score": float(score), "task_id": task_id})
    return run


def load_pool_as_dict(path: str) -> dict:
    return {e["did"]: e for e in load_jsonl(path)}


def analyze_run(query_data: list, run_results: Dict[str, List[dict]], cand_pool_dict: dict, qid_to_taskid: dict):
    """Classify rank-1 false positives (reference :150-211).

    Returns (per-task error rates, total_false_positives).
    """
    error_values_by_task: Dict[str, Dict[str, list]] = defaultdict(lambda: defaultdict(list))
    total_fp = 0
    for query_entry in query_data:
        qid = query_entry["qid"]
        task_id = qid_to_taskid[qid]
        query_modality, gt_candidate_modality = get_mbeir_query_modality_cand_modality_from_task_id(int(task_id))
        assert query_modality == query_entry["query_modality"], "Mismatch between query modality and task id."
        errors = {t: 0 for t in ERROR_TYPES}
        num_fp = 0
        for rr in run_results[qid]:
            if rr["rank"] == 1:
                did = rr["did"]
                cand = cand_pool_dict[did]
                if did not in query_entry["pos_cand_list"]:
                    num_fp += 1
                    if gt_candidate_modality != cand["modality"]:
                        errors["Type1"] += 1
                    elif MBEIR_DATASET_TO_DOMAIN[get_dataset_name(qid)] != MBEIR_DATASET_TO_DOMAIN[get_dataset_name(did)]:
                        errors["Type2"] += 1
                    else:
                        errors["Type3"] += 1
                break  # only the top-ranked result
        total_fp += num_fp
        for t in ERROR_TYPES:
            error_values_by_task[task_id][t].append(errors[t])
    per_task = {}
    for task_id, errs in error_values_by_task.items():
        per_task[task_id] = {t: round(sum(v) / max(1, total_fp), 4) for t, v in errs.items()}
    return per_task, total_fp


def run_automatic_error_analysis(config) -> List[dict]:
    uniir_dir = config.uniir_dir
    mbeir_data_dir = config.mbeir_data_dir
    expt_dir_name = config.experiment.path_suffix
    analysis_config = config.analysis_config
    qrel_dir_name = analysis_config.qrel_dir_name
    results_dir_name = analysis_config.results_dir_name
    exp_results_dir = os.path.join(uniir_dir, results_dir_name, expt_dir_name)
    exp_run_file_dir = os.path.join(exp_results_dir, "run_files")
    exp_error_tsv_dir = os.path.join(exp_results_dir, "error_tsv")
    os.makedirs(exp_error_tsv_dir, exist_ok=True)

    splits = []
    for split_name in ("train", "val", "test"):
        ds_cfg = getattr(analysis_config, f"{split_name}_datasets_config", None)
        if ds_cfg and ds_cfg.enable_retrieve:
            splits.append(
                (
                    split_name,
                    ds_cfg.datasets_name,
                    ds_cfg.correspond_cand_pools_name,
                    ds_cfg.correspond_qrels_name,
                    ds_cfg.correspond_metrics_name,
                )
            )

    eval_results = []
    union_pool_cache = None
    qrel_dir = os.path.join(mbeir_data_dir, qrel_dir_name)
    for split, dataset_names, cand_pool_names, qrel_names, metric_names_list in splits:
        for dataset_name, cand_pool_name, qrel_name, metric_names in zip(
            dataset_names, cand_pool_names, qrel_names, metric_names_list
        ):
            dataset_name = dataset_name.lower()
            cand_pool_name = cand_pool_name.lower()
            qrel_name = qrel_name.lower()

            qrel_path = os.path.join(qrel_dir, split, f"mbeir_{qrel_name}_{split}_qrels.txt")
            if not os.path.exists(qrel_path):  # reference uses flat qrel dir here (:100)
                qrel_path = os.path.join(qrel_dir, f"mbeir_{qrel_name}_{split}_qrels.txt")
            qrel, qid_to_taskid = load_qrel(qrel_path)

            metric_recall_list = [m.strip() for m in metric_names.split(",") if "recall" in m.lower()]
            k = max(int(m.split("@")[1]) for m in metric_recall_list)
            pool_kind = "union_pool" if cand_pool_name == "union" else "single_pool"
            run_id = f"mbeir_{dataset_name}_{pool_kind}_{split}_k{k}"
            run_results = load_runfile_with_ranks(os.path.join(exp_run_file_dir, f"{run_id}_run.txt"))

            query_data = load_jsonl(os.path.join(mbeir_data_dir, split, f"mbeir_{dataset_name}_{split}.jsonl"))

            if cand_pool_name == "union":
                if union_pool_cache is None:
                    union_pool_cache = load_pool_as_dict(
                        os.path.join(mbeir_data_dir, "cand_pool", "union_pool", "mbeir_union_test_cand_pool.jsonl")
                    )
                cand_pool_dict = union_pool_cache
            else:
                cand_pool_dict = load_pool_as_dict(
                    os.path.join(mbeir_data_dir, "cand_pool", f"mbeir_{cand_pool_name}_cand_pool.jsonl")
                )

            per_task, total_fp = analyze_run(query_data, run_results, cand_pool_dict, qid_to_taskid)
            print(f"Error Analyst: Total number of false positives: {total_fp}")
            for task_id, errors in per_task.items():
                result = {
                    "TaskID": int(task_id),
                    "Task": get_mbeir_task_name(int(task_id)),
                    "Dataset": dataset_name,
                    "Split": split,
                    "CandPool": cand_pool_name,
                }
                result.update(errors)
                eval_results.append(result)

    if analysis_config.write_to_tsv:
        import csv

        eval_results_sorted = sort_eval_results(eval_results)
        grouped: Dict[tuple, Dict[str, dict]] = defaultdict(lambda: defaultdict(dict))
        for result in eval_results_sorted:
            key = (result["TaskID"], result["Task"], result["Dataset"], result["Split"])
            for metric in ERROR_TYPES:
                grouped[key][result["CandPool"]].update({metric: result.get(metric, None)})

        rows = [["TaskID", "Task", "Dataset", "Split", "Metric", "CandPool", "Value", "UnionPool", "UnionValue"]]
        for (task_id, task, dataset, split), cand_pools in grouped.items():
            union_results = cand_pools.get("union", {})
            for metric in ERROR_TYPES:
                for cand_pool, metrics in cand_pools.items():
                    if cand_pool == "union":
                        continue
                    value = metrics.get(metric, None)
                    if value is None:
                        continue
                    row = [task_id, task, dataset, split, metric, cand_pool, value]
                    row.extend(["union", union_results.get(metric, "N/A")] if union_results else ["", ""])
                    rows.append(row)

        date_time = datetime.now().strftime("%m-%d-%H")
        tsv_path = os.path.join(exp_error_tsv_dir, f"error_analysis_results_{date_time}.tsv")
        with open(tsv_path, "w", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            for row in rows:
                w.writerow(row)
        print(f"Error Analyst: Results saved to {tsv_path}")

    return eval_results
