"""Generate the config/run-script tree for all 4 models x 2 sizes.

Mirrors the reference configs_scripts surface (inbatch.yaml / embed.yaml /
index.yaml / retrieval.yaml + run scripts) with TPU-native settings: no
torchrun/CUDA knobs, one environment for the whole pipeline, batch sizes
stated as GLOBAL batch over the mesh.  Run `python configs/generate_configs.py` to regenerate.
"""

from __future__ import annotations

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

TEST_DATASETS = [
    "visualnews_task0", "mscoco_task0", "fashion200k_task0", "webqa_task1",
    "edis_task2", "webqa_task2", "visualnews_task3", "mscoco_task3",
    "fashion200k_task3", "nights_task4", "oven_task6", "infoseek_task6",
    "fashioniq_task7", "cirr_task7", "oven_task8", "infoseek_task8",
]
# MSCOCO has split-specific pools (reference embed.yaml comments)
TEST_POOLS = [n if "mscoco" not in n else f"{n}_test" for n in TEST_DATASETS]
METRICS_BY_DATASET = {
    "fashion200k_task0": "Recall@10, Recall@20, Recall@50",
    "fashion200k_task3": "Recall@10, Recall@20, Recall@50",
    "fashioniq_task7": "Recall@10, Recall@20, Recall@50",
}
DEFAULT_METRICS = "Recall@1, Recall@5, Recall@10"

# train_batch is the GLOBAL batch over the whole mesh (the trainer runs one
# process driving all chips; the reference's per-GPU sizes x 8 GPUs are the
# equivalents: CLIP-SF L 105x8=840, BLIP 115x8=920).
MODELS = {
    "clip_sf": {
        "name": "CLIPScoreFusion", "short_name": "CLIP_SF", "family": "clip",
        "sizes": {"base": {"clip_vision_model_name": "ViT-B/32", "dim": 512, "train_batch": 4096},
                  "large": {"clip_vision_model_name": "ViT-L/14", "dim": 768, "train_batch": 840}},
    },
    "clip_ff": {
        "name": "CLIPFeatureFusion", "short_name": "CLIP_FF", "family": "clip",
        "sizes": {"base": {"clip_vision_model_name": "ViT-B/32", "dim": 512, "train_batch": 2048},
                  "large": {"clip_vision_model_name": "ViT-L/14", "dim": 768, "train_batch": 512}},
        "t5_learning_rate": 1e-4,
    },
    "blip_sf": {
        "name": "BLIPScoreFusion", "short_name": "BLIP_SF", "family": "blip",
        "sizes": {"base": {"vit": "base", "dim": 768, "train_batch": 2048, "queue_size": 57344},
                  "large": {"vit": "large", "dim": 768, "train_batch": 920, "queue_size": 57960}},
    },
    "blip_ff": {
        "name": "BLIPFeatureFusion", "short_name": "BLIP_FF", "family": "blip",
        "sizes": {"base": {"vit": "base", "dim": 768, "train_batch": 2048, "queue_size": 57344},
                  "large": {"vit": "large", "dim": 768, "train_batch": 920, "queue_size": 57960,
                            "vit_grad_ckpt": True, "vit_ckpt_layer": 12}},
    },
}


def experiment_block():
    return {
        "instruct_status": "Instruct",
        "exp_name": "InBatch",
        "description": "${model.name} ${model.size} ${experiment.instruct_status} ${experiment.exp_name}",
        "path_suffix": "${model.short_name}/${model.size}/${experiment.instruct_status}/${experiment.exp_name}/",
    }


def model_block(mkey: str, size: str, for_eval: bool):
    m = MODELS[mkey]
    s = m["sizes"][size]
    block = {
        "name": m["name"],
        "short_name": m["short_name"],
        "size": size.capitalize(),
        "bf16": True,
    }
    if m["family"] == "clip":
        block["clip_vision_model_name"] = s["clip_vision_model_name"]
        block["clip_bpe_path"] = None  # set to a bpe_simple_vocab_16e6.txt.gz path
        block["pretrained_clip_model_dir"] = "checkpoint/CLIP/"
        block["gather_embeddings"] = True
    else:
        block.update(
            {
                "vit": s["vit"],
                "embed_dim": s["dim"],
                "queue_size": s["queue_size"],
                "momentum": 0.995,
                "alpha": 0.4,
                "tokenizer_max_length": 100 if mkey == "blip_ff" else 50,
                "bert_vocab_path": None,  # set to a bert-base-uncased vocab.txt path
                "pretrained_blip_url": "",
                "vit_grad_ckpt": s.get("vit_grad_ckpt", False),
                "vit_ckpt_layer": s.get("vit_ckpt_layer", 0),
            }
        )
    ckpt = {"ckpt_dir": "checkpoint/${experiment.path_suffix}"}
    if for_eval:
        ckpt["ckpt_name"] = f"{m['short_name'].lower()}_{size}"
    else:
        ckpt.update({"resume_training": False, "ckpt_name": ""})
    block["ckpt_config"] = ckpt
    return block


def train_yaml(mkey: str, size: str):
    m = MODELS[mkey]
    s = m["sizes"][size]
    cfg = {
        "experiment": experiment_block(),
        "wandb_config": {"enabled": False, "experiment_name": "${experiment.description}"},
        "logger_config": {
            "logger_out_dir": "logger/${experiment.path_suffix}",
            "logger_out_file_name": "train.log",
        },
        "data_config": {
            "image_size": "224, 224",
            "hard_neg_num": 0,
            "in_batch_neg_num": 0,
            "shuffle_cand": True,
            "returns": None,
            "enable_query_instruct": True,
            "query_instruct_path": "instructions/query_instructions.tsv",
            "train_query_data_path": "query/union_train/mbeir_union_up_train.jsonl",
            "train_cand_pool_path": "cand_pool/global/mbeir_union_train_cand_pool.jsonl",
            "val_query_data_path": "query/union_val/mbeir_union_val.jsonl",
            "val_cand_pool_path": "cand_pool/global/mbeir_union_val_cand_pool.jsonl",
        },
        "dataloader_config": {"num_workers": 16, "train_batch_size": s["train_batch"], "valid_batch_size": 1024},
        "trainer_config": {
            "gradient_accumulation_steps": 1,
            "num_train_epochs": 20,
            "learning_rate": 1e-5,
            "warmup_steps": 0,
            "eval_steps": 500,
            "print_freq": 50,
            **({"weight_decay": 0.05} if m["family"] == "blip" else {}),
            **({"t5_learning_rate": MODELS[mkey].get("t5_learning_rate")} if mkey == "clip_ff" else {}),
        },
        "evaluator": {"enable_eval": False, "eval_freq": 1, "print_freq": 10},
        "model": model_block(mkey, size, for_eval=False),
        "seed": 2023,
    }
    return cfg


def embed_yaml(mkey: str, size: str):
    return {
        "experiment": {**experiment_block(), "instruct_status": "ReplaceMeInScript"},
        "embed_config": {
            "embed_dir_name": "embed",
            "use_fp16": True,
            "train_datasets_config": {"enable_embed": False, "datasets_name": None, "correspond_cand_pools_name": None},
            "val_datasets_config": {"enable_embed": False, "datasets_name": None, "correspond_cand_pools_name": None},
            "test_datasets_config": {
                "enable_embed": True,
                "datasets_name": TEST_DATASETS,
                "correspond_cand_pools_name": TEST_POOLS,
            },
            "cand_pools_config": {
                "enable_embed": True,
                "embed_union_pool": True,
                "cand_pools_name_to_embed": TEST_POOLS,
            },
        },
        "dataloader_config": {"num_workers": 16, "batch_size": 1024},
        "model": model_block(mkey, size, for_eval=True),
        "data_config": {
            "image_size": "224, 224",
            "shuffle_cand": True,
            "train_dir_name": "query/train",
            "val_dir_name": "query/val",
            "test_dir_name": "query/test",
            "cand_pool_dir_name": "cand_pool/local",
            "query_instruct_path": "instructions/query_instructions.tsv",
            "enable_query_instruct": True,
        },
        "seed": 2023,
    }


def index_yaml(mkey: str, size: str):
    dim = MODELS[mkey]["sizes"][size]["dim"]
    return {
        "experiment": {**experiment_block(), "instruct_status": "ReplaceMeInScript"},
        "index_config": {
            "faiss_config": {"idx_type": "Flat", "dim": dim, "metric": "METRIC_INNER_PRODUCT"},
            "embed_dir_name": "embed",
            "index_dir_name": "index",
            "cand_pools_config": {"enable_idx": True, "cand_pools_name_to_idx": TEST_POOLS + ["UNION"]},
        },
        "model": {k: v for k, v in model_block(mkey, size, for_eval=True).items() if k in ("name", "short_name", "size")},
    }


def retrieval_yaml(mkey: str, size: str, unirag: bool = False):
    datasets = TEST_DATASETS + TEST_DATASETS  # single pool + union pool
    pools = TEST_POOLS + ["UNION"] * len(TEST_DATASETS)
    qrels = TEST_DATASETS + TEST_DATASETS
    metrics = [METRICS_BY_DATASET.get(d, DEFAULT_METRICS) for d in datasets]
    cfg = {
        "experiment": {**experiment_block(), "instruct_status": "ReplaceMeInScript"},
        "retrieval_config": {
            "embed_dir_name": "embed",
            "index_dir_name": "index",
            "results_dir_name": "retrieval_results",
            "qrel_dir_name": "qrels",
            "write_to_tsv": True,
            "raw_retrieval": bool(unirag),
            "retrieve_image_text_pairs": bool(unirag),
            "query_dir_name": "query",
            "candidate_dir_name": "cand_pool/local",
            "hard_negs_dir_name": "hard_negs",
            "num_hard_negs": 10,
            "k": 50,
            # int8-pool sweep is the serving default: ~25% faster end-to-end
            # than the bf16 sweep on v5e (15.08 vs 18.98 ms / 256 queries
            # over the 5.6M pool, docs/PERFORMANCE.md round 4 item 4) and
            # unconditionally exact -- every batch runs the certainty guard
            # and a guarded miss transparently re-runs on the bf16 path
            # (retrieval/search.py:34-43).  Only engages on-TPU,
            # single-device, pools > 1 DMA chunk; ignored elsewhere.
            "pool_dtype": "int8",
            "train_datasets_config": {"enable_retrieve": False, "datasets_name": None, "correspond_cand_pools_name": None, "correspond_qrels_name": None, "correspond_metrics_name": None},
            "val_datasets_config": {"enable_retrieve": False, "datasets_name": None, "correspond_cand_pools_name": None, "correspond_qrels_name": None, "correspond_metrics_name": None},
            "test_datasets_config": {
                "enable_retrieve": True,
                "datasets_name": datasets if not unirag else ["mscoco_task0"],
                "correspond_cand_pools_name": pools if not unirag else ["mscoco_task0_test"],
                "correspond_qrels_name": qrels if not unirag else ["mscoco_task0"],
                "correspond_metrics_name": metrics if not unirag else [DEFAULT_METRICS],
            },
        },
        "model": {k: v for k, v in model_block(mkey, size, for_eval=True).items() if k in ("name", "short_name", "size")},
    }
    return cfg


RUN_INBATCH = """#!/bin/bash
# Train {model_name} on M-BEIR (TPU-native). One process drives the whole mesh.
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${{UNIIR_DIR:-/data/UniIR}}"
MBEIR_DATA_DIR="${{MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"

python -m uniir_tpu.tools.config_updater \\
    --update_mbeir_yaml_instruct_status \\
    --mbeir_yaml_file_path "$CONFIG_DIR/inbatch.yaml" \\
    --enable_instruct "${{ENABLE_INSTRUCT:-True}}"

python -m uniir_tpu.train.trainer \\
    --config_path "$CONFIG_DIR/inbatch.yaml" \\
    --uniir_dir "$UNIIR_DIR" \\
    --mbeir_data_dir "$MBEIR_DATA_DIR"
"""

RUN_EVAL = """#!/bin/bash
# Full eval pipeline for {model_name}: embed -> index -> retrieve -> Recall@k.
# One environment, one process (the reference needed separate torch/faiss envs).
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${{UNIIR_DIR:-/data/UniIR}}"
MBEIR_DATA_DIR="${{MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"

for Y in embed.yaml index.yaml retrieval.yaml; do
  python -m uniir_tpu.tools.config_updater \\
      --update_mbeir_yaml_instruct_status \\
      --mbeir_yaml_file_path "$CONFIG_DIR/$Y" \\
      --enable_instruct "${{ENABLE_INSTRUCT:-True}}"
done

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/embed.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_embed

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/index.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_create_index

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/retrieval.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_retrieval
"""

RUN_UNIRAG = """#!/bin/bash
# UniRAG eval pipeline for {model_name}: embed -> index -> raw retrieval dump of
# {{query, candidates}} jsonl with complement (image,text) pairs for RAG
# consumers (reference large/eval/unirag/run_eval_pipeline_unirag.sh).
# Uses the local unirag embed/index archetypes (inbatch configs pinned to
# Instruct/UniRAG); instruct status is forced on, as in the reference.
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${{UNIIR_DIR:-/data/UniIR}}"
MBEIR_DATA_DIR="${{MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"

for Y in embed.yaml index.yaml retrieval.yaml; do
  python -m uniir_tpu.tools.config_updater \\
      --update_mbeir_yaml_instruct_status \\
      --mbeir_yaml_file_path "$CONFIG_DIR/$Y" \\
      --enable_instruct True
done

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/embed.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_embed

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/index.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_create_index

python -m uniir_tpu.tools.pipeline \\
    --config_path "$CONFIG_DIR/retrieval.yaml" \\
    --query_embedder_config_path "$CONFIG_DIR/embed.yaml" \\
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \\
    --enable_retrieval
"""


def dump(cfg: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=False)


def write_script(text: str, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    os.chmod(path, 0o755)


def main():
    for mkey, m in MODELS.items():
        for size in m["sizes"]:
            base = os.path.join(HERE, mkey, size)
            dump(train_yaml(mkey, size), os.path.join(base, "train/inbatch/inbatch.yaml"))
            write_script(RUN_INBATCH.format(model_name=m["name"]), os.path.join(base, "train/inbatch/run_inbatch.sh"))
            dump(embed_yaml(mkey, size), os.path.join(base, "eval/inbatch/embed.yaml"))
            dump(index_yaml(mkey, size), os.path.join(base, "eval/inbatch/index.yaml"))
            dump(retrieval_yaml(mkey, size), os.path.join(base, "eval/inbatch/retrieval.yaml"))
            write_script(RUN_EVAL.format(model_name=m["name"]), os.path.join(base, "eval/inbatch/run_eval_pipeline_inbatch.sh"))
            if size == "large" and mkey in ("clip_sf", "blip_ff"):
                dump(retrieval_yaml(mkey, size, unirag=True), os.path.join(base, "eval/unirag/retrieval.yaml"))
                write_script(RUN_UNIRAG.format(model_name=m["name"]), os.path.join(base, "eval/unirag/run_eval_pipeline_unirag.sh"))
    print("configs generated under", HERE)


if __name__ == "__main__":
    main()
