"""Recall-parity dress rehearsal: checkpoint + M-BEIR slice -> reference TSV.

One command wires the whole eval path so that the moment published UniIR
weights and real M-BEIR data are available, the Recall@5 parity number
(BASELINE.md north star) is a single invocation away:

    python scripts/parity_smoke.py \
        --mbeir_data_dir /data/mbeir --uniir_dir /tmp/out \
        --dataset mscoco_task0 --split test \
        --model CLIPScoreFusion --size "ViT-L/14" \
        --ckpt /path/clip_sf_large.pth \
        --clip_bpe /path/bpe_simple_vocab_16e6.txt.gz

Without --ckpt/--clip_bpe it runs the tiny fixture model over a synthetic
M-BEIR tree (--fixture) to prove the path end-to-end TODAY:

    python scripts/parity_smoke.py --fixture

Outputs the reference-format artifacts (run files `qid Q0 did rank score
run_id task_id`, grouped TSV; reference mbeir_retriever.py:427-444,553-603)
and prints the TSV.  See PARITY.md for every known behavioral divergence to
consult when attributing a gap.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_config(args, embed_dim: int, image_size: int):
    """The embed/index/retrieval config archetype (reference
    eval/inbatch/{embed,index,retrieval}.yaml), for ONE dataset slice."""
    from uniir_tpu.core.config import Config

    ds, split = args.dataset, args.split
    metrics = "Recall@1, Recall@5, Recall@10"
    off = {"enable_embed": False}
    split_cfg = {
        "enable_embed": True,
        "datasets_name": [ds],
        "correspond_cand_pools_name": [ds],
    }
    retrieve_cfg = {
        "enable_retrieve": True,
        "datasets_name": [ds],
        "correspond_cand_pools_name": [ds],
        "correspond_qrels_name": [ds],
        "correspond_metrics_name": [metrics],
    }
    return Config.from_dict(
        {
            "uniir_dir": args.uniir_dir,
            "mbeir_data_dir": args.mbeir_data_dir,
            "seed": 0,
            "experiment": {"path_suffix": "ParitySmoke/" + args.model},
            "model": {
                "name": args.model,
                "short_name": args.model,
                "clip_vision_model_name": args.size,
                "vit": "large" if ("L/" in args.size or args.size == "large") else "base",
                "bf16": True,
                "pretrained_torch_ckpt": args.ckpt or None,
                "strict_convert": bool(args.ckpt),
                "clip_bpe_path": args.clip_bpe or None,
                "bert_vocab_path": args.bert_vocab or None,
            },
            "data_config": {
                "image_size": f"{image_size}, {image_size}",
                "enable_query_instruct": bool(args.instruct),
                "shuffle_cand": False,
                "train_dir_name": "query/train",
                "val_dir_name": "query/val",
                "test_dir_name": "query/test",
                "cand_pool_dir_name": "cand_pool/local",
                "query_instruct_path": "instructions/query_instructions.tsv",
            },
            "dataloader_config": {"num_workers": 4, "batch_size": int(args.batch_size)},
            "embed_config": {
                "embed_dir_name": "embed",
                "use_fp16": True,
                "train_datasets_config": dict(split_cfg if split == "train" else off),
                "val_datasets_config": dict(split_cfg if split == "val" else off),
                "test_datasets_config": dict(split_cfg if split == "test" else off),
                "cand_pools_config": {
                    "enable_embed": True,
                    "embed_union_pool": False,
                    "cand_pools_name_to_embed": [ds],
                },
            },
            "index_config": {
                "embed_dir_name": "embed",
                "index_dir_name": "index",
                "cand_pools_config": {"enable_idx": True, "cand_pools_name_to_idx": [ds]},
                "faiss_config": {"dim": embed_dim, "idx_type": "Flat", "metric": "METRIC_INNER_PRODUCT"},
            },
            "retrieval_config": {
                "qrel_dir_name": "qrels",
                "embed_dir_name": "embed",
                "index_dir_name": "index",
                "query_dir_name": "query",
                "candidate_dir_name": "cand_pool/local",
                "results_dir_name": "retrieval_results",
                "hard_negs_dir_name": "hard_negs",
                "num_hard_negs": 0,
                "k": 10,
                "raw_retrieval": False,
                "retrieve_image_text_pairs": False,
                "write_to_tsv": True,
                "train_datasets_config": {"enable_retrieve": split == "train", **(retrieve_cfg if split == "train" else {})},
                "val_datasets_config": {"enable_retrieve": split == "val", **(retrieve_cfg if split == "val" else {})},
                "test_datasets_config": {"enable_retrieve": split == "test", **(retrieve_cfg if split == "test" else {})},
            },
        }
    )


def build_sweep_config(args, embed_dim: int, image_size: int):
    """The FULL reference retrieval.yaml sweep: all 16 dataset runs against
    their local pools AND the union pool -- 32 retrieval rows, union + 16
    single-pool indexes (reference large/eval/inbatch/retrieval.yaml:147-181).
    """
    from uniir_tpu.core.config import Config

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from tests.helpers import SWEEP_RUNS, sweep_pool_name

    runs = [r for r, _, _ in SWEEP_RUNS]
    pools = [sweep_pool_name(r) for r in runs]
    heavy = {"fashion200k_task0", "fashion200k_task3", "fashioniq_task7"}
    metrics = ["Recall@10, Recall@20, Recall@50" if r in heavy else "Recall@1, Recall@5, Recall@10" for r in runs]
    base = build_config(args, embed_dim, image_size)
    d = base.to_dict(resolve=False)
    d["embed_config"]["test_datasets_config"] = {
        "enable_embed": True,
        "datasets_name": list(runs),
        "correspond_cand_pools_name": list(pools),
    }
    d["embed_config"]["cand_pools_config"] = {
        "enable_embed": True,
        "embed_union_pool": True,
        "cand_pools_name_to_embed": list(pools),
    }
    d["index_config"]["cand_pools_config"] = {
        "enable_idx": True,
        "cand_pools_name_to_idx": list(pools) + ["UNION"],
    }
    d["retrieval_config"]["test_datasets_config"] = {
        "enable_retrieve": True,
        "datasets_name": runs + runs,
        "correspond_cand_pools_name": pools + ["UNION"] * len(runs),
        "correspond_qrels_name": runs + runs,
        "correspond_metrics_name": metrics + metrics,
    }
    return Config.from_dict(d)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--fixture", action="store_true", help="run on a generated synthetic M-BEIR tree + tiny model")
    ap.add_argument(
        "--sweep",
        action="store_true",
        help="drive the FULL 16-dataset union-pool retrieval.yaml sweep (32 runs) instead of one slice",
    )
    ap.add_argument("--mbeir_data_dir", default=None)
    ap.add_argument("--uniir_dir", default=None)
    ap.add_argument("--dataset", default="mscoco_task0")
    ap.add_argument("--split", default="test")
    ap.add_argument("--model", default="CLIPScoreFusion")
    ap.add_argument("--size", default="ViT-L/14")
    ap.add_argument("--ckpt", default="", help=".pth/.pt checkpoint (strict-converted)")
    ap.add_argument("--clip_bpe", default="", help="bpe_simple_vocab_16e6.txt.gz path")
    ap.add_argument("--bert_vocab", default="", help="bert-base-uncased vocab.txt path")
    ap.add_argument("--instruct", action="store_true")
    ap.add_argument("--batch_size", default=64)
    args = ap.parse_args()

    if args.fixture:
        import tempfile

        if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        root = tempfile.mkdtemp(prefix="parity_smoke_")
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tests.helpers import build_pipeline_tree, build_union_sweep_tree, tiny_clip_bundle

        if args.sweep:
            build_union_sweep_tree(root)
        else:
            build_pipeline_tree(root)
        args.mbeir_data_dir = os.path.join(root, "mbeir_data")
        args.uniir_dir = root
        bundle = tiny_clip_bundle()
        maker = build_sweep_config if args.sweep else build_config
        config = maker(args, embed_dim=bundle.embed_dim, image_size=bundle.image_size[0])
        config.model.name = "CLIPScoreFusion"
    else:
        assert args.mbeir_data_dir and args.uniir_dir, "--mbeir_data_dir/--uniir_dir required without --fixture"
        from uniir_tpu.models.registry import build_model_from_config

        # two-phase: build the model first (it defines embed_dim/image_size),
        # then the full pipeline config
        maker = build_sweep_config if args.sweep else build_config
        config = maker(args, embed_dim=0, image_size=224)
        bundle = build_model_from_config(config)
        config = maker(args, embed_dim=bundle.embed_dim, image_size=bundle.image_size[0])

    from uniir_tpu.retrieval.embedder import generate_embeds_for_config
    from uniir_tpu.retrieval.index import create_index
    from uniir_tpu.retrieval.eval import run_retrieval

    print(f"== embed: {args.dataset}/{args.split}")
    generate_embeds_for_config(bundle, config)
    print("== index")
    create_index(config)
    print("== retrieve + recall")
    run_retrieval(config)

    tsv_dir = os.path.join(config.uniir_dir, "retrieval_results", config.experiment.path_suffix, "final_tsv")
    for name in sorted(os.listdir(tsv_dir)) if os.path.isdir(tsv_dir) else []:
        path = os.path.join(tsv_dir, name)
        print(f"\n== {path}")
        with open(path) as f:
            print(f.read())
    return 0


if __name__ == "__main__":
    sys.exit(main())
