"""Minimal end-to-end uniir_tpu demo on synthetic data (CPU-runnable).

Builds a tiny M-BEIR tree, trains CLIP-SF for a few epochs on an 8-device
virtual mesh, then runs the full embed -> index -> retrieve -> Recall@k
pipeline. Mirrors what real runs do with the checked-in configs.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/minimal_pipeline.py
"""

import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from helpers import build_pipeline_tree, make_eval_config, tiny_clip_bundle  # noqa: E402

from uniir_tpu.core.config import Config  # noqa: E402
from uniir_tpu.core.mesh import make_mesh  # noqa: E402
from uniir_tpu.retrieval.embedder import generate_embeds_for_config  # noqa: E402
from uniir_tpu.retrieval.eval import run_retrieval  # noqa: E402
from uniir_tpu.retrieval.index import create_index  # noqa: E402
from uniir_tpu.train import trainer  # noqa: E402


def main():
    root = tempfile.mkdtemp(prefix="uniir_demo_")
    build_pipeline_tree(root)
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)}  root: {root}")

    bundle = tiny_clip_bundle()

    train_config = Config.from_dict(
        {
            "uniir_dir": root,
            "mbeir_data_dir": os.path.join(root, "mbeir_data"),
            "seed": 2023,
            "experiment": {"path_suffix": "CLIP_SF/Tiny/Instruct/InBatch/"},
            "data_config": {
                "image_size": "32, 32",
                "hard_neg_num": 0,
                "in_batch_neg_num": 0,
                "shuffle_cand": True,
                "returns": None,
                "enable_query_instruct": True,
                "query_instruct_path": "instructions/query_instructions.tsv",
                "train_query_data_path": "query/test/mbeir_mscoco_task0_test.jsonl",
                "train_cand_pool_path": "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl",
                "val_query_data_path": "query/test/mbeir_mscoco_task0_test.jsonl",
                "val_cand_pool_path": "cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl",
            },
            "dataloader_config": {"num_workers": 2, "train_batch_size": 8, "valid_batch_size": 8},
            "trainer_config": {
                "gradient_accumulation_steps": 1,
                "num_train_epochs": 4,
                "learning_rate": 3e-3,
                "warmup_steps": 0,
                "print_freq": 1,
            },
            "evaluator": {"enable_eval": False, "eval_freq": 1, "print_freq": 1},
            "model": {
                "name": "CLIPScoreFusion",
                "short_name": "CLIP_SF",
                "size": "Tiny",
                "ckpt_config": {"ckpt_dir": "checkpoint/demo/", "resume_training": False, "ckpt_name": ""},
            },
        }
    )
    out = trainer.main(train_config, mesh=mesh, bundle=bundle)
    print("final train stats:", out["stats"])
    bundle.params = jax.device_get(out["state"].params)

    eval_config = make_eval_config(root)
    generate_embeds_for_config(bundle, eval_config)
    create_index(eval_config)
    results = run_retrieval(eval_config, mesh=mesh)
    print("\nRecall results:")
    for r in results:
        metrics = {k: v for k, v in r.items() if k.startswith("Recall")}
        print(f"  {r['Dataset']} [{r['CandPool']}] task {r['TaskID']}: {metrics}")


if __name__ == "__main__":
    main()
