"""Eval pipeline CLI: embed / index / retrieve / hard-neg-mine / analyze.

One entry replacing the reference's three CLIs (mbeir_embedder.py main,
mbeir_retriever.py main with --enable_create_index/--enable_retrieval/
--enable_hard_negative_mining, mbeir_analyst.py main) -- same flags, one
process, no conda-env split (the reference needed separate torch and faiss
envs; here everything is JAX).
"""

from __future__ import annotations

import argparse

from uniir_tpu.core.config import load_config
from uniir_tpu.core.mesh import make_mesh, maybe_initialize_distributed


def parse_arguments():
    parser = argparse.ArgumentParser(description="uniir_tpu eval pipeline")
    parser.add_argument("--uniir_dir", type=str, default="/data/UniIR")
    parser.add_argument("--mbeir_data_dir", type=str, default="/data/UniIR/mbeir_data")
    parser.add_argument("--config_path", default="config.yaml", help="Path to the config file.")
    parser.add_argument(
        "--query_embedder_config_path",
        default="",
        help="Embedder config for complement retrieval in raw_retrieval mode.",
    )
    parser.add_argument("--enable_embed", action="store_true", help="Run the embedder sweep")
    parser.add_argument("--enable_create_index", action="store_true", help="Enable create index")
    parser.add_argument("--enable_hard_negative_mining", action="store_true", help="Enable hard negative mining")
    parser.add_argument("--enable_retrieval", action="store_true", help="Enable retrieval")
    parser.add_argument("--run_automatic_error_analysis", action="store_true", help="Run error analysis")
    return parser.parse_args()


def main():
    args = parse_arguments()
    maybe_initialize_distributed()
    config = load_config(args.config_path)
    config.uniir_dir = args.uniir_dir
    config.mbeir_data_dir = args.mbeir_data_dir
    print(config.to_yaml())
    mesh = make_mesh()

    query_embedder_config = None
    if args.query_embedder_config_path:
        query_embedder_config = load_config(args.query_embedder_config_path)
        query_embedder_config.uniir_dir = args.uniir_dir
        query_embedder_config.mbeir_data_dir = args.mbeir_data_dir

    if args.enable_embed:
        from uniir_tpu.models.registry import build_model_from_config
        from uniir_tpu.retrieval.embedder import generate_embeds_for_config

        bundle = build_model_from_config(config)
        generate_embeds_for_config(bundle, config, mesh=mesh)

    if args.enable_hard_negative_mining:
        from uniir_tpu.retrieval.hard_negs import run_hard_negative_mining

        run_hard_negative_mining(config, mesh=mesh)

    if args.enable_create_index:
        from uniir_tpu.retrieval.index import create_index

        create_index(config)

    if args.enable_retrieval:
        from uniir_tpu.retrieval.eval import run_retrieval

        run_retrieval(config, mesh=mesh, query_embedder_config=query_embedder_config)

    if args.run_automatic_error_analysis:
        from uniir_tpu.retrieval.analyst import run_automatic_error_analysis

        run_automatic_error_analysis(config)


if __name__ == "__main__":
    main()
