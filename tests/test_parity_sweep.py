"""The full 16-dataset union-pool retrieval sweep on the fixture tree.

Mirrors the reference's large/eval/inbatch/retrieval.yaml:147-181 (16 runs
against local pools + the same 16 against UNION = 32 retrieval rows) end to
end: embed -> index (incl. union) -> retrieve -> TSV.  This is the parity
dress rehearsal: with real weights/data the same code path produces the
numbers to diff against PARITY.md's expected table.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from tests.helpers import SWEEP_RUNS, build_union_sweep_tree, tiny_clip_bundle


@pytest.mark.slow
def test_full_union_sweep(tmp_path):
    from parity_smoke import build_sweep_config

    root = str(tmp_path)
    build_union_sweep_tree(root)

    class Args:
        mbeir_data_dir = os.path.join(root, "mbeir_data")
        uniir_dir = root
        dataset = "mscoco_task0"
        split = "test"
        model = "CLIPScoreFusion"
        size = "ViT-L/14"
        ckpt = ""
        clip_bpe = ""
        bert_vocab = ""
        instruct = True
        batch_size = 16

    bundle = tiny_clip_bundle()
    config = build_sweep_config(Args, embed_dim=bundle.embed_dim, image_size=bundle.image_size[0])

    from uniir_tpu.retrieval.embedder import generate_embeds_for_config
    from uniir_tpu.retrieval.eval import run_retrieval
    from uniir_tpu.retrieval.index import create_index

    generate_embeds_for_config(bundle, config)
    create_index(config)
    run_retrieval(config)

    # every run produced a run file for local AND union pools
    results_dir = os.path.join(root, "retrieval_results", config.experiment.path_suffix)
    run_dir = os.path.join(results_dir, "run_files")
    run_files = set(os.listdir(run_dir))
    for run_name, _, _ in SWEEP_RUNS:
        assert any(run_name in f and "single_pool" in f for f in run_files), (run_name, run_files)
        assert any(run_name in f and "union_pool" in f for f in run_files), run_name

    # the TSV covers all 16 runs with a union comparison column
    tsv_dir = os.path.join(results_dir, "final_tsv")
    tsv = open(os.path.join(tsv_dir, sorted(os.listdir(tsv_dir))[0])).read()
    for run_name, _, _ in SWEEP_RUNS:
        assert run_name in tsv, run_name
    assert "union" in tsv.lower()
    # heavy datasets report Recall@10/20/50, the rest Recall@1/5/10
    assert "Recall@50" in tsv and "Recall@5" in tsv
