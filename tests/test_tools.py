"""Tools: interactive retriever, hard-neg mining, error analyst, raw
retrieval, config updater -- over the shared pipeline fixture."""

import json
import os

import numpy as np
import pytest
import yaml

from tests.helpers import make_eval_config
from uniir_tpu.retrieval.embedder import generate_embeds_for_config
from uniir_tpu.retrieval.index import create_index
from uniir_tpu.retrieval.eval import run_retrieval
from uniir_tpu.retrieval.hard_negs import run_hard_negative_mining
from uniir_tpu.retrieval.interactive import InteractiveRetriever
from uniir_tpu.retrieval.analyst import run_automatic_error_analysis
from uniir_tpu.tools.config_updater import update_mbeir_yaml_instruct_status
from uniir_tpu.data.dataset import load_jsonl


@pytest.fixture(scope="module")
def artifacts(pipeline_root, bundle):
    """Run the embed+index+retrieve pipeline once for the tools to consume."""
    config = make_eval_config(pipeline_root)
    generate_embeds_for_config(bundle, config)
    create_index(config)
    run_retrieval(config)
    return config


def test_hard_negative_mining(artifacts, pipeline_root):
    out_path = run_hard_negative_mining(artifacts)
    assert os.path.exists(out_path)
    mined = load_jsonl(out_path)
    orig = load_jsonl(os.path.join(pipeline_root, "mbeir_data/train/mbeir_mscoco_task0_train.jsonl"))
    assert len(mined) == len(orig)
    for m, o in zip(mined, orig):
        assert len(m["neg_cand_list"]) >= len(o["neg_cand_list"])
        # mined negs never include positives
        assert not set(m["neg_cand_list"][len(o["neg_cand_list"]):]) & set(m["pos_cand_list"])


def test_interactive_retriever(artifacts, pipeline_root, bundle):
    config = artifacts
    expt = config.experiment.path_suffix
    index_path = os.path.join(pipeline_root, "index", expt, "cand_pool", "mbeir_mscoco_task0_cand_pool.index")
    candidates_path = os.path.join(pipeline_root, "mbeir_data/cand_pool/local/mbeir_mscoco_task0_cand_pool.jsonl")
    retr = InteractiveRetriever(index_path, candidates_path, "MSCOCO", config, bundle=bundle)
    retr.add_queries([("text", "a red dress", None, "image"), ("text", "cat photo", None, "text")])
    results = retr.retrieve(k=3)
    assert len(results) == 2
    assert all(len(r) == 3 for r in results)
    assert all("did" in c for r in results for c in r)
    # modality validation
    with pytest.raises(AssertionError):
        retr.add_queries([("text", None, None, "image")])
    with pytest.raises(ValueError):
        retr.add_queries([("audio", "x", None, "image")])


def test_error_analyst(artifacts, pipeline_root):
    results = run_automatic_error_analysis(artifacts)
    assert len(results) >= 1
    for r in results:
        assert set(r) >= {"TaskID", "Task", "Dataset", "Split", "CandPool", "Type1", "Type2", "Type3"}
        assert all(0.0 <= r[t] <= 1.0 for t in ("Type1", "Type2", "Type3"))
    tsv_dir = os.path.join(pipeline_root, "retrieval_results", artifacts.experiment.path_suffix, "error_tsv")
    assert len(os.listdir(tsv_dir)) >= 1


def test_raw_retrieval_dump(artifacts, pipeline_root):
    config = make_eval_config(pipeline_root)
    config.retrieval_config.raw_retrieval = True
    config.retrieval_config.train_datasets_config.enable_retrieve = False
    # single pool only: union raw retrieval needs candidate_dir_name pointed at
    # the union pool jsonl (UniRAG configs do that; reference :453-455)
    tcfg = config.retrieval_config.test_datasets_config
    tcfg.datasets_name = ["mscoco_task0"]
    tcfg.correspond_cand_pools_name = ["mscoco_task0"]
    tcfg.correspond_qrels_name = ["mscoco_task0"]
    tcfg.correspond_metrics_name = ["Recall@1, Recall@5, Recall@10"]
    run_retrieval(config)
    cands_dir = os.path.join(pipeline_root, "retrieval_results", config.experiment.path_suffix, "retrieved_candidates")
    files = [f for f in os.listdir(cands_dir) if f.endswith("_retrieved.jsonl")]
    assert files
    rows = [json.loads(l) for l in open(os.path.join(cands_dir, sorted(files)[0]))]
    assert all("query" in r and "candidates" in r for r in rows)
    assert all(len(r["candidates"]) >= 1 for r in rows)


def test_config_updater(tmp_path):
    p = tmp_path / "embed.yaml"
    p.write_text(
        yaml.safe_dump(
            {"experiment": {"instruct_status": "Instruct"}, "data_config": {"enable_query_instruct": True}}
        )
    )
    update_mbeir_yaml_instruct_status(str(p), False)
    data = yaml.safe_load(p.read_text())
    assert data["experiment"]["instruct_status"] == "NoInstruct"
    assert data["data_config"]["enable_query_instruct"] is False
    update_mbeir_yaml_instruct_status(str(p), True)
    data = yaml.safe_load(p.read_text())
    assert data["experiment"]["instruct_status"] == "Instruct"
    assert data["data_config"]["enable_query_instruct"] is True


def test_complement_retrieval_pairs(artifacts, pipeline_root, bundle):
    """UniRAG complement retrieval: single-modality candidates get their
    image/text complement via a second interactive retrieval pass."""
    config = make_eval_config(pipeline_root)
    config.retrieval_config.raw_retrieval = True
    config.retrieval_config.retrieve_image_text_pairs = True
    config.retrieval_config.train_datasets_config.enable_retrieve = False
    tcfg = config.retrieval_config.test_datasets_config
    tcfg.datasets_name = ["mscoco_task0"]
    tcfg.correspond_cand_pools_name = ["mscoco_task0"]
    tcfg.correspond_qrels_name = ["mscoco_task0"]
    tcfg.correspond_metrics_name = ["Recall@1, Recall@5"]

    from uniir_tpu.retrieval.eval import run_retrieval

    run_retrieval(config, query_embedder_config=config, bundle=bundle)
    cands_dir = os.path.join(
        pipeline_root, "retrieval_results", config.experiment.path_suffix, "retrieved_candidates"
    )
    files = [f for f in os.listdir(cands_dir) if f.endswith("_k5_retrieved.jsonl")]
    rows = [json.loads(l) for l in open(os.path.join(cands_dir, files[0]))]
    assert all("complement_candidates" in r for r in rows)
    # complements have the opposite modality of their candidate (when found)
    flips = {"text": "image", "image": "text"}
    for r in rows:
        for cand, comp in zip(r["candidates"], r["complement_candidates"]):
            if comp is not None and cand["modality"] in flips:
                assert comp["modality"] == flips[cand["modality"]]
