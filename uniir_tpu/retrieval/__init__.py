from uniir_tpu.retrieval.index import DenseIndex, create_index, normalize_l2
from uniir_tpu.retrieval.search import search_dense_index, search_index
from uniir_tpu.retrieval.eval import (
    compute_recall_at_k,
    load_qrel,
    run_retrieval,
    write_run_file,
    write_tsv_report,
    evaluate_recall,
)
from uniir_tpu.retrieval.embedder import generate_embeds_for_config, generate_embeds_and_ids_for_dataset
