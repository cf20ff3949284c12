from uniir_tpu.data.registry import (
    DATASET_IDS,
    MBEIR_TASK,
    MBEIR_DATASET_TO_DOMAIN,
    hash_qid,
    unhash_qid,
    hash_did,
    unhash_did,
    get_mbeir_task_id,
    get_mbeir_task_name,
    format_string,
)
from uniir_tpu.data.dataset import (
    Mode,
    MBEIRMainDataset,
    MBEIRCandidatePoolDataset,
    MBEIRInferenceOnlyDataset,
    load_jsonl,
    save_jsonl,
)
from uniir_tpu.data.collator import (
    MBEIRMainCollator,
    MBEIRCandidatePoolCollator,
    MBEIRInferenceOnlyCollator,
)
from uniir_tpu.data.loader import EpochShuffleSampler, ContiguousSampler, MBEIRLoader
