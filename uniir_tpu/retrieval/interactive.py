"""Programmatic retrieval API (reference src/common/interactive_retriever.py).

`InteractiveRetriever(cand_index_path, candidates_path, dataset_name, config)`
-> `add_queries([(modality, txt, img_path, cand_modality), ...])` ->
`retrieve(k)` -> per-query lists of raw candidate dicts.

No temp-file round trip: embeddings flow in memory to the sharded top-k.
"""

from __future__ import annotations

import json
from enum import Enum
from typing import List, Optional, Tuple

import numpy as np

from uniir_tpu.core.config import parse_image_size
from uniir_tpu.data.collator import MBEIRInferenceOnlyCollator
from uniir_tpu.data.dataset import MBEIRInferenceOnlyDataset
from uniir_tpu.data.loader import MBEIRLoader
from uniir_tpu.data.registry import DATASET_IDS, MBEIR_TASK, unhash_did
from uniir_tpu.retrieval.embedder import generate_embeds_and_ids_for_dataset
from uniir_tpu.retrieval.index import DenseIndex
from uniir_tpu.retrieval.search import search_dense_index
from uniir_tpu.train.steps import make_embed_step


class Modality(Enum):
    TEXT = "text"
    IMAGE = "image"
    IMAGE_TEXT = "image,text"


class InteractiveRetriever:
    def __init__(self, cand_index_path: str, candidates_path: str, dataset_name: str, config, bundle=None, mesh=None):
        from uniir_tpu.models.registry import build_model_from_config

        self.dataset_id = DATASET_IDS[dataset_name]
        self.bundle = bundle if bundle is not None else build_model_from_config(config)
        self.config = config
        self.mesh = mesh
        self.index = DenseIndex.load(cand_index_path)
        self.embed_step = make_embed_step(self.bundle.model, out_dtype=np.float16)
        self.queries: List[dict] = []

        self.did_to_candidates = {}
        with open(candidates_path, "r") as f:
            for l in f:
                c = json.loads(l.strip())
                assert c["did"] not in self.did_to_candidates, "dids must be unique"
                self.did_to_candidates[c["did"]] = c

    def add_queries(self, queries: List[Tuple[str, Optional[str], Optional[str], str]]) -> None:
        """Validated (modality, txt, img_path, cand_modality) tuples (ref :72-96)."""
        for query_modality, query_txt, query_img_path, candidate_modality in queries:
            if query_modality == Modality.TEXT.value:
                assert query_txt, "Query with 'text' modality must have non-null 'query_txt'"
                assert query_img_path is None, "Query with 'text' modality must have null 'query_img_path'"
            elif query_modality == Modality.IMAGE.value:
                assert query_txt is None, "Query with 'image' modality must have null 'query_txt'"
                assert query_img_path, "Query with 'image' modality must have non-null 'query_img_path'"
            elif query_modality == Modality.IMAGE_TEXT.value:
                assert query_txt, "Query with 'image,text' modality must have non-null 'query_txt'"
                assert query_img_path, "Query with 'image,text' modality must have non-null 'query_img_path'"
            else:
                raise ValueError("Only 'text', 'image' and 'image,text' query modalities are supported.")
            task_id = MBEIR_TASK[" -> ".join([query_modality, candidate_modality])]
            self.queries.append(
                {
                    "qid": f"{self.dataset_id}:{len(self.queries) + 1}",
                    "query_modality": query_modality,
                    "query_txt": query_txt,
                    "query_img_path": query_img_path,
                    "task_id": task_id,
                    "candidate_modality": candidate_modality,
                }
            )

    def _embed_queries(self) -> np.ndarray:
        data_config = self.config.data_config
        dataset = MBEIRInferenceOnlyDataset(
            self.config.mbeir_data_dir,
            self.queries,
            data_config.query_instruct_path,
            self.bundle.img_preprocess_fn_eval,
            enable_query_instruct=data_config.enable_query_instruct,
        )
        collator = MBEIRInferenceOnlyCollator(
            tokenizer=self.bundle.tokenizer, image_size=parse_image_size(data_config.image_size)
        )
        loader = MBEIRLoader(
            dataset,
            collator,
            batch_size=int(self.config.dataloader_config.batch_size),
            num_workers=int(self.config.dataloader_config.num_workers),
            drop_last=False,
            pad_last=True,
        )
        embeds, _ = generate_embeds_and_ids_for_dataset(self.embed_step, self.bundle.params, loader, mesh=self.mesh)
        return embeds

    def retrieve(self, k: int = 1, batch_size: int = 100) -> List[list]:
        embeds = self._embed_queries()
        _, retrieved = search_dense_index(
            embeds, self.index, num_cand_to_retrieve=k, batch_size=batch_size, mesh=self.mesh
        )
        results = []
        for indices in retrieved:
            results.append([self.did_to_candidates[unhash_did(h)] for h in indices])
        return results
