"""Embedding generation (reference src/common/mbeir_embedder.py).

For every enabled split/dataset/pool in embed.yaml: build the dataset +
contiguous-sharded loader, run the jitted embed step per batch, concatenate,
and save fp16 `mbeir_{name}_{split}_embed.npy` + `_ids.npy` artifacts with the
reference's exact naming (mbeir_embedder.py:345-369).  The union pool is the
concatenation of per-dataset pool artifacts, never re-encoded (:386-461).

TPU changes vs reference:
  * no gather-to-rank-0 NCCL dance (:63-116): on a single host the arrays are
    already local; on multi-host each process writes its contiguous shard and
    rank 0 concatenates files (the reference's tmp-file variant, :123-191).
  * batches are padded to static shapes (`n_valid` trims) so one compiled
    executable serves the whole sweep.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from uniir_tpu.core.config import parse_image_size
from uniir_tpu.core.mesh import shard_batch
from uniir_tpu.data.collator import MBEIRCandidatePoolCollator, MBEIRMainCollator
from uniir_tpu.data.dataset import MBEIRCandidatePoolDataset, MBEIRMainDataset, Mode
from uniir_tpu.data.loader import ContiguousSampler, MBEIRLoader
from uniir_tpu.train.steps import make_embed_step


def generate_embeds_and_ids_for_dataset(
    embed_step: Callable,
    params,
    data_loader,
    id_key: str = "auto",
    mesh=None,
):
    """Batched embed loop (reference generate_embeds_and_ids_... :32-120)."""
    embeddings, ids = [], []
    for batch in data_loader:
        n_valid = int(batch.pop("n_valid", batch["image_batched"].shape[0]))
        id_list = batch.pop("did_list", None)
        if id_list is None:
            id_list = batch.pop("qid_list", None)
        batch.pop("task_id_list", None)
        batch.pop("index_mapping", None)
        assert id_list is not None, "id_list must be provided."
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        emb = np.asarray(embed_step(params, batch))
        embeddings.append(emb[:n_valid])
        ids.append(np.asarray(id_list)[:n_valid])
    embedding_list = np.concatenate(embeddings, axis=0)
    id_list = np.concatenate(ids, axis=0)
    assert len(embedding_list) == len(id_list)
    assert len(set(id_list.tolist())) == len(id_list), "IDs should be unique"
    return embedding_list, id_list


def generate_embeds_for_config(bundle, config, mesh=None, embed_step: Optional[Callable] = None) -> list:
    """Run the full embed sweep from embed.yaml (reference :194-461)."""
    uniir_dir = config.uniir_dir
    mbeir_data_dir = config.mbeir_data_dir
    embed_config = config.embed_config
    embed_dir_name = embed_config.embed_dir_name
    expt_dir_name = config.experiment.path_suffix

    data_config = config.data_config
    query_instruct_path = data_config.query_instruct_path
    cand_pool_dir = data_config.cand_pool_dir_name
    image_size = parse_image_size(data_config.image_size)

    batch_size = config.dataloader_config.batch_size
    num_workers = config.dataloader_config.num_workers

    if embed_step is None:
        use_fp16 = bool(getattr(embed_config, "use_fp16", True))
        embed_step = make_embed_step(bundle.model, out_dtype=np.float16 if use_fp16 else np.float32)

    splits = []
    for split_name in ("train", "val", "test"):
        split_dir_name = getattr(data_config, f"{split_name}_dir_name")
        ds_cfg = getattr(embed_config, f"{split_name}_datasets_config", None)
        if ds_cfg and ds_cfg.enable_embed:
            names = ds_cfg.datasets_name
            pools = ds_cfg.correspond_cand_pools_name
            assert len(names) == len(pools), "Mismatch between datasets and candidate pools."
            splits.append((split_name, split_dir_name, names, pools))

    cand_cfg = getattr(embed_config, "cand_pools_config", None)
    if cand_cfg and cand_cfg.enable_embed:
        pool_names = cand_cfg.cand_pools_name_to_embed
        splits.append(("cand_pool", data_config.cand_pool_dir_name, [None] * len(pool_names), pool_names))

    written = []
    for split_name, split_dir, dataset_names, pool_names in splits:
        for dataset_name, cand_pool_name in zip(dataset_names, pool_names):
            if split_name == "cand_pool":
                cand_pool_name = cand_pool_name.lower()
                dataset = MBEIRCandidatePoolDataset(
                    mbeir_data_dir=mbeir_data_dir,
                    cand_pool_data_path=os.path.join(split_dir, f"mbeir_{cand_pool_name}_{split_name}.jsonl"),
                    img_preprocess_fn=bundle.img_preprocess_fn_eval,
                )
                collator = MBEIRCandidatePoolCollator(tokenizer=bundle.tokenizer, image_size=image_size)
            else:
                dataset_name = dataset_name.lower()
                cand_pool_name = cand_pool_name.lower()
                dataset = MBEIRMainDataset(
                    mbeir_data_dir=mbeir_data_dir,
                    query_data_path=os.path.join(split_dir, f"mbeir_{dataset_name}_{split_name}.jsonl"),
                    cand_pool_path=os.path.join(cand_pool_dir, f"mbeir_{cand_pool_name}_cand_pool.jsonl"),
                    query_instruct_path=query_instruct_path,
                    img_preprocess_fn=bundle.img_preprocess_fn_eval,
                    mode=Mode.EVAL,
                    enable_query_instruct=data_config.enable_query_instruct,
                    shuffle_cand=data_config.shuffle_cand,
                )
                collator = MBEIRMainCollator(tokenizer=bundle.tokenizer, image_size=image_size, mode=Mode.EVAL)

            # Multi-host: each process embeds its contiguous shard and writes
            # a part file; process 0 concatenates (the reference's tmp-file
            # variant, mbeir_embedder.py:123-191, replacing the NCCL
            # gather-to-rank-0 dance).
            import jax

            n_proc, proc = jax.process_count(), jax.process_index()
            sampler = ContiguousSampler(len(dataset), num_replicas=n_proc, rank=proc)
            loader = MBEIRLoader(
                dataset,
                collator,
                batch_size=batch_size,
                sampler=sampler,
                num_workers=num_workers,
                drop_last=False,
                pad_last=True,
            )
            embedding_list, id_list = generate_embeds_and_ids_for_dataset(embed_step, bundle.params, loader, mesh=mesh)

            mid_name = cand_pool_name if split_name == "cand_pool" else dataset_name
            out_dir = os.path.join(uniir_dir, embed_dir_name, expt_dir_name, split_name)
            os.makedirs(out_dir, exist_ok=True)
            embed_path = os.path.join(out_dir, f"mbeir_{mid_name}_{split_name}_embed.npy")
            id_path = os.path.join(out_dir, f"mbeir_{mid_name}_{split_name}_ids.npy")
            if n_proc == 1:
                np.save(embed_path, embedding_list)
                np.save(id_path, id_list)
            else:
                np.save(embed_path + f".part{proc}", embedding_list)
                np.save(id_path + f".part{proc}", id_list)
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"embed_{mid_name}_{split_name}")
                if proc == 0:
                    embeds = [np.load(f"{embed_path}.part{r}.npy") for r in range(n_proc)]
                    ids = [np.load(f"{id_path}.part{r}.npy") for r in range(n_proc)]
                    np.save(embed_path, np.concatenate(embeds, axis=0))
                    np.save(id_path, np.concatenate(ids, axis=0))
                    for r in range(n_proc):
                        os.remove(f"{embed_path}.part{r}.npy")
                        os.remove(f"{id_path}.part{r}.npy")
                multihost_utils.sync_global_devices(f"embed_{mid_name}_{split_name}_done")
            print(f"Embedder Log: Saved embeddings to {embed_path} ({len(id_list)} rows).")
            written.extend([embed_path, id_path])

        # Union pool = concat of per-pool artifacts (reference :386-461)
        import jax as _jax

        if split_name == "cand_pool" and getattr(cand_cfg, "embed_union_pool", False) and _jax.process_index() == 0:
            all_embeddings, all_ids = [], []
            out_dir = os.path.join(uniir_dir, embed_dir_name, expt_dir_name, split_name)
            for cand_pool_name in pool_names:
                base = f"mbeir_{cand_pool_name.lower()}_{split_name}"
                all_embeddings.append(np.load(os.path.join(out_dir, f"{base}_embed.npy")))
                all_ids.append(np.load(os.path.join(out_dir, f"{base}_ids.npy")))
            all_embeddings = np.concatenate(all_embeddings, axis=0)
            all_ids = np.concatenate(all_ids, axis=0)
            assert len(all_embeddings) == len(all_ids), "Mismatch between embeddings and IDs length."
            np.save(os.path.join(out_dir, f"mbeir_union_{split_name}_embed.npy"), all_embeddings)
            np.save(os.path.join(out_dir, f"mbeir_union_{split_name}_ids.npy"), all_ids)
            written.extend(
                [
                    os.path.join(out_dir, f"mbeir_union_{split_name}_embed.npy"),
                    os.path.join(out_dir, f"mbeir_union_{split_name}_ids.npy"),
                ]
            )
            print(f"Embedder Log: Saved union pool ({len(all_ids)} rows).")
    return written
