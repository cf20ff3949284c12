"""Trainer entry point for all four retriever variants.

Replaces the reference per-family train.py scripts
(src/models/uniir_clip/clip_scorefusion/train.py:97-378, uniir_blip/train.py)
with one config-driven `main(config)`:

  build model bundle -> optimizer (per-family param groups) -> train state
  (+ momentum/queues for BLIP) -> resume -> loaders (epoch-sharded sampler)
  -> cosine schedule over total steps -> epoch loop with per-epoch checkpoint
  and optional in-batch validation.

torchrun/DDP/NCCL initialization is replaced by the device mesh; per-epoch
DistributedSampler.set_epoch becomes EpochShuffleSampler.set_epoch + dataset
reseeding.  wandb logging is gated exactly like the reference
(wandb_config.enabled, rank 0 only).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np

from uniir_tpu.core.checkpoint import load_train_checkpoint, save_train_checkpoint
from uniir_tpu.core.config import load_config
from uniir_tpu.core.mesh import is_main_process, make_mesh, maybe_initialize_distributed
from uniir_tpu.data.data_utils import DatasetType, build_mbeir_dataset_from_config
from uniir_tpu.data.loader import EpochShuffleSampler, MBEIRLoader
from uniir_tpu.models.registry import build_model_from_config
from uniir_tpu.train.engine import eval_engine, train_one_epoch
from uniir_tpu.train.optimizer import cosine_schedule, make_blip_optimizer, make_clip_optimizer
from uniir_tpu.train.state import MomentumTrainState, TrainState
from uniir_tpu.train.steps import (
    make_blip_eval_step,
    make_blip_train_step,
    make_clip_eval_step,
    make_clip_train_step,
)

BLIP_MODELS = ("BLIPScoreFusion", "BLIPFeatureFusion")


def log_results(train_stats, val_stats, test_stats, epoch=None, best_epoch=None) -> dict:
    log_stats = {}
    if train_stats:
        log_stats.update({f"train_{k}": v for k, v in train_stats.items()})
    if val_stats:
        log_stats.update({f"val_{k}": v for k, v in val_stats.items()})
    if test_stats:
        log_stats.update({f"test_{k}": v for k, v in test_stats.items()})
    if epoch is not None:
        log_stats["epoch"] = epoch
    if best_epoch is not None:
        log_stats["best_epoch"] = best_epoch
    return log_stats


def build_train_setup(config, mesh=None, bundle=None):
    """Everything main() needs, reusable from tests: returns a dict."""
    model_name = config.model.name
    is_blip = model_name in BLIP_MODELS
    trainer_config = config.trainer_config

    if bundle is None:
        bundle = build_model_from_config(config)

    train_dataset, train_collator = build_mbeir_dataset_from_config(
        config=config,
        tokenizer=bundle.tokenizer,
        img_preprocess_fn=bundle.img_preprocess_fn,
        dataset_type=DatasetType.MAIN_TRAIN,
    )
    n_proc = jax.process_count()
    train_sampler = EpochShuffleSampler(
        len(train_dataset), num_replicas=n_proc, rank=jax.process_index(), seed=int(config.seed)
    )
    train_loader = MBEIRLoader(
        train_dataset,
        train_collator,
        batch_size=int(config.dataloader_config.train_batch_size),
        sampler=train_sampler,
        num_workers=int(config.dataloader_config.num_workers),
        drop_last=True,
    )

    valid_loader = None
    if config.evaluator.enable_eval:
        val_dataset, val_collator = build_mbeir_dataset_from_config(
            config=config,
            tokenizer=bundle.tokenizer,
            img_preprocess_fn=bundle.img_preprocess_fn_eval,
            dataset_type=DatasetType.IN_BATCH_VAL,
        )
        val_sampler = EpochShuffleSampler(
            len(val_dataset), num_replicas=n_proc, rank=jax.process_index(), seed=int(config.seed)
        )
        valid_loader = MBEIRLoader(
            val_dataset,
            val_collator,
            batch_size=int(config.dataloader_config.valid_batch_size),
            sampler=val_sampler,
            num_workers=int(config.dataloader_config.num_workers),
            drop_last=True,
        )

    accum = int(getattr(trainer_config, "gradient_accumulation_steps", 1))
    num_epochs = int(trainer_config.num_train_epochs)
    t_total = len(train_loader) // accum * num_epochs
    lr = float(trainer_config.learning_rate)
    warmup = int(getattr(trainer_config, "warmup_steps", 0))

    hard_neg_num = int(getattr(config.data_config, "hard_neg_num", 0))
    in_batch_neg_num = int(getattr(config.data_config, "in_batch_neg_num", 0))

    if is_blip:
        tx = make_blip_optimizer(
            bundle.params,
            lr,
            t_total,
            weight_decay=float(getattr(trainer_config, "weight_decay", 0.05)),
            warmup_steps=warmup,
            accumulation_steps=accum,
            # BLIP-SF freezes the (unused in mode="text") cross-attention
            # params (reference blip_sf.py:75-78); BLIP-FF trains them --
            # cross-attention IS its fusion mechanism.
            freeze_path_sub="crossattention" if model_name == "BLIPScoreFusion" else None,
        )
        state = MomentumTrainState.create(
            bundle.params,
            tx,
            queue_size=bundle.extra.get("queue_size", 57600),
            embed_dim=bundle.embed_dim,
            momentum=bundle.extra.get("momentum", 0.995),
        )
        train_step = make_blip_train_step(
            bundle.model, hard_neg_num=hard_neg_num, mesh=mesh, seed=int(config.seed)
        )
        eval_step = make_blip_eval_step(bundle.model, hard_neg_num=hard_neg_num)
    else:
        fusion_lr = getattr(trainer_config, "t5_learning_rate", None)
        tx = make_clip_optimizer(
            bundle.params,
            lr,
            t_total,
            weight_decay=float(getattr(trainer_config, "weight_decay", 0.2)),
            warmup_steps=warmup,
            accumulation_steps=accum,
            fusion_learning_rate=float(fusion_lr) if fusion_lr else None,
        )
        state = TrainState.create(params=bundle.params, tx=tx)
        train_step = make_clip_train_step(
            bundle.model,
            hard_neg_num=hard_neg_num,
            in_batch_neg_num=in_batch_neg_num,
            mesh=mesh,
            with_dropout=(model_name == "CLIPFeatureFusion"),  # T5 fusion dropout
            seed=int(config.seed),
        )
        eval_step = make_clip_eval_step(bundle.model, hard_neg_num=hard_neg_num, in_batch_neg_num=in_batch_neg_num)

    return {
        "bundle": bundle,
        "is_blip": is_blip,
        "state": state,
        "train_step": train_step,
        "eval_step": eval_step,
        "train_loader": train_loader,
        "train_sampler": train_sampler,
        "train_dataset": train_dataset,
        "valid_loader": valid_loader,
        "lr_schedule": cosine_schedule(lr, t_total, warmup),
        "num_epochs": num_epochs,
    }


def _setup_file_logging(config) -> None:
    """Mirror the reference's train.log file handler (train.py:353-368)."""
    import logging

    logger_cfg = getattr(config, "logger_config", None)
    if logger_cfg is None or not is_main_process():
        return
    out_dir = os.path.join(config.uniir_dir, logger_cfg.logger_out_dir)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, logger_cfg.logger_out_file_name)
    logging.basicConfig(
        format="[%(asctime)s] %(levelname)s: %(message)s",
        level=logging.INFO,
        datefmt="%d-%m-%Y %H:%M:%S",
        handlers=[logging.FileHandler(path), logging.StreamHandler()],
    )
    logging.getLogger("PIL").setLevel(logging.WARNING)
    logging.getLogger(__name__).info(config.to_dict())


def main(config, mesh=None, bundle=None, wandb_run=None) -> dict:
    maybe_initialize_distributed()
    if mesh is None:
        mesh = make_mesh()
    np.random.seed(int(config.seed) + jax.process_index())
    _setup_file_logging(config)

    setup = build_train_setup(config, mesh=mesh, bundle=bundle)
    state = setup["state"]
    is_blip = setup["is_blip"]
    ckpt_config = config.model.ckpt_config
    ckpt_dir = os.path.join(config.uniir_dir, ckpt_config.ckpt_dir)
    short_name = config.model.short_name.lower()

    start_epoch = 0
    if getattr(ckpt_config, "resume_training", False):
        resume_path = os.path.join(ckpt_dir, ckpt_config.ckpt_name)
        assert os.path.exists(resume_path), f"Checkpoint file {resume_path} does not exist."
        state, last_epoch = load_train_checkpoint(resume_path, state)
        start_epoch = last_epoch + 1
        print(f"Resuming training from epoch {start_epoch}")

    alpha = float(getattr(config.model, "alpha", 0.4)) if is_blip else 0.4
    best_inbatch_accuracy = 0.0
    best_epoch = 0
    last_stats: dict = {}
    eval_freq = int(getattr(config.evaluator, "eval_freq", 1))

    for epoch in range(start_epoch, setup["num_epochs"]):
        setup["train_sampler"].set_epoch(epoch)
        setup["train_dataset"].seed(int(config.seed) + epoch)

        state, train_stats = train_one_epoch(
            setup["train_step"],
            state,
            setup["train_loader"],
            epoch,
            config,
            mesh=mesh,
            lr_schedule=setup["lr_schedule"],
            is_blip=is_blip,
            alpha=alpha,
        )

        val_stats = None
        if setup["valid_loader"] is not None and epoch % eval_freq == 0:
            eval_target = state if is_blip else state.params
            val_stats = eval_engine(
                setup["eval_step"], eval_target, setup["valid_loader"], config, mesh=mesh, is_blip=is_blip, alpha=alpha
            )
            inbatch_accuracy = float(val_stats.get("inbatch_accuracy", 0.0))
            if inbatch_accuracy >= best_inbatch_accuracy:
                best_inbatch_accuracy = inbatch_accuracy
                best_epoch = epoch

        # every process participates: orbax's save barriers are collective
        # (rank 0 alone would hang a jax.distributed run); meta.json and the
        # log line stay rank-0-only inside save_train_checkpoint
        save_train_checkpoint(ckpt_dir, short_name, state, epoch, config)
        last_stats = log_results(train_stats, val_stats, None, epoch, best_epoch)
        if wandb_run is not None and is_main_process():
            wandb_run.log(last_stats)

    return {"state": state, "stats": last_stats, "best_epoch": best_epoch}


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="config.yaml", help="Path to the config file.")
    parser.add_argument("--uniir_dir", type=str, default="/data/UniIR")
    parser.add_argument("--mbeir_data_dir", type=str, default="/data/UniIR/mbeir_data")
    args = parser.parse_args()
    config = load_config(args.config_path)
    config.uniir_dir = args.uniir_dir
    config.mbeir_data_dir = args.mbeir_data_dir

    wandb_run = None
    wandb_cfg = getattr(config, "wandb_config", None)
    if wandb_cfg and getattr(wandb_cfg, "enabled", False) and is_main_process():
        try:
            import wandb

            wandb_run = wandb.init(
                project=os.environ.get("WANDB_PROJECT"),
                entity=os.environ.get("WANDB_ENTITY"),
                name=wandb_cfg.experiment_name,
                config=config.to_dict(),
            )
        except Exception as e:  # wandb not installed / offline: log and continue
            print(f"wandb disabled: {e}")

    main(config, wandb_run=wandb_run)
    if wandb_run is not None:
        wandb_run.finish()


if __name__ == "__main__":
    cli()
