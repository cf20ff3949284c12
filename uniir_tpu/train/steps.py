"""Jitted train / eval / embed steps.

The hot loop (reference src/models/uniir_clip/engine.py:7-84) becomes three
pure jitted functions.  The batch arrives globally sharded on the mesh `data`
axis; the state is replicated.  No GradScaler: bf16 on TPU needs no loss
scaling (reference's CUDA AMP, engine.py:25-46).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uniir_tpu.core.mesh import DATA_AXIS
from uniir_tpu.train.losses import inbatch_contrastive_loss, momentum_distill_contrastive_loss
from uniir_tpu.train.state import MomentumTrainState, TrainState


def batch_shardings(mesh: Mesh):
    """Sharding pytree fn: leading-axis data sharding for array leaves."""

    def leaf(x):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (max(x.ndim, 1) - 1))))

    return leaf


def _model_inputs(batch: Dict[str, Any]):
    txt = batch["txt_batched"]
    return (
        txt,
        batch["image_batched"],
        batch["txt_mask_batched"],
        batch["image_mask_batched"],
    )


def infer_flat_bs(batch: Dict[str, Any], hard_neg_num: int) -> int:
    """Static per-batch query count from the flat layout N = bs*(2+neg)."""
    n_rows = batch["image_batched"].shape[0]
    bs = n_rows // (2 + hard_neg_num)
    assert bs * (2 + hard_neg_num) == n_rows, (n_rows, hard_neg_num)
    return bs


def make_clip_train_step(
    model,
    hard_neg_num: int = 0,
    in_batch_neg_num: int = 0,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Train step for the CLIP family (SF and FF share the loss)."""

    def loss_fn(params, batch):
        emb = model.apply({"params": params}, *_model_inputs(batch))
        bs = infer_flat_bs(batch, hard_neg_num)
        logit_scale = jnp.exp(params["logit_scale"])
        out = inbatch_contrastive_loss(emb, bs, logit_scale, hard_neg_num, in_batch_neg_num)
        return out["loss"], out

    def step(state: TrainState, batch):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "inbatch_accuracy": out["accuracy"]}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        donate_argnums=(0,),
        out_shardings=(None, repl),
    )


def make_clip_eval_step(model, hard_neg_num: int = 0, in_batch_neg_num: int = 0) -> Callable:
    """No-grad twin (reference eval_engine, engine.py:58-84)."""

    def step(params, batch):
        emb = model.apply({"params": params}, *_model_inputs(batch))
        bs = infer_flat_bs(batch, hard_neg_num)
        logit_scale = jnp.exp(params["logit_scale"])
        out = inbatch_contrastive_loss(emb, bs, logit_scale, hard_neg_num, in_batch_neg_num)
        return {"loss": out["loss"], "inbatch_accuracy": out["accuracy"]}

    return jax.jit(step)


def make_embed_step(model, out_dtype=jnp.float16, method: Optional[str] = None) -> Callable:
    """Embedding forward for the eval pipeline (fp16 artifacts on disk,
    reference mbeir_embedder.py:56,110)."""

    def step(params, batch):
        kwargs = {"method": method} if method else {}
        emb = model.apply({"params": params}, *_model_inputs(batch), **kwargs)
        return emb.astype(out_dtype)

    return jax.jit(step)
