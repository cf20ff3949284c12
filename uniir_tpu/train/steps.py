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
    with_dropout: bool = False,
    seed: int = 0,
    jit: bool = True,
) -> Callable:
    """Train step for the CLIP family (SF and FF share the loss).

    `with_dropout` enables stochastic layers during training (CLIP-FF's T5
    fusion stack has dropout 0.1; plain CLIP towers have none).  `seed`
    (config.seed) keys the per-step dropout rng so differently-seeded runs
    get distinct stochasticity.  `jit=False` returns the raw (traceable,
    non-donating) step for callers that embed it in a larger jitted program
    (bench.py scans it to measure device time free of dispatch overhead).
    """

    n_hosts = jax.process_count()  # host-major global batch layout

    def loss_fn(params, batch, dropout_rng):
        kwargs = {}
        if with_dropout:
            kwargs = {"deterministic": False, "rngs": {"dropout": dropout_rng}}
        emb = model.apply({"params": params}, *_model_inputs(batch), **kwargs)
        bs = infer_flat_bs(batch, hard_neg_num)
        logit_scale = jnp.exp(params["logit_scale"])
        out = inbatch_contrastive_loss(
            emb, bs, logit_scale, hard_neg_num, in_batch_neg_num, n_hosts=n_hosts
        )
        return out["loss"], out

    def step(state: TrainState, batch):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, dropout_rng)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "inbatch_accuracy": out["accuracy"]}
        return new_state, metrics

    if not jit:
        return step
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
        out = inbatch_contrastive_loss(
            emb, bs, logit_scale, hard_neg_num, in_batch_neg_num, n_hosts=jax.process_count()
        )
        return {"loss": out["loss"], "inbatch_accuracy": out["accuracy"]}

    return jax.jit(step)


def make_blip_train_step(
    model,
    hard_neg_num: int = 0,
    mesh: Optional[Mesh] = None,
    with_dropout: bool = True,
    seed: int = 0,
) -> Callable:
    """Train step for the BLIP family (SF and FF share the loss machinery).

    Functional port of the reference step (blip_sf.py:174-313 + engine.py):
      1. clamp temp to [0.001, 0.5]      (reference :188-189)
      2. EMA momentum update             (reference :344-348, before fwd_m)
      3. online + momentum forwards, momentum-distilled symmetric loss
      4. ring-buffer enqueue; with hard negs, a coin flip picks enqueueing
         positives vs first negatives    (reference :289-303)
    `alpha` (distillation weight, warmed up in epoch 0 by the engine) is a
    traced scalar argument.
    """

    def step(state: MomentumTrainState, batch, alpha):
        params = dict(state.params)
        params["temp"] = jnp.clip(params["temp"], 0.001, 0.5)
        state = state.replace(params=params)
        state = state.momentum_update()

        bs = infer_flat_bs(batch, hard_neg_num)
        inputs = _model_inputs(batch)
        p_dids = batch["p_did_list"]
        n_dids = batch.get("nc_dids_list") if hard_neg_num > 0 else None
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        emb_m = model.apply(
            {"params": state.params_m}, *inputs, deterministic=True
        )
        emb_m = jax.lax.stop_gradient(emb_m)

        def loss_fn(params):
            kwargs = {}
            if with_dropout:
                kwargs = {"deterministic": False, "rngs": {"dropout": dropout_rng}}
            emb = model.apply({"params": params}, *inputs, **kwargs)
            out = momentum_distill_contrastive_loss(
                emb,
                emb_m,
                bs,
                p_dids,
                state.queue_query,
                state.queue_cand,
                state.queue_idx,
                params["temp"],
                alpha,
                hard_neg_num=hard_neg_num,
                n_dids=n_dids,
                n_hosts=jax.process_count(),
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)

        # enqueue: positives, or (coin flip) first hard negatives
        if hard_neg_num > 0:
            coin = jax.random.bernoulli(jax.random.fold_in(jax.random.PRNGKey(seed + 1), state.step))
            cand_feats = jnp.where(coin, out["enqueue_pos_cand"], out["enqueue_neg_cand"])
            cand_idx = jnp.where(coin, p_dids, n_dids[:, 0])
        else:
            cand_feats = out["enqueue_pos_cand"]
            cand_idx = p_dids
        new_state = new_state.enqueue(out["enqueue_query"], cand_feats, cand_idx)

        metrics = {"loss": loss, "inbatch_accuracy": out["accuracy"]}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, donate_argnums=(0,), out_shardings=(None, repl))


def make_blip_eval_step(model, hard_neg_num: int = 0) -> Callable:
    """No-grad BLIP eval: loss + accuracy against the current queues.

    Unlike the reference (engine.py:77-112, which snapshots/restores the full
    state dict and reseeds queues around eval), the functional state makes
    eval side-effect free by construction -- nothing to snapshot.
    """

    def step(state: MomentumTrainState, batch, alpha):
        params = dict(state.params)
        params["temp"] = jnp.clip(params["temp"], 0.001, 0.5)
        bs = infer_flat_bs(batch, hard_neg_num)
        inputs = _model_inputs(batch)
        emb = model.apply({"params": params}, *inputs)
        emb_m = model.apply({"params": state.params_m}, *inputs)
        out = momentum_distill_contrastive_loss(
            emb,
            emb_m,
            bs,
            batch["p_did_list"],
            state.queue_query,
            state.queue_cand,
            state.queue_idx,
            params["temp"],
            alpha,
            hard_neg_num=hard_neg_num,
            n_dids=batch.get("nc_dids_list") if hard_neg_num > 0 else None,
            n_hosts=jax.process_count(),
        )
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
