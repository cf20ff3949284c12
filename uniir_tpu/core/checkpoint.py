"""Checkpointing: params files + epoch train-state checkpoints.

Replaces the reference's torch.save of {model, optimizer, scheduler, config,
epoch, scaler} (reference src/models/uniir_clip/clip_scorefusion/train.py:64-79)
with:
  * `save_params` / `load_params` -- single-file msgpack of a param pytree
    (flax serialization), used for model weights / eval loading.
  * `save_train_checkpoint` / `load_train_checkpoint` -- orbax directory
    checkpoint of the full train state (params, opt_state, step) + metadata,
    named `{short_name}_epoch_{e}` under the configured ckpt dir.

No scaler state: bf16 needs no loss scaling.  The cosine schedule is a pure
function of step, so restoring `step` restores the schedule (the reference had
to pickle the scheduler).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, like: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


def load_train_params(state_msgpack_path: str, like: Any) -> Any:
    """Extract just the `params` subtree from an epoch train-state checkpoint
    (eval loading path: reference build_model_from_config loads fine-tuned
    weights from the training checkpoint, src/common/utils.py:82-149)."""
    from flax.serialization import msgpack_restore

    with open(state_msgpack_path, "rb") as f:
        tree = msgpack_restore(f.read())
    return serialization.from_state_dict(like, tree["params"])


def _state_to_pytree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        **(
            {
                "params_m": state.params_m,
                "queue_query": state.queue_query,
                "queue_cand": state.queue_cand,
                "queue_idx": state.queue_idx,
                "queue_ptr": state.queue_ptr,
            }
            if hasattr(state, "params_m")
            else {}
        ),
    }


def save_train_checkpoint(ckpt_dir: str, name: str, state, epoch: int, config=None) -> str:
    """Write `<ckpt_dir>/<name>_epoch_<epoch>` (reference save_checkpoint :64-79)."""
    path = os.path.join(ckpt_dir, f"{name}_epoch_{epoch}")
    os.makedirs(path, exist_ok=True)
    tree = jax.device_get(_state_to_pytree(state))
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(tree))
    meta = {"epoch": epoch}
    if config is not None:
        meta["config"] = config.to_dict(resolve=False) if hasattr(config, "to_dict") else dict(config)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=str)
    print(f"Saved checkpoint to {path}")
    return path


def load_train_checkpoint(path: str, state):
    """Restore a train state saved by save_train_checkpoint; returns (state, epoch)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    template = jax.device_get(_state_to_pytree(state))
    tree = serialization.from_bytes(template, data)
    state = state.replace(step=tree["step"], params=tree["params"], opt_state=tree["opt_state"])
    if hasattr(state, "params_m"):
        state = state.replace(
            params_m=tree["params_m"],
            queue_query=tree["queue_query"],
            queue_cand=tree["queue_cand"],
            queue_idx=tree["queue_idx"],
            queue_ptr=tree["queue_ptr"],
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, int(meta["epoch"])
