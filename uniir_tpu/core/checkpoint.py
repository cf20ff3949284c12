"""Checkpointing: params files + epoch train-state checkpoints.

Replaces the reference's torch.save of {model, optimizer, scheduler, config,
epoch, scaler} (reference src/models/uniir_clip/clip_scorefusion/train.py:64-79)
with:
  * `save_params` / `load_params` -- single-file msgpack of a param pytree
    (flax serialization), used for model weights / eval loading.
  * `save_train_checkpoint` / `load_train_checkpoint` -- orbax directory
    checkpoint, one item per train-state component (params / params_m /
    opt_state / queues), named `{short_name}_epoch_{e}` under the configured
    ckpt dir.  Per-component items mean (a) orbax streams arrays to disk
    instead of materializing one multi-GB host blob (a Large BLIP state is
    params + momentum twin + 57,600x768 queues + opt state ~= 5-7 GB), and
    (b) eval loading restores ONLY the params item (`load_train_params`).
    Legacy single-file `state.msgpack` checkpoints are still readable IF
    their param tree matches the current model; checkpoints written before
    the qkv-projection fusion (round 1: separate q_proj/k_proj/v_proj
    leaves) predate the current tree and are NOT loadable -- re-convert from
    the original torch weights instead of shimming a dead layout.

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


_CKPTR = None


def _checkpointer():
    """One process-wide StandardCheckpointer: per-call instances race their
    finalizers against orbax's shared async executor ("cannot schedule new
    futures after shutdown")."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, like: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


def load_train_params(path: str, like: Any) -> Any:
    """Extract just the `params` subtree from an epoch train-state checkpoint
    (eval loading path: reference build_model_from_config loads fine-tuned
    weights from the training checkpoint, src/common/utils.py:82-149).

    `path` may be the checkpoint dir, its `params` item dir, or a legacy
    `state.msgpack` file.  Only the params item is read -- no momentum twin /
    queue / optimizer bytes touch host memory.
    """
    if path.endswith("state.msgpack") or os.path.isfile(path):
        from flax.serialization import msgpack_restore

        with open(path, "rb") as f:
            tree = msgpack_restore(f.read())
        return serialization.from_state_dict(like, tree["params"])
    ckpt_dir = path if os.path.basename(path) == "params" else os.path.join(path, "params")
    legacy = os.path.join(path, "state.msgpack")
    if not os.path.isdir(ckpt_dir) and os.path.exists(legacy):
        return load_train_params(legacy, like)
    restored = _checkpointer().restore(os.path.abspath(ckpt_dir), {"item": jax.device_get(like)})
    # StandardCheckpointer restores to the template's exact pytree structure
    # (running it through flax from_state_dict would break on tuples).
    return restored["item"]


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
    """Write `<ckpt_dir>/<name>_epoch_<epoch>` (reference save_checkpoint :64-79).

    One orbax item per component so each is streamed independently and eval
    can restore params alone.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"{name}_epoch_{epoch}"))
    is_primary = jax.process_index() == 0
    if is_primary:
        os.makedirs(path, exist_ok=True)
        # Overwriting an epoch dir that holds a legacy single-file checkpoint
        # must also drop the msgpack: load_train_checkpoint prefers it when
        # present, so a stale leftover would silently shadow the new save.
        legacy = os.path.join(path, "state.msgpack")
        if os.path.exists(legacy):
            os.remove(legacy)
    ckptr = _checkpointer()
    tree = _state_to_pytree(state)
    step = int(jax.device_get(tree.pop("step")))
    for item, subtree in tree.items():
        item_path = os.path.join(path, item)
        if is_primary and os.path.exists(item_path):  # overwrite-by-epoch, like torch.save
            import shutil

            shutil.rmtree(item_path)
        # the {"item": ...} wrapper lets bare arrays / scalars / tuples
        # (queue_ptr, optax states) ride StandardCheckpointer.  In a
        # jax.distributed run EVERY process must make this call -- orbax's
        # save/commit barriers are collective, so a rank-0-only save hangs.
        ckptr.save(item_path, {"item": subtree})
    # StandardCheckpointer is async: block until all items are durable before
    # writing meta.json (meta's existence is the checkpoint-complete marker).
    ckptr.wait_until_finished()
    if is_primary:
        meta = {"epoch": epoch, "step": step, "items": sorted(tree)}
        if config is not None:
            meta["config"] = config.to_dict(resolve=False) if hasattr(config, "to_dict") else dict(config)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
        print(f"Saved checkpoint to {path}")
    return path


def load_train_checkpoint(path: str, state):
    """Restore a train state saved by save_train_checkpoint; returns (state, epoch).

    Reads the per-component orbax layout; falls back to the legacy
    single-file `state.msgpack` layout if present.
    """
    path = os.path.abspath(path)
    legacy = os.path.join(path, "state.msgpack")
    template = _state_to_pytree(state)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    if os.path.exists(legacy):
        with open(legacy, "rb") as f:
            tree = serialization.from_bytes(jax.device_get(template), f.read())
    else:
        ckptr = _checkpointer()
        tree = {"step": np.asarray(meta["step"], np.int64)}
        for item in meta["items"]:
            restored = ckptr.restore(os.path.join(path, item), {"item": jax.device_get(template[item])})
            tree[item] = restored["item"]

    state = state.replace(step=tree["step"], params=tree["params"], opt_state=tree["opt_state"])
    if hasattr(state, "params_m"):
        state = state.replace(
            params_m=tree["params_m"],
            queue_query=tree["queue_query"],
            queue_cand=tree["queue_cand"],
            queue_idx=tree["queue_idx"],
            queue_ptr=tree["queue_ptr"],
        )
    return state, int(meta["epoch"])
