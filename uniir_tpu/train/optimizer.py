"""Optimizer + schedule construction (optax).

Replicates the reference's split AdamW param groups
(reference src/models/uniir_clip/clip_scorefusion/train.py:52-61,195-199):
params with ndim < 2 or whose name contains bn/ln/bias/logit_scale get
weight_decay 0; the rest get 0.2 (CLIP) -- expressed as an optax.adamw decay
mask over the param pytree.  Cosine annealing to 0 over total steps matches
CosineAnnealingLR(T_max=t_total, eta_min=0) (train.py:281-284).

CLIP-FF adds a third group: T5 fusion params at their own learning rate
(reference clip_featurefusion/train.py:52-66) -- expressed with
optax.multi_transform over a {fusion, backbone} label tree.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def _name_matches(path: tuple, subs=("bn", "ln", "bias", "logit_scale")) -> bool:
    joined = "/".join(str(getattr(k, "key", k)) for k in path).lower()
    return any(s in joined for s in subs)


def clip_decay_mask(params) -> dict:
    """True where weight decay applies (the 'rest' group)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: not (p.ndim < 2 or _name_matches(path)), params
    )


def cosine_schedule(lr: float, total_steps: int, warmup_steps: int = 0) -> optax.Schedule:
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps, decay_steps=total_steps, end_value=0.0
        )
    return optax.cosine_decay_schedule(init_value=lr, decay_steps=max(1, total_steps), alpha=0.0)


def make_clip_optimizer(
    params,
    learning_rate: float,
    total_steps: int,
    weight_decay: float = 0.2,
    warmup_steps: int = 0,
    accumulation_steps: int = 1,
    fusion_learning_rate: Optional[float] = None,
    fusion_path_sub: str = "t5",
) -> optax.GradientTransformation:
    """AdamW(betas=(0.9,0.98), eps=1e-6) with the CLIP decay-mask groups."""
    sched = cosine_schedule(learning_rate, total_steps, warmup_steps)

    def adamw(lr_sched):
        return optax.adamw(
            learning_rate=lr_sched,
            b1=0.9,
            b2=0.98,
            eps=1e-6,
            weight_decay=weight_decay,
            mask=clip_decay_mask,
        )

    if fusion_learning_rate is not None:
        fusion_sched = cosine_schedule(fusion_learning_rate, total_steps, warmup_steps)
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "fusion" if any(fusion_path_sub in str(getattr(k, "key", k)).lower() for k in path) else "backbone",
            params,
        )
        tx = optax.multi_transform({"backbone": adamw(sched), "fusion": adamw(fusion_sched)}, labels)
    else:
        tx = adamw(sched)

    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def make_blip_optimizer(
    params,
    learning_rate: float,
    total_steps: int,
    weight_decay: float = 0.05,
    warmup_steps: int = 0,
    accumulation_steps: int = 1,
    freeze_path_sub: Optional[str] = None,
) -> optax.GradientTransformation:
    """BLIP: single AdamW group, wd 0.05 (reference uniir_blip/train.py:192-197).

    `freeze_path_sub` routes every param whose path contains the substring to
    `optax.set_to_zero()` -- BLIP-SF passes "crossattention" to reproduce the
    reference's `requires_grad=False` freeze (reference
    blip_scorefusion/blip_sf.py:75-78).  torch AdamW never touches a no-grad
    param (no `.grad` => no step AND no decay), so the frozen subtree must be
    excluded from the adamw transform entirely: a bare decay mask is not
    enough, because optax.adamw still applies weight decay to zero-grad
    leaves, silently decaying the frozen pretrained weights toward zero.
    """
    sched = cosine_schedule(learning_rate, total_steps, warmup_steps)
    adamw = optax.adamw(learning_rate=sched, weight_decay=weight_decay)
    if freeze_path_sub is not None:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if _name_matches(path, (freeze_path_sub,)) else "train",
            params,
        )
        tx = optax.multi_transform({"train": adamw, "frozen": optax.set_to_zero()}, labels)
    else:
        tx = adamw
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
