"""Train state pytrees.

`TrainState` covers the CLIP family.  `MomentumTrainState` adds the BLIP
machinery as explicit functional state: momentum params (EMA twin), the
query/cand/idx queues and pointer (mutable buffers in the reference,
blip_sf.py:60-67), all updated inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1, params=optax.apply_updates(self.params, updates), opt_state=new_opt)


class MomentumTrainState(struct.PyTreeNode):
    """BLIP train state: params + EMA twin + contrastive queues.

    Queues are row-major [queue_size, D]; idx queue init -100 (never matches a
    real hashed did, reference blip_sf.py:63).
    """

    step: jnp.ndarray
    params: Any
    params_m: Any
    opt_state: Any
    queue_query: jnp.ndarray
    queue_cand: jnp.ndarray
    queue_idx: jnp.ndarray
    queue_ptr: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    momentum: float = struct.field(pytree_node=False, default=0.995)

    @classmethod
    def create(cls, params, tx, queue_size: int, embed_dim: int, momentum: float = 0.995, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        # random-normalized init, matching register_buffer(randn)+normalize
        qq = jax.random.normal(k1, (queue_size, embed_dim), jnp.float32)
        qc = jax.random.normal(k2, (queue_size, embed_dim), jnp.float32)
        qq = qq / jnp.linalg.norm(qq, axis=-1, keepdims=True)
        qc = qc / jnp.linalg.norm(qc, axis=-1, keepdims=True)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            params_m=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            queue_query=qq,
            queue_cand=qc,
            queue_idx=jnp.full((queue_size,), -100, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
            queue_ptr=jnp.zeros((), jnp.int32),
            tx=tx,
            momentum=momentum,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt)

    def momentum_update(self):
        """EMA: params_m = m*params_m + (1-m)*params (reference blip_sf.py:344-348)."""
        m = self.momentum
        new_m = jax.tree_util.tree_map(lambda pm, p: pm * m + p * (1.0 - m), self.params_m, self.params)
        return self.replace(params_m=new_m)

    def enqueue(self, query_feats: jnp.ndarray, cand_feats: jnp.ndarray, idxs: jnp.ndarray):
        """Ring-buffer dequeue/enqueue (reference blip_sf.py:350-366).

        In the reference each rank enqueues the all-gathered global batch; here
        the inputs are already global (the jit view), so a single
        dynamic_update_slice is the whole operation.  Requires
        queue_size % global_batch == 0 (same invariant as the reference).
        """
        bs = query_feats.shape[0]
        # dynamic_update_slice clamps out-of-range starts, which would silently
        # corrupt the ring buffer -- enforce the reference's invariant
        # queue_size %% global_batch == 0 (reference blip_sf.py:359)
        assert self.queue_query.shape[0] % bs == 0, (
            f"queue_size {self.queue_query.shape[0]} must be divisible by global batch {bs}"
        )
        ptr = self.queue_ptr
        qq = jax.lax.dynamic_update_slice(self.queue_query, query_feats.astype(self.queue_query.dtype), (ptr, 0))
        qc = jax.lax.dynamic_update_slice(self.queue_cand, cand_feats.astype(self.queue_cand.dtype), (ptr, 0))
        qi = jax.lax.dynamic_update_slice(self.queue_idx, idxs.astype(self.queue_idx.dtype).reshape(-1), (ptr,))
        new_ptr = (ptr + bs) % self.queue_query.shape[0]
        return self.replace(queue_query=qq, queue_cand=qc, queue_idx=qi, queue_ptr=new_ptr)
