"""Contrastive losses over the globally-sharded flat batch.

TPU-native formulation of the reference loss
(reference src/models/uniir_clip/clip_scorefusion/clip_sf.py:68-147):

The reference runs per-rank batches and calls the *differentiable*
``torch.distributed.nn.all_gather`` on the positives, scoring each local query
against ``bs * world`` candidates with targets ``rank*bs + arange(bs)``
(clip_sf.py:101-136).  Under jit over a data-sharded global batch the same
computation is simply ``q @ p.T`` on the *global* arrays with targets
``arange(global_bs)`` -- XLA partitions the matmul and inserts the all-gather
on ICI, and the gradient w.r.t. every rank's positives flows by construction
(the semantics torch needed the special differentiable collective for).

Static layout (see uniir_tpu.data.collator): rows [0,bs) queries,
[bs,2bs) positives, [2bs, 2bs+bs*neg) hard negatives.

Memory note: under the data-sharded mesh XLA partitions ``q @ p.T`` so each
device holds only its [bs/n_dev, bs] logits block against the gathered
positives -- the row-sharded formulation DisCo-CLIP (arXiv:2304.08480)
implements manually in torch falls out of the SPMD partitioner here.  For
batches beyond HBM, chunked/recomputed losses (Inf-CL style) are future work.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def split_flat_batch(
    embeddings: jnp.ndarray, bs: int, hard_neg_num: int = 0, n_hosts: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Slice the static flat layout into (q, p, n) embeddings.

    `bs` is always the GLOBAL query count.  With `n_hosts` > 1 the global
    batch is HOST-MAJOR: each host's loader emits its own [q|p|n] flat block
    and `core.mesh.shard_batch` concatenates the blocks in process order
    (jax.make_array_from_process_local_data), so the layout is
    [q_0|p_0|n_0 | q_1|p_1|n_1 | ...].  All slicing is static reshaping, so
    the SPMD partitioner keeps it local to each host's shard.
    """
    if n_hosts > 1:
        assert bs % n_hosts == 0, (bs, n_hosts)
        bs_l = bs // n_hosts
        per_host = (2 + hard_neg_num) * bs_l
        D = embeddings.shape[-1]
        e = embeddings.reshape(n_hosts, per_host, D)
        q = e[:, :bs_l].reshape(bs, D)
        p = e[:, bs_l : 2 * bs_l].reshape(bs, D)
        n = None
        if hard_neg_num > 0:
            n = e[:, 2 * bs_l :].reshape(bs, hard_neg_num, D)
        return q, p, n
    q = embeddings[:bs]
    p = embeddings[bs : 2 * bs]
    n = None
    if hard_neg_num > 0:
        n = embeddings[2 * bs : 2 * bs + bs * hard_neg_num].reshape(bs, hard_neg_num, -1)
    return q, p, n


def inbatch_contrastive_loss(
    embeddings: jnp.ndarray,
    bs: int,
    logit_scale: jnp.ndarray,
    hard_neg_num: int = 0,
    in_batch_neg_num: int = 0,
    n_hosts: int = 1,
) -> Dict[str, jnp.ndarray]:
    """In-batch contrastive CE loss (reference clip_sf.py:68-147).

    Without hard negatives: CE over ``q @ p.T * scale`` with diagonal targets.
    With hard negatives: NLL of the positive against [pos | hard negs |
    in-batch positives-of-others] (reference :105-131).  `bs` here is the
    *global* batch, so in-batch negatives span all devices (a strict superset
    of the reference's per-rank hard-neg pool).

    Divergence note: the reference's in-batch-negs expression
    ``p.unsqueeze(1).expand(-1,bs,-1)[eye==0]`` (clip_sf.py:114) actually
    selects each query's OWN positive bs-1 times (torch expand is along dim 1)
    -- contradicting its comment "positive candidates from other queries".
    We implement the documented intent: row i's negatives are p_j, j != i.
    """
    q, p, n = split_flat_batch(embeddings, bs, hard_neg_num, n_hosts)
    q = l2_normalize(q)
    p = l2_normalize(p)

    if hard_neg_num > 0:
        n = l2_normalize(n)
        k = min(bs - 1, in_batch_neg_num)
        if k > 0:
            # Row i's in-batch negatives: first k of [p_j for j != i] in order
            # (reference's eye-mask + reshape + [:, :k], clip_sf.py:113-115).
            j = jnp.arange(k)[None, :]  # [1, k]
            i = jnp.arange(bs)[:, None]  # [bs, 1]
            idx = jnp.where(j < i, j, j + 1)  # skip the diagonal
            in_batch_negs = p[idx]  # [bs, k, D]
            aug_n = jnp.concatenate([n, in_batch_negs], axis=1)
        else:
            aug_n = n
        pos_scores = jnp.sum(q * p, axis=-1) * logit_scale  # [bs]
        neg_scores = jnp.einsum("bd,bkd->bk", q, aug_n) * logit_scale  # [bs, negs]
        logit_matrix = jnp.concatenate([pos_scores[:, None], neg_scores], axis=1)
        lsm = jax.nn.log_softmax(logit_matrix, axis=1)
        loss = jnp.mean(-lsm[:, 0])
        accuracy = jnp.mean((jnp.argmax(logit_matrix, axis=1) == 0).astype(jnp.float32))
    else:
        score = (q @ p.T) * logit_scale  # [bs, bs] -- global negatives
        targets = jnp.arange(bs)
        lsm = jax.nn.log_softmax(score, axis=1)
        loss = -jnp.mean(jnp.take_along_axis(lsm, targets[:, None], axis=1))
        accuracy = jnp.mean((jnp.argmax(score, axis=1) == targets).astype(jnp.float32))

    return {"loss": loss, "accuracy": accuracy}


def momentum_distill_contrastive_loss(
    embeddings: jnp.ndarray,
    embeddings_m: jnp.ndarray,
    bs: int,
    p_dids: jnp.ndarray,
    queue_query: jnp.ndarray,
    queue_cand: jnp.ndarray,
    queue_idx: jnp.ndarray,
    temp: jnp.ndarray,
    alpha: jnp.ndarray,
    hard_neg_num: int = 0,
    n_dids: Optional[jnp.ndarray] = None,
    n_hosts: int = 1,
) -> Dict[str, jnp.ndarray]:
    """ALBEF-style momentum-distilled symmetric contrastive loss for BLIP
    (reference src/models/uniir_blip/blip_scorefusion/blip_sf.py:174-313).

    queue_* are row-major [queue_size, D] / [queue_size] (the reference keeps
    column-major [D, queue_size]; row-major is the natural TPU layout).
    p_dids: hashed positive doc ids [bs] -- duplicate candidates across
    batch+queue count as positives (pos_idx matching, reference :232-234).

    Returns loss, accuracy, and the (q_m, c_m, idx) rows to enqueue.
    """
    # NOTE: with n_hosts > 1, p_dids / n_dids arrive host-major too (same
    # per-host concatenation), so their pairing with q/p rows is preserved.
    q, p, n = split_flat_batch(embeddings, bs, hard_neg_num, n_hosts)
    q_m, p_m, n_m = split_flat_batch(embeddings_m, bs, hard_neg_num, n_hosts)
    q, p = l2_normalize(q), l2_normalize(p)
    q_m, p_m = l2_normalize(q_m), l2_normalize(p_m)

    pc_idx = p_dids.reshape(bs, 1)  # [bs, 1]

    if hard_neg_num > 0:
        n_m = l2_normalize(n_m)
        hard_nc_num = bs * hard_neg_num
        nc_idx_flat = n_dids.reshape(-1)  # [bs*neg]
        idx_all = jnp.concatenate([p_dids, nc_idx_flat, queue_idx[hard_nc_num:]])[None, :]
        cand_m_all = jnp.concatenate([p_m, n_m.reshape(hard_nc_num, -1), queue_cand[hard_nc_num:]], axis=0)
    else:
        idx_all = jnp.concatenate([p_dids, queue_idx])[None, :]  # [1, bs+Q]
        cand_m_all = jnp.concatenate([p_m, queue_cand], axis=0)  # [bs+Q, D]

    query_m_all = jnp.concatenate([q_m, queue_query], axis=0)  # [bs+Q, D]

    pos_idx = (pc_idx == idx_all).astype(jnp.float32)  # [bs, bs+Q]
    pre_norm_sim_targets = pos_idx
    sim_targets = pos_idx / jnp.sum(pos_idx, axis=1, keepdims=True)

    # soft targets from the momentum pair (stop-gradient side)
    sim_q2pc_m = (q_m @ cand_m_all.T) / temp
    sim_pc2q_m = (p_m @ query_m_all.T) / temp
    sim_q2pc_targets = alpha * jax.nn.softmax(sim_q2pc_m, axis=1) + (1 - alpha) * sim_targets
    sim_pc2q_targets = alpha * jax.nn.softmax(sim_pc2q_m, axis=1) + (1 - alpha) * sim_targets
    sim_q2pc_targets = jax.lax.stop_gradient(sim_q2pc_targets)
    sim_pc2q_targets = jax.lax.stop_gradient(sim_pc2q_targets)

    sim_q2pc = (q @ jax.lax.stop_gradient(cand_m_all).T) / temp
    sim_pc2q = (p @ jax.lax.stop_gradient(query_m_all).T) / temp

    loss_q2pc = jnp.mean(-jnp.sum(jax.nn.log_softmax(sim_q2pc, axis=1) * sim_q2pc_targets, axis=1))
    loss_pc2q = jnp.mean(-jnp.sum(jax.nn.log_softmax(sim_pc2q, axis=1) * sim_pc2q_targets, axis=1))
    loss = (loss_q2pc + loss_pc2q) / 2

    max_idxs = jnp.argmax(sim_q2pc, axis=1)
    accuracy = jnp.mean(jnp.take_along_axis(pre_norm_sim_targets, max_idxs[:, None], axis=1))

    return {
        "loss": loss,
        "accuracy": accuracy,
        "enqueue_query": jax.lax.stop_gradient(q_m),
        "enqueue_pos_cand": jax.lax.stop_gradient(p_m),
        "enqueue_neg_cand": jax.lax.stop_gradient(n_m[:, 0, :]) if hard_neg_num > 0 else None,
    }
