"""Host-major flat-batch layout: the losses with n_hosts=H over the
concatenation of per-host [q|p|n] blocks must equal the single-host losses
over the canonically regrouped [q_all|p_all|n_all] batch — values AND
gradients.  This is the contract between core.mesh.shard_batch's multi-host
branch (make_array_from_process_local_data in process order) and
train.losses.split_flat_batch(n_hosts=...).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniir_tpu.train.losses import (
    inbatch_contrastive_loss,
    momentum_distill_contrastive_loss,
    split_flat_batch,
)

H = 2  # simulated hosts
BS_L = 4  # per-host queries
NEG = 2
D = 8


def make_blocks(rng, hard_neg_num):
    """Per-host flat blocks + the canonical regrouped layout."""
    blocks, qs, ps, ns = [], [], [], []
    for _ in range(H):
        q = rng.standard_normal((BS_L, D)).astype(np.float32)
        p = rng.standard_normal((BS_L, D)).astype(np.float32)
        n = rng.standard_normal((BS_L * hard_neg_num, D)).astype(np.float32)
        blocks.append(np.concatenate([q, p, n], axis=0))
        qs.append(q), ps.append(p), ns.append(n)
    host_major = np.concatenate(blocks, axis=0)
    canonical = np.concatenate(qs + ps + ns, axis=0)
    return host_major, canonical


def test_split_flat_batch_host_major():
    rng = np.random.default_rng(0)
    host_major, canonical = make_blocks(rng, NEG)
    bs = H * BS_L
    q1, p1, n1 = split_flat_batch(jnp.asarray(canonical), bs, NEG, n_hosts=1)
    q2, p2, n2 = split_flat_batch(jnp.asarray(host_major), bs, NEG, n_hosts=H)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


@pytest.mark.parametrize("hard_neg_num,in_batch_neg_num", [(0, 0), (NEG, 3)])
def test_inbatch_loss_layout_equivalence(hard_neg_num, in_batch_neg_num):
    rng = np.random.default_rng(1)
    host_major, canonical = make_blocks(rng, hard_neg_num)
    bs = H * BS_L
    scale = jnp.float32(50.0)

    def loss_hm(e):
        return inbatch_contrastive_loss(e, bs, scale, hard_neg_num, in_batch_neg_num, n_hosts=H)["loss"]

    def loss_c(e):
        return inbatch_contrastive_loss(e, bs, scale, hard_neg_num, in_batch_neg_num, n_hosts=1)["loss"]

    v_hm, g_hm = jax.value_and_grad(loss_hm)(jnp.asarray(host_major))
    v_c, g_c = jax.value_and_grad(loss_c)(jnp.asarray(canonical))
    np.testing.assert_allclose(float(v_hm), float(v_c), rtol=1e-6)

    # gradients must match row-for-row after un-permuting the layout
    g_hm = np.asarray(g_hm).reshape(H, (2 + hard_neg_num) * BS_L, D)
    gq = g_hm[:, :BS_L].reshape(bs, D)
    gp = g_hm[:, BS_L : 2 * BS_L].reshape(bs, D)
    gn = g_hm[:, 2 * BS_L :].reshape(bs * hard_neg_num, D)
    np.testing.assert_allclose(np.concatenate([gq, gp, gn]), np.asarray(g_c), atol=1e-6)


def test_momentum_loss_layout_equivalence():
    rng = np.random.default_rng(2)
    bs = H * BS_L
    Q = 16  # queue rows

    # per-host blocks for online and momentum embeddings; dids are host-major
    hm, canon = make_blocks(rng, NEG)
    hm_m, canon_m = make_blocks(np.random.default_rng(3), NEG)
    p_dids = rng.integers(0, 50, bs).astype(np.int64)
    n_dids = rng.integers(0, 50, (bs, NEG)).astype(np.int64)
    qq = rng.standard_normal((Q, D)).astype(np.float32)
    qc = rng.standard_normal((Q, D)).astype(np.float32)
    qi = rng.integers(0, 50, Q).astype(np.int64)
    temp, alpha = jnp.float32(0.07), jnp.float32(0.4)

    out_hm = momentum_distill_contrastive_loss(
        jnp.asarray(hm), jnp.asarray(hm_m), bs, p_dids, qq, qc, qi, temp, alpha,
        hard_neg_num=NEG, n_dids=n_dids, n_hosts=H,
    )
    out_c = momentum_distill_contrastive_loss(
        jnp.asarray(canon), jnp.asarray(canon_m), bs, p_dids, qq, qc, qi, temp, alpha,
        hard_neg_num=NEG, n_dids=n_dids, n_hosts=1,
    )
    np.testing.assert_allclose(float(out_hm["loss"]), float(out_c["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_hm["enqueue_query"]), np.asarray(out_c["enqueue_query"]), atol=1e-7
    )


def test_shard_batch_multihost_layout_math():
    """Single-process check of the index math shard_batch's multi-host branch
    relies on: row-sharding the host-major global array over a process-ordered
    mesh gives each 'host' exactly its own block."""
    rng = np.random.default_rng(4)
    host_major, _ = make_blocks(rng, NEG)
    per_host = (2 + NEG) * BS_L
    for h in range(H):
        np.testing.assert_array_equal(
            host_major[h * per_host : (h + 1) * per_host],
            host_major.reshape(H, per_host, D)[h],
        )
