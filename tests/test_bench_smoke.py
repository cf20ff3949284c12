"""CPU smokes for bench.py's measurement paths.

The driver runs bench.py unattended at the end of every round; these lock
the two fragile formulations on the virtual-CPU backend:
  * bench_train_step's donated, state-threaded scan (round 5: the
    non-donating variant forced 251 XLA remat ops and under-measured the
    engine by 38%) must execute end to end and yield a positive rate.
  * EmbedSetup's device-resident param reuse across backends (jitted init +
    on-device quantize_tree_jax) must produce params usable by both the
    bf16 and quantized models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bench


def test_bench_train_step_cpu_smoke():
    rate = bench.bench_train_step(jax, jnp, on_tpu=False)
    assert np.isfinite(rate) and rate > 0, rate


def test_embed_setup_params_reuse_across_backends(monkeypatch):
    setup = bench.EmbedSetup(jax, jnp, on_tpu=False)
    p_bf16 = setup.params_for(jax, quant=False)
    assert p_bf16 is setup.params()  # no copy for the float path

    monkeypatch.setenv("UNIIR_INT8_BACKEND", "static")
    p_q = setup.params_for(jax, quant=True)
    flat = jax.tree_util.tree_leaves(p_q)
    assert any(leaf.dtype == jnp.int8 for leaf in flat)
    # calibration is cached: second call must not re-probe (same object)
    scales_first = setup._act_scales
    setup.params_for(jax, quant=True)
    assert setup._act_scales is scales_first

    # quantized model must run with the device-quantized tree
    model_q = setup.make_model(True)
    emb = model_q.apply({"params": p_q}, setup.txt2, setup.img2, setup.mask2, setup.mask2)
    assert np.all(np.isfinite(np.asarray(emb, np.float32)))


def test_embed_setup_params_survive_free(monkeypatch):
    """_free_device deletes buffers between benches; params() must rebuild."""
    setup = bench.EmbedSetup(jax, jnp, on_tpu=False)
    before = setup.params()
    for leaf in jax.tree_util.tree_leaves(before):
        leaf.delete()
    after = setup.params()
    assert all(not leaf.is_deleted() for leaf in jax.tree_util.tree_leaves(after))
