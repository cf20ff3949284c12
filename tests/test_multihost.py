"""Real 2-process jax.distributed integration test (VERDICT round-1 item 4).

Spawns two worker subprocesses that `jax.distributed.initialize` against a
local coordinator, each with 4 virtual CPU devices (8 global), run ONE
`make_clip_train_step` on the host-major global batch, and run the embedder's
part-file gather.  The loss must match the single-process value to 1e-6
(reference-equivalent behavior under test: the NCCL gather + DDP loss,
src/common/mbeir_embedder.py:63-191).

These cover the true multi-host code paths that the in-process 8-device mesh
cannot: `jax.make_array_from_process_local_data` in core/mesh.shard_batch and
`multihost_utils.sync_global_devices` at filesystem boundaries.
"""

import numpy as np
import pytest

from uniir_tpu.parallel.multihost import GLOBAL_QUERIES, launch_smoke


@pytest.mark.multihost
def test_two_process_train_step_matches_single(tmp_path):
    ref = launch_smoke(1, local_devices=8, out_dir=str(tmp_path / "ref"))[0]
    two = launch_smoke(2, local_devices=4, out_dir=str(tmp_path / "two"))

    assert ref["n_devices"] == 8
    assert all(r["n_devices"] == 8 for r in two)
    assert all(r["step"] == 1 for r in two)

    # same global batch, same init => identical loss across layouts and procs
    np.testing.assert_allclose(two[0]["loss"], ref["loss"], atol=1e-6)
    np.testing.assert_allclose(two[1]["loss"], ref["loss"], atol=1e-6)
    np.testing.assert_allclose(two[0]["accuracy"], ref["accuracy"], atol=1e-6)

    # part-file gather: rank 0 reconstructed the full contiguous id range
    assert two[0]["gathered"] == list(range(GLOBAL_QUERIES))
    assert two[1]["gathered"] is None  # only rank 0 gathers
    assert ref["gathered"] == list(range(GLOBAL_QUERIES))
