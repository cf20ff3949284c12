"""Device mesh + sharding setup.

TPU-native replacement for the reference's process-group init and DDP
(reference src/common/dist_utils.py:62-91, src/models/uniir_clip/clip_scorefusion/train.py:217-219).

The framework uses a single named mesh with two axes:
  * ``data``  -- batch / candidate-pool sharding over ICI (the only axis the
    UniIR workload needs: model <= ViT-L fits per chip; the scaling axes are
    global batch and pool size, see SURVEY.md section 5).
  * ``model`` -- reserved for tensor sharding of very large pools / future
    model growth; defaults to size 1.

All train/eval steps take `jax.sharding.NamedSharding`s built from this mesh;
XLA inserts the ICI collectives (the differentiable all_gather of positives in
the contrastive loss becomes a plain matmul over the globally-sharded batch).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build the (data, model) mesh over available devices.

    With `n_data=None` use every device on the data axis.  Call sites can use
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` to test multi-chip
    sharding on CPU.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devices)}"
    )
    dev_array = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a host-local pytree of numpy arrays as globally data-sharded jax arrays.

    Replacement for the reference's per-rank H2D copy (engine.py:20-22): the
    leading axis of every array leaf is sharded over the `data` mesh axis.
    """

    if jax.process_count() > 1:
        # Multi-host: each process holds its own loader's flat [q|p|n] block;
        # the global array is the HOST-MAJOR concatenation of those blocks
        # ([q_0|p_0|n_0 | q_1|p_1|n_1 | ...]).  The mesh enumerates devices in
        # process order (make_mesh uses jax.devices()), so each host's rows
        # land on its own chips with no cross-host transfer.  The losses
        # un-interleave this layout via split_flat_batch(..., n_hosts) -- the
        # train steps pass jax.process_count() automatically.
        assert mesh.devices.size == len(jax.devices()), (
            "multi-host shard_batch requires a mesh spanning every device"
        )

        def put_global(x):
            x = np.asarray(x)
            spec = P(DATA_AXIS, *([None] * (max(x.ndim, 1) - 1)))
            return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), x)

        return jax.tree_util.tree_map(put_global, batch)

    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def local_mesh_or_cpu(n: int = 1) -> Mesh:
    """Single-axis mesh helper for tests and single-chip runs."""
    return make_mesh(n_data=n)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Reference utils.is_main_process (src/models/uniir_clip/utils.py)."""
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process barrier at filesystem boundaries (reference
    dist.barrier discipline, mbeir_embedder.py:79-116, train.py:167).

    No-op on single-process runs; on pods every process must call it with
    the same `name` or the sync deadlocks."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def maybe_initialize_distributed() -> None:
    """Multi-host init (reference init_distributed_mode, dist_utils.py:62-91).

    On a single-host TPU slice or CPU this is a no-op; on multi-host pods the
    coordinator address is taken from the standard JAX env vars.
    """
    if int(os.environ.get("UNIIR_TPU_MULTIHOST", "0")):
        jax.distributed.initialize()
