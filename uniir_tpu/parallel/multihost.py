"""Multi-process (multi-host) smoke worker + launcher.

TPU-native replacement for the reference's `torchrun --nproc_per_node` entry
(reference src/models/uniir_clip/clip_scorefusion/train.py:306-331) in a form
that is testable on CPU: each worker process forces a virtual CPU platform,
joins a `jax.distributed` coordinator, and runs

  1. ONE global-negative contrastive train step on a host-major flat batch
     (the same `make_clip_train_step` used in production), and
  2. the embedder's part-file gather dance (write shard -> barrier -> rank 0
     concatenates; reference src/common/mbeir_embedder.py:123-191),

then writes its observed loss + gather result to a JSON file.  Running with
``--procs 1`` produces the single-process reference values; the committed
test (tests/test_multihost.py) asserts the 2-process run matches to 1e-6.

CLI (one invocation per process):
    python -m uniir_tpu.parallel.multihost \
        --coordinator localhost:56321 --procs 2 --pid 0 \
        --local-devices 4 --out /tmp/worker0.json
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile


GLOBAL_QUERIES = 8  # global batch (queries); must divide by n_procs


def _force_cpu(local_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={local_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def smoke_worker(coordinator: str, n_procs: int, pid: int, local_devices: int, out_path: str) -> None:
    _force_cpu(local_devices)
    import jax
    import numpy as np

    if n_procs > 1:
        jax.distributed.initialize(coordinator, num_processes=n_procs, process_id=pid)

    from uniir_tpu.core.mesh import make_mesh, shard_batch
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.train.optimizer import make_clip_optimizer
    from uniir_tpu.train.state import TrainState
    from uniir_tpu.train.steps import make_clip_train_step

    mesh = make_mesh()
    cfg = CLIP_CONFIGS["test-tiny"]
    model = CLIPScoreFusion(cfg)

    # Deterministic GLOBAL data on every process; each host slices host-major.
    rng = np.random.default_rng(0)
    gq = GLOBAL_QUERIES
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2 * gq, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2 * gq, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2 * gq,), np.int32)

    # Global flat layout is the host-major concat [q_0|p_0 | q_1|p_1 | ...];
    # rows [0:gq] are queries, [gq:2gq] their positives.  Host i's local block:
    lq = gq // n_procs
    rows = list(range(pid * lq, (pid + 1) * lq)) + list(range(gq + pid * lq, gq + (pid + 1) * lq))
    local = {
        "txt_batched": txt[rows],
        "image_batched": img[rows],
        "txt_mask_batched": mask[rows],
        "image_mask_batched": mask[rows],
    }

    params = model.init(jax.random.PRNGKey(0), txt[:2], img[:2], mask[:2], mask[:2])["params"]
    tx = make_clip_optimizer(params, learning_rate=1e-3, total_steps=10)
    state = TrainState.create(params=params, tx=tx)
    step = make_clip_train_step(model, mesh=mesh)

    state, metrics = step(state, shard_batch(mesh, local))
    loss = float(jax.device_get(metrics["loss"]))
    acc = float(jax.device_get(metrics["inbatch_accuracy"]))

    # Embedder part-file gather (reference mbeir_embedder.py:123-191): every
    # process writes its contiguous shard; rank 0 concatenates after a barrier.
    gather_dir = os.path.join(os.path.dirname(out_path), "gather")
    os.makedirs(gather_dir, exist_ok=True)
    shard = np.arange(pid * lq, (pid + 1) * lq, dtype=np.int64)
    part = os.path.join(gather_dir, f"ids.npy.part{pid}")
    np.save(part, shard)
    gathered = None
    if n_procs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("parts_written")
        if pid == 0:
            gathered = np.concatenate(
                [np.load(os.path.join(gather_dir, f"ids.npy.part{r}.npy")) for r in range(n_procs)]
            )
        multihost_utils.sync_global_devices("gather_done")
    else:
        gathered = np.load(part + ".npy")

    result = {
        "pid": pid,
        "n_procs": n_procs,
        "n_devices": len(jax.devices()),
        "loss": loss,
        "accuracy": acc,
        "step": int(jax.device_get(state.step)),
        "gathered": None if gathered is None else gathered.tolist(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"multihost smoke pid={pid}/{n_procs}: loss={loss:.6f} OK")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_smoke(n_procs: int, local_devices: int = 4, out_dir: str | None = None, timeout: int = 600) -> list[dict]:
    """Spawn `n_procs` worker processes; return their JSON results (by pid)."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="uniir_multihost_")
    coordinator = f"localhost:{free_port()}"
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(n_procs):
        out = os.path.join(out_dir, f"worker{pid}.json")
        outs.append(out)
        cmd = [
            sys.executable, "-m", "uniir_tpu.parallel.multihost",
            "--coordinator", coordinator, "--procs", str(n_procs), "--pid", str(pid),
            "--local-devices", str(local_devices), "--out", out,
        ]
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    results = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"multihost worker {pid} timed out")
        if p.returncode != 0:
            raise RuntimeError(f"multihost worker {pid} failed (rc={p.returncode}):\n{stdout[-4000:]}")
        with open(outs[pid]) as f:
            results.append(json.load(f))
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--procs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    smoke_worker(args.coordinator, args.procs, args.pid, args.local_devices, args.out)


if __name__ == "__main__":
    main()
