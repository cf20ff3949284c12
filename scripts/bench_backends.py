"""Side-by-side embed throughput of the serving backends (real chip).

Runs bench.bench_embed per backend in one process:
    bf16 | int8 xla (dynamic) | int8 wonly (weight-only) | int8 static (fused MLP)

Usage: python scripts/bench_backends.py [--only static,...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="bf16,xla,wonly,static,static-fusedmlp")
    args = ap.parse_args()
    only = args.only.split(",")

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize bakes the TPU platform; the env var alone does not
        # reroute (see bench.py main)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform != "cpu"
    results = {}
    for name in only:
        # static = static scales through plain XLA matmuls (the default since
        # round 4: 1304 vs 889 pairs/s on v5e); static-fusedmlp opts into the
        # Pallas MLP megakernel (UNIIR_INT8_MLP=fused).  "static-xlamlp" is
        # kept as an alias for the old name.
        os.environ["UNIIR_INT8_MLP"] = "fused" if name == "static-fusedmlp" else "xla"
        backend = {"bf16": "xla", "static-fusedmlp": "static", "static-xlamlp": "static"}.get(name, name)
        os.environ["UNIIR_INT8_BACKEND"] = backend
        try:
            pairs = bench.bench_embed(jax, jnp, on_tpu, quant=name != "bf16")
            results[name] = pairs
            print(f"{name:>8}: {pairs:9.2f} pairs/s", flush=True)
        except Exception as e:
            print(f"{name:>8}: FAILED {e!r}", flush=True)
        bench._free_device(jax)
    if "bf16" in results:
        for name, v in results.items():
            print(f"{name:>8}: {v / results['bf16']:.4f}x bf16")


if __name__ == "__main__":
    main()
