"""Per-layer attention kernel shootout at CLIP-L shapes (real TPU).

Device time via the amortized scan method (see docs/PERFORMANCE.md): the op
runs N times inside one jit with a data dependency between repeats (carry
q <- q + out * 1e-9), and the 1-rep vs N-rep walls are differenced -- this
rig's remote-TPU relay floors every per-call host fetch at ~36 ms.

Usage: python scripts/bench_attn.py [--causal] [--batch 256] [--len 257]
"""

import argparse
import os
import time

import numpy as np


def bench_variant(jax, jnp, fn, q, k, v, reps=8, tries=4):
    def make(r):
        @jax.jit
        def f(q, k, v):
            def body(carry, _):
                out = fn(carry, k, v)
                return carry + out.astype(carry.dtype) * jnp.bfloat16(1e-9), ()

            final, _ = jax.lax.scan(body, q, None, length=r)
            return final

        return f

    f1, fn_ = make(1), make(reps)

    def run(f):
        times = []
        for _ in range(tries):
            t0 = time.perf_counter()
            out = f(q, k, v)
            float(jnp.sum(out[0, :2, :2].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        return min(times)

    t1, tn = run(f1), run(fn_)
    return (tn - t1) / (reps - 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--causal", action="store_true")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--len", dest="seqlen", type=int, default=257)
    parser.add_argument(
        "--l_valid", type=int, default=None,
        help="padded-flat contract: physical --len, true length here "
        "(e.g. --len 264 --l_valid 257; engages split-K when lv%%128==1)",
    )
    parser.add_argument("--heads", type=int, default=16)
    parser.add_argument("--head_dim", type=int, default=64)
    parser.add_argument("--variants", type=str, default="einsum,paired,stack1,stack2,stack4,stack8")
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize bakes the TPU platform; env alone does not reroute
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from uniir_tpu.ops import attention_pallas as ap

    B, L, H, D = args.batch, args.seqlen, args.heads, args.head_dim
    W = H * D
    scale = D**-0.5
    rng = np.random.default_rng(0)
    q = jax.device_put(jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16))

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    causal = args.causal

    variants = {}
    if "einsum" in args.variants:
        variants["einsum"] = lambda q, k, v: ap._einsum_flat(q, k, v, H, scale, causal)
    if "paired" in args.variants:
        variants["paired(r2)"] = lambda q, k, v: ap.mha_paired(q, k, v, H, scale, interp, causal)
    lv = args.l_valid
    for r in (1, 2, 4, 8, 16):
        if f"stack{r}" in args.variants:
            variants[f"stack rows={r}"] = (
                lambda q, k, v, r=r: ap.mha_paired_stack(
                    q, k, v, H, scale, interp, causal, rows=r, l_valid=lv
                )
            )
    for g in (2, 4, 8):
        if f"pg{g}" in args.variants:
            variants[f"stack pg={g}"] = (
                lambda q, k, v, g=g: ap.mha_paired_stack(q, k, v, H, scale, interp, causal, rows=1, pair_group=g)
            )
    for impl in ("matmul_only", "no_max", "exp2"):
        if impl in args.variants:
            variants[f"stack {impl}"] = (
                lambda q, k, v, impl=impl: ap.mha_paired_stack(
                    q, k, v, H, scale, interp, causal, rows=1, softmax_impl=impl
                )
            )

    # correctness spot-check before timing.  Under --l_valid, the einsum
    # reference runs on the sliced-to-lv arrays (it has no mask) and only
    # rows < l_valid are compared.
    nchk = L if lv is None else lv
    ref = np.asarray(
        ap._einsum_flat(q[:2, :nchk], k[:2, :nchk], v[:2, :nchk], H, scale, causal),
        np.float32,
    )
    for name, fn in variants.items():
        out = np.asarray(fn(q[:2], k[:2], v[:2]), np.float32)
        err = np.abs(out[:, :nchk] - ref[:, :nchk]).max()
        status = "OK" if err < 6e-2 else f"MISMATCH {err:.3f}"
        print(f"{name:16s} check: {status}")

    flop = 4 * B * H * nchk * nchk * D  # QK^T + PV, useful (l_valid) flops
    for name, fn in variants.items():
        dt = bench_variant(jax, jnp, fn, q, k, v)
        print(f"{name:16s} {dt*1e3:8.2f} ms/layer   {flop/dt/1e12:6.1f} TFLOPs  ({B}x{L}x{H}x{D}{' causal' if causal else ''})")


if __name__ == "__main__":
    main()
