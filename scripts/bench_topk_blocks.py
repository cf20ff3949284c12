"""Block-height matrix for the PRODUCTION top-k sweep kernels.

`scripts/bench_topk_phases.py --phase4/5` measured EXPERIMENTAL chunked
kernels whose bucket granularity grows with the block (coarser buckets =
cheaper sweep but a wider rescore).  The production kernels keep CHUNK-row
bucket granularity at any DMA block height (ops/topk_pallas.py), which adds
an S-way sub-chunk reduce per block -- this script measures THAT kernel
across block heights so the BLOCK_ROWS_* defaults are set from data, not
from the experimental kernel's numbers.

Run: python scripts/bench_topk_blocks.py [--rows 5600000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
import jax.numpy as jnp

REPS, OUTER = 5, 3


def amortized(make, reps=None, outer=None):
    reps = reps or REPS
    outer = outer or OUTER
    f1, fn = make(1), make(reps)

    def run(f):
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            float(jnp.sum(jnp.asarray(out)[:1, :1].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (run(fn) - run(f1)) / (reps - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_600_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--nq", type=int, default=256)
    args = ap.parse_args()

    from uniir_tpu.ops.topk_pallas import CHUNK, bucket_max_scores, bucket_max_scores_i8, quantize_pool

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        global REPS, OUTER
        args.rows, args.nq = 4 * CHUNK, 16
        REPS, OUTER = 2, 2
    interp = not on_tpu

    n = args.rows
    pad = (-n) % (8 * CHUNK)
    pool = jax.random.normal(jax.random.PRNGKey(0), (n + pad, args.dim), jnp.bfloat16)
    queries = jax.random.normal(jax.random.PRNGKey(1), (args.nq, args.dim), jnp.bfloat16)
    pq, ps = quantize_pool(pool)
    jax.block_until_ready((pool, queries, pq, ps))

    blocks = [CHUNK, 2 * CHUNK, 4 * CHUNK, 8 * CHUNK] if on_tpu else [CHUNK, 2 * CHUNK]

    def make_bf16(r, block):
        @jax.jit
        def f(q, pool_):
            def body(c, _):
                m = bucket_max_scores(c, pool_, valid_n=n, interpret=interp, block_rows=block)
                return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]

            _, out = jax.lax.scan(body, q, None, length=r)
            return out

        return lambda: f(queries, pool)

    def make_i8(r, block):
        @jax.jit
        def f(q, pq_, ps_):
            def body(c, _):
                m = bucket_max_scores_i8(c, pq_, ps_, valid_n=n, interpret=interp, block_rows=block)
                return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]

            _, out = jax.lax.scan(body, q, None, length=r)
            return out

        return lambda: f(queries, pq, ps)

    for b in blocks:
        ms = amortized(lambda r, b=b: make_bf16(r, b)) * 1e3
        print(f"sweep_bf16_block{b:6d}_ms  {ms:8.2f}", flush=True)
    for b in blocks:
        ms = amortized(lambda r, b=b: make_i8(r, b)) * 1e3
        print(f"sweep_int8_block{b:6d}_ms  {ms:8.2f}", flush=True)


if __name__ == "__main__":
    main()
