"""Phase isolation for the fused top-k pipeline (the int8-pool investigation).

The round-4 capture showed the int8-pool sweep (half the HBM bytes, 2x MXU
rate) delivering NO end-to-end speedup over bf16 (14,563 vs 14,662 QPS).
This script separates the hypotheses:

  A. phase-1 sweep alone, bf16 vs int8 -- is the kernel itself faster?
  B. selection+rescore epilogue alone at k_sel=k (exact path) vs
     k_sel=overfetch*k (int8 path) -- does the 4x-wider top_k over the
     350K bucket maxima + 4x rescore gather eat the sweep win?
  C. int8 sweep with a 2x-taller pool block (4096 rows = the same 3 MB
     VMEM footprint as the bf16 block) -- is the grid's per-step overhead
     (2734 steps) the floor rather than bytes or FLOPs?

All timings use the amortized-scan method (bench.py docstring).

Run: python scripts/bench_topk_phases.py [--rows 5600000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # this rig's sitecustomize bakes jax_platforms=axon; the env var alone
    # does not reroute (same recipe as bench.py / tests/conftest.py)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
import jax.numpy as jnp
import numpy as np


REPS, OUTER = 5, 3  # shrunk on CPU (interpret mode) in main


def amortized(make, reps=None, outer=None):
    """Scan bodies must return TINY per-rep outputs (a [1,1] slice) -- the
    first version of this script stacked the full [reps, Q, n_buckets] f32
    maxima, which is 2+ GB of HBM writes per call and enough host-relay
    buffer traffic to blow the wall clock before a single row printed."""
    reps = reps or REPS
    outer = outer or OUTER
    f1, fn = make(1), make(reps)

    def run(f):
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            float(jnp.sum(jnp.asarray(out[0] if isinstance(out, tuple) else out)[:1, :1].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (run(fn) - run(f1)) / (reps - 1)


def report(name, ms, results):
    results[name] = ms
    print(f"{name:32s} {ms:8.2f}", flush=True)


def _qt_for(chunk, q):
    """Query-tile height keeping the f32 score tile <= 2 MB (the untiled
    first version blew the 16 MB scoped-vmem limit at chunk 4096)."""
    return min(q, max(32, (1024 * 1024) // (chunk * 4)))


def bucket_max_bf16_chunked(queries, pool, chunk, valid_n, interpret, qt=None):
    """bucket_max_scores with a parametrized pool-block height (hypothesis C
    for the bf16 sweep: 2048-row blocks mean ~2.7k grid steps over the 5.6M
    pool; taller blocks amortize per-step overhead)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    group = chunk // 128
    Q, D = queries.shape
    N = pool.shape[0]
    assert N % chunk == 0
    n_chunks = N // chunk
    valid = jnp.asarray([[valid_n]], jnp.int32)
    qt = qt or _qt_for(chunk, Q)
    assert Q % qt == 0
    n_q = Q // qt

    def kernel(q_ref, pool_ref, valid_ref, out_ref):
        q = q_ref[...]
        rows = pool_ref[...]
        scores = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        tiles = scores.reshape(qt, group, 128)
        base = pl.program_id(0) * chunk
        v = valid_ref[0, 0]

        @pl.when(base + chunk > v)
        def _():
            # row index is query-independent: 2-D [group, 128] iotas (a
            # [qt, group, 128] int32 iota is a 2 MB scoped-vmem temp)
            m_idx = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 1)
            row = base + m_idx * 128 + l_idx
            out_ref[...] = jnp.max(jnp.where((row < v)[None], tiles, jnp.float32(-3e38)), axis=1)

        @pl.when(base + chunk <= v)
        def _():
            out_ref[...] = jnp.max(tiles, axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, n_chunks * 128), jnp.float32),
        grid=(n_chunks, n_q),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, qi: (qi, 0)),
            pl.BlockSpec((chunk, D), lambda i, qi: (i, 0)),
            pl.BlockSpec((1, 1), lambda i, qi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((qt, 128), lambda i, qi: (qi, i)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(queries.astype(jnp.bfloat16), pool, valid)


def bucket_max_i8_chunked(queries, pool_q, pool_scale, chunk, valid_n, interpret, qt=None):
    """bucket_max_scores_i8 with a parametrized pool-block height (hypothesis
    C).  Bucket semantics (strided members) stay exact for any chunk height
    that is a multiple of 128: member m of bucket (i, l) is row
    i*chunk + m*128 + l."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    group = chunk // 128
    Q, D = queries.shape
    N = pool_q.shape[0]
    assert N % chunk == 0
    n_chunks = N // chunk
    valid = jnp.asarray([[valid_n]], jnp.int32)
    qt = qt or _qt_for(chunk, Q)
    assert Q % qt == 0
    n_q = Q // qt

    qf = queries.astype(jnp.float32)
    q_amax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_amax, 1e-6) / 127.0
    q_q = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)

    def kernel(q_ref, pool_ref, qs_ref, ps_ref, valid_ref, out_ref):
        q = q_ref[...]
        rows = pool_ref[...]
        acc = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        scores = acc.astype(jnp.float32) * qs_ref[...] * ps_ref[...]
        tiles = scores.reshape(qt, group, 128)
        base = pl.program_id(0) * chunk
        v = valid_ref[0, 0]

        @pl.when(base + chunk > v)
        def _():
            # row index is query-independent: 2-D [group, 128] iotas (a
            # [qt, group, 128] int32 iota is a 2 MB scoped-vmem temp)
            m_idx = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 1)
            row = base + m_idx * 128 + l_idx
            out_ref[...] = jnp.max(jnp.where((row < v)[None], tiles, jnp.float32(-3e38)), axis=1)

        @pl.when(base + chunk <= v)
        def _():
            out_ref[...] = jnp.max(tiles, axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, n_chunks * 128), jnp.float32),
        grid=(n_chunks, n_q),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, qi: (qi, 0)),
            pl.BlockSpec((chunk, D), lambda i, qi: (i, 0)),
            pl.BlockSpec((qt, 1), lambda i, qi: (qi, 0)),
            pl.BlockSpec((1, chunk), lambda i, qi: (0, i)),
            pl.BlockSpec((1, 1), lambda i, qi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((qt, 128), lambda i, qi: (qi, i)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q_q, pool_q, q_scale, pool_scale.reshape(1, N), valid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_600_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--phase2",
        action="store_true",
        help="chunk-height + overfetch experiments (run after the base A/B isolation)",
    )
    ap.add_argument(
        "--phase3",
        action="store_true",
        help="bucketed-scale int32-max kernel vs the per-row kernel",
    )
    ap.add_argument(
        "--phase5",
        action="store_true",
        help="with --phase4: even taller chunks (16K int8 / 8-16K bf16)",
    )
    ap.add_argument(
        "--phase4",
        action="store_true",
        help="taller chunks at FULL query tile + raised vmem limit (the "
        "phase-2 chunk runs were confounded: _qt_for shrank qt, which "
        "multiplied n_q and INCREASED total grid steps)",
    )
    args = ap.parse_args()

    from uniir_tpu.ops.topk_pallas import (
        CHUNK,
        bucket_max_scores,
        bucket_max_scores_i8,
        pallas_topk,
        quantize_pool,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        global REPS, OUTER
        args.rows, args.nq, args.k = 4 * CHUNK, 16, 5
        REPS, OUTER = 2, 2
    interp = not on_tpu

    n = args.rows
    pad = (-n) % (8 * CHUNK)  # tallest DMA block multiple (16K), all chunk variants divide
    pool = jax.random.normal(jax.random.PRNGKey(0), (n + pad, args.dim), jnp.bfloat16)
    queries = jax.random.normal(jax.random.PRNGKey(1), (args.nq, args.dim), jnp.bfloat16)
    # only ONE int8 pool fits beside the 8.6 GB bf16 pool in 16 GB HBM:
    # phase3 uses the bucketed serving default, everything else per-row
    if args.phase3:
        pqb, psb = quantize_pool(pool, per_bucket=True)  # int32-max kernel (measured slower)
        jax.block_until_ready((pool, queries, pqb, psb))
    else:
        pq, ps = quantize_pool(pool)  # per-row: the serving default + this script's chunked kernels
        jax.block_until_ready((pool, queries, pq, ps))

    results = {}

    if args.phase5:
        args.phase4 = True
    if args.phase4:
        def make_c4(r, chunk, qt):
            @jax.jit
            def f(q, pq_, ps_):
                def body(c, _):
                    m = bucket_max_i8_chunked(c, pq_, ps_, chunk, n, interp, qt=qt)
                    return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
                _, out = jax.lax.scan(body, q, None, length=r)
                return out
            return lambda: f(queries, pq, ps)

        def make_cb4(r, chunk, qt):
            @jax.jit
            def f(q, pool_):
                def body(c, _):
                    m = bucket_max_bf16_chunked(c, pool_, chunk, n, interp, qt=qt)
                    return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
                _, out = jax.lax.scan(body, q, None, length=r)
                return out
            return lambda: f(queries, pool)

        full_qt = queries.shape[0]
        chunks_i8 = (2 * CHUNK, 4 * CHUNK) if not args.phase5 else (8 * CHUNK,)
        chunks_bf = (2 * CHUNK,) if not args.phase5 else (4 * CHUNK, 8 * CHUNK)
        for chunk in chunks_i8:
            report(
                f"sweep_int8_chunk{chunk}_qt{full_qt}_ms",
                amortized(lambda r, c=chunk: make_c4(r, c, full_qt)) * 1e3,
                results,
            )
        for chunk in chunks_bf:
            report(
                f"sweep_bf16_chunk{chunk}_qt{full_qt}_ms",
                amortized(lambda r, c=chunk: make_cb4(r, c, full_qt)) * 1e3,
                results,
            )
        return

    if args.phase3:
        # the bucketed-scale int32-max kernel (now the serving default) vs
        # the per-row kernel it replaced, sweep alone and full pipeline
        def make_i8b_sweep(r):
            @jax.jit
            def f(q, pq_, ps_):
                def body(c, _):
                    m = bucket_max_scores_i8(c, pq_, ps_, valid_n=n, interpret=interp)
                    return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
                _, out = jax.lax.scan(body, q, None, length=r)
                return out
            return lambda: f(queries, pqb, psb)

        report("sweep_int8_bucketed_ms", amortized(make_i8b_sweep) * 1e3, results)

        def make_fullb(r, overfetch):
            @jax.jit
            def f(q, pool_, pq_, ps_):
                def body(c, _):
                    out = pallas_topk(
                        c, pool_, args.k, valid_n=n, interpret=interp,
                        pool_quant=(pq_, ps_), overfetch=overfetch, with_guard=True,
                    )
                    return c + out[0][:1, :1].astype(c.dtype) * 1e-9, out[0][:1, :1]
                _, s = jax.lax.scan(body, q, None, length=r)
                return s
            return lambda: f(queries, pool, pqb, psb)

        for of in (2, 4):
            report(f"full_int8b_of{of}_guard_ms", amortized(lambda r, o=of: make_fullb(r, o)) * 1e3, results)
            _, _, ok = pallas_topk(
                queries, pool, args.k, valid_n=n, interpret=interp,
                pool_quant=(pqb, psb), overfetch=of, with_guard=True,
            )
            print(f"guard_pass_rate_bucketed_of{of}   {float(jnp.mean(ok.astype(jnp.float32))):8.4f}", flush=True)
        return

    if args.phase2:
        # C: taller pool blocks amortize per-grid-step overhead (the base run
        # measured bf16 at 14.7 ms vs its ~10.5 ms HBM roofline and int8 at
        # 9.6 ms vs ~5.3 ms -- ~4 ms of overhead each across ~2.7k steps)
        def make_cb(r, chunk):
            @jax.jit
            def f(q, pool_):
                def body(c, _):
                    m = bucket_max_bf16_chunked(c, pool_, chunk, n, interp)
                    return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
                _, out = jax.lax.scan(body, q, None, length=r)
                return out
            return lambda: f(queries, pool)

        def make_ci(r, chunk):
            @jax.jit
            def f(q, pq_, ps_):
                def body(c, _):
                    m = bucket_max_i8_chunked(c, pq_, ps_, chunk, n, interp)
                    return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
                _, out = jax.lax.scan(body, q, None, length=r)
                return out
            return lambda: f(queries, pq, ps)

        # bf16 at 2*CHUNK measured SLOWER (23.9 vs 14.7 ms) and 4*CHUNK
        # cannot fit (2x 12 MB double-buffered blocks > the 16 MB scoped
        # vmem limit) -- bf16 keeps CHUNK; only int8 explores taller blocks
        for chunk in (2 * CHUNK, 4 * CHUNK):
            report(f"sweep_int8_chunk{chunk}_ms", amortized(lambda r, c=chunk: make_ci(r, c)) * 1e3, results)

        # B: shrink the int8 epilogue -- overfetch 1/2 (vs the default 4),
        # guard pass rate tells us whether the narrower cut is still safe
        def make_of(r, overfetch):
            @jax.jit
            def f(q, pool_, pq_, ps_):
                def body(c, _):
                    out = pallas_topk(
                        c, pool_, args.k, valid_n=n, interpret=interp,
                        pool_quant=(pq_, ps_), overfetch=overfetch, with_guard=True,
                    )
                    return c + out[0][:1, :1].astype(c.dtype) * 1e-9, out[0][:1, :1]
                _, s = jax.lax.scan(body, q, None, length=r)
                return s
            return lambda: f(queries, pool, pq, ps)

        for of in (1, 2):
            report(f"full_int8_of{of}_guard_ms", amortized(lambda r, o=of: make_of(r, o)) * 1e3, results)
            _, _, ok = pallas_topk(
                queries, pool, args.k, valid_n=n, interpret=interp,
                pool_quant=(pq, ps), overfetch=of, with_guard=True,
            )
            print(f"guard_pass_rate_of{of}            {float(jnp.mean(ok.astype(jnp.float32))):8.4f}", flush=True)
        return

    # A: phase-1 sweep alone.  Scan outputs are a [1,1] slice of the maxima
    # (NOT the full [Q, n_buckets] matrix) -- the pallas_call itself cannot
    # be DCE'd because its output feeds the carry, and the tiny output keeps
    # HBM writes out of the measurement.
    # NOTE: the pool arrays are explicit jit ARGUMENTS, not closures -- a
    # closed-over device array is lowered as a captured CONSTANT (jax warns
    # "8.60GB of constants captured"), which ships the whole pool through the
    # relay compiler once per jit.  14 jits x 8.6GB is what silently ate the
    # first version of this script.
    def make_bf16(r):
        @jax.jit
        def f(q, pool_):
            def body(c, _):
                m = bucket_max_scores(c, pool_, valid_n=n, interpret=interp)
                return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
            _, out = jax.lax.scan(body, q, None, length=r)
            return out
        return lambda: f(queries, pool)

    def make_i8(r):
        @jax.jit
        def f(q, pq_, ps_):
            def body(c, _):
                m = bucket_max_scores_i8(c, pq_, ps_, valid_n=n, interpret=interp)
                return c + m[:1, :1].astype(c.dtype) * 1e-9, m[:1, :1]
            _, out = jax.lax.scan(body, q, None, length=r)
            return out
        return lambda: f(queries, pq, ps)

    report("sweep_bf16_ms", amortized(make_bf16) * 1e3, results)
    report("sweep_int8_ms", amortized(make_i8) * 1e3, results)

    # B: full pipeline, exact vs int8(+guard) vs int8 without guard
    def make_full(r, quant, guard):
        @jax.jit
        def f(q, pool_, pq_, ps_):
            def body(c, _):
                out = pallas_topk(
                    c, pool_, args.k, valid_n=n, interpret=interp,
                    pool_quant=(pq_, ps_) if quant else None, with_guard=guard,
                )
                return c + out[0][:1, :1].astype(c.dtype) * 1e-9, out[0][:1, :1]
            _, s = jax.lax.scan(body, q, None, length=r)
            return s
        return lambda: f(queries, pool, pq, ps)

    report("full_bf16_ms", amortized(lambda r: make_full(r, False, False)) * 1e3, results)
    report("full_int8_ms", amortized(lambda r: make_full(r, True, False)) * 1e3, results)
    report("full_int8_guard_ms", amortized(lambda r: make_full(r, True, True)) * 1e3, results)

    ep_bf16 = results["full_bf16_ms"] - results["sweep_bf16_ms"]
    ep_i8 = results["full_int8_ms"] - results["sweep_int8_ms"]
    print(f"{'epilogue_bf16_ms (derived)':32s} {ep_bf16:8.2f}")
    print(f"{'epilogue_int8_ms (derived)':32s} {ep_i8:8.2f}")


if __name__ == "__main__":
    main()
