"""Benchmark: the three BASELINE.json metrics, one JSON line.

Headline (the `metric`/`value` fields): CLIP-L (ViT-L/14) multimodal
embedding throughput per chip, at the BEST serving configuration -- today
that is calibrated static-int8 through XLA matmuls (`serving_config` names
it; exactness contract: cosine vs bf16 >= 0.999 per variant,
tests/test_quant_variants.py).  bf16 and the other int8 backends ride in
`extra_metrics` so every configuration stays captured.  The reference embeds
M-BEIR with CLIP-SF Large at batch 2048 fp16 on A100-80GB (reference
eval/inbatch/embed.yaml:88,14).  An A100 at fp16 dense peak 312 TFLOPs
running the ~175 GFLOP/pair CLIP-L image+text forward at a typical ~50%
torch-autocast utilization gives ~890 pairs/s -- the
`A100_BASELINE_PAIRS_PER_SEC` the ratio is computed against.

`extra_metrics` carries the other two BASELINE metrics (round-1 VERDICT
item 6):
  * `retrieval_qps_5.6m_pool`  -- batched query QPS of the fused Pallas
    top-k over a synthetic 5,600,000 x 768 bf16 pool (the FAISS
    replacement; reference mbeir_retriever.py:188-232).  Baseline: 8x A100
    FAISS sharded exact IP search, ~0.8 s for a 10k-query batch => ~12.5k
    QPS (vs_baseline against that).
  * `clip_l_train_examples_per_sec` -- full jitted train step
    (fwd+bwd+AdamW) throughput at batch 64.

All numbers are device time via the amortized scan method: running the op N
times inside one jit (data-dependent scan, so XLA cannot CSE the repeats)
and differencing 1-rep vs N-rep walls -- per-call host fetches are floored
by the ~36 ms dispatch+fetch round trip of this rig's remote-TPU relay, and
block_until_ready is not a reliable barrier there.

Run on the real chip: `python bench.py` (CPU fallback uses tiny shapes and
reports vs_baseline 0).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_backend(timeout=300):
    """Guard against TPU-backend outages BEFORE importing jax in-process.

    Round 3's driver bench died rc 1 when the axon TPU tunnel was down
    ("Unable to initialize backend"), and backend init can also HANG
    indefinitely -- so a try/except around jax.devices() is not enough.
    Probe in a subprocess with a hard timeout; on any failure force
    JAX_PLATFORMS=cpu so the bench still emits a parseable JSON line with a
    `note` instead of a traceback (the OOM-fallback discipline, applied to
    backend init).  Returns the note string, or None when the backend is
    healthy."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return None  # explicit CPU run, nothing to probe
    code = "import jax, jax.numpy as jnp; jnp.ones((2, 2)).block_until_ready(); print(jax.devices()[0].platform)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
        )
        if r.returncode == 0:
            return None
        detail = f"backend init failed rc {r.returncode}: {r.stderr.strip()[-200:]}"
    except subprocess.TimeoutExpired:
        detail = f"backend init hung > {timeout}s"
    os.environ["JAX_PLATFORMS"] = "cpu"
    return f"tpu backend unavailable ({detail}); cpu smoke fallback"


def _amortized(run1, runN, reps):
    t1, tn = run1(), runN()
    return (tn - t1) / (reps - 1)


def _free_device(jax):
    """Release HBM between benches: drop executable caches (they pin
    constants) and delete every live device array.  Each bench builds its
    own arrays, so nothing outlives this on purpose; without it the embed
    model + int8 twin stay resident and the 8.6 GB retrieval pool OOMs a
    16 GB v5e."""
    jax.clear_caches()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:
            pass


def bench_embed(jax, jnp, on_tpu, quant=False):
    """Embed pairs/s; quant=True runs the int8 serving path (cosine vs bf16
    >= 0.9995, docs/PERFORMANCE.md int8 ablation)."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion

    if on_tpu:
        model_name, batch, iters, warmup = "ViT-L/14", 256, 10, 3
    else:
        model_name, batch, iters, warmup = "test-tiny", 32, 3, 1

    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16, quant=quant)

    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2,), np.int32)
    init_model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)
    params = init_model.init(jax.random.PRNGKey(0), txt, img, mask, mask)["params"]
    if quant:
        import os

        from uniir_tpu.ops.quant import quantize_tree

        act_scales = None
        if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static":
            # static-int8 serving needs calibrated activation scales; probe on
            # the same (random) input distribution the bench runs on, with
            # headroom for batch-256 amax growth over the batch-2 probe
            from uniir_tpu.ops.calibrate import calibrate_act_scales

            act_scales = calibrate_act_scales(
                init_model, params, [(txt, img, mask, mask)], act="quick_gelu", margin=1.25
            )
        params = quantize_tree(params, act_scales=act_scales)
    params = jax.device_put(params)

    txt_b = rng.integers(1, cfg.vocab_size - 1, size=(batch, cfg.context_length)).astype(np.int32)
    img_b = rng.normal(size=(batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask_b = np.ones((batch,), np.int32)
    txt_b, img_b, mask_b = jax.device_put((txt_b, img_b, mask_b))

    def make_embed(reps):
        @jax.jit
        def f(params, txt, img, mask):
            def body(carry, _):
                emb = model.apply({"params": params}, txt, carry, mask, mask)
                return carry + emb[0, 0] * 1e-9, emb.astype(jnp.float16)

            _, embs = jax.lax.scan(body, img, None, length=reps)
            return embs

        return f

    reps = max(2, iters // 2)
    f1, fn = make_embed(1), make_embed(reps)

    def run(f):
        times = []
        for _ in range(max(2, warmup)):
            t0 = time.perf_counter()
            out = f(params, txt_b, img_b, mask_b)
            float(jnp.sum(out[0, :2].astype(jnp.float32)))  # host fetch = barrier
            times.append(time.perf_counter() - t0)
        return min(times)

    per_op = _amortized(lambda: run(f1), lambda: run(fn), reps)
    return batch / per_op


def bench_retrieval(jax, jnp, on_tpu, n_pool=None, int8_pool=False):
    """Fused Pallas top-k QPS over the (synthetic) 5.6M x 768 union pool.

    `n_pool` overrides the pool size (the OOM fallback in main measures a
    smaller pool and rescales: the kernel streams the pool once per query
    batch, so QPS is inversely proportional to pool rows).

    `int8_pool=True` benches the int8-pool sweep + certainty guard (the
    serving config retrieval/search.py engages under UNIIR_TOPK_POOL=int8:
    half the pool bytes, 2x MXU rate, exact rescore of the survivors) and
    returns (qps, guard_pass_rate) instead of a bare qps."""
    from uniir_tpu.ops.topk_pallas import CHUNK, PAD_ROWS, pallas_topk, quantize_pool

    if on_tpu:
        dim, n_q, k = 768, 256, 10
        n_pool = n_pool or 5_600_000
    else:
        n_pool, dim, n_q, k = 4 * CHUNK, 32, 16, 5

    pad = (-n_pool) % PAD_ROWS  # tallest DMA block multiple
    key = jax.random.PRNGKey(0)
    pool = jax.random.normal(key, (n_pool + pad, dim), jnp.bfloat16)
    queries = jax.random.normal(jax.random.PRNGKey(1), (n_q, dim), jnp.bfloat16)
    pq = quantize_pool(pool) if int8_pool else None

    reps = 6

    def make(r):
        @jax.jit
        def f(q, pool, pq):
            def body(carry, _):
                out = pallas_topk(
                    carry, pool, k, valid_n=n_pool, interpret=not on_tpu,
                    pool_quant=pq, with_guard=int8_pool,
                )
                s = out[0]
                return carry + s[:1, :1].astype(carry.dtype) * 1e-9, s

            _, s = jax.lax.scan(body, q, None, length=r)
            return s

        return f

    f1, fn = make(1), make(reps)

    def run(f):
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(queries, pool, pq)
            float(jnp.sum(out[0, :2, :2].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        return min(times)

    per_op = _amortized(lambda: run(f1), lambda: run(fn), reps)
    qps = n_q / per_op
    if not int8_pool:
        return qps
    _, _, ok = pallas_topk(
        queries, pool, k, valid_n=n_pool, interpret=not on_tpu, pool_quant=pq, with_guard=True
    )
    return qps, float(jnp.mean(ok.astype(jnp.float32)))


def bench_train_step(jax, jnp, on_tpu, bs=None):
    """Full CLIP-L train step (fwd+bwd+AdamW) examples/s at batch 64,
    measured in DEVICE time: the raw (non-donating) step is scanned N times
    inside one jit -- each iteration consumes the previous state, so XLA
    cannot CSE the repeats -- and the 1-rep vs N-rep walls are differenced.
    The round-2 number (83 ex/s) timed a Python loop of donated steps and was
    floored by this rig's ~36 ms/dispatch remote-TPU relay.  `bs` overrides
    the batch (the OOM fallback in main retries at 32)."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.train.optimizer import make_clip_optimizer
    from uniir_tpu.train.state import TrainState
    from uniir_tpu.train.steps import make_clip_train_step

    if on_tpu:
        model_name, bs, reps = "ViT-L/14", bs or 64, 4
    else:
        model_name, bs, reps = "test-tiny", 8, 2

    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2 * bs, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2 * bs, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2 * bs,), np.int32)
    params = model.init(jax.random.PRNGKey(0), txt[:2], img[:2], mask[:2], mask[:2])["params"]
    tx = make_clip_optimizer(params, learning_rate=1e-5, total_steps=1000)
    state = TrainState.create(params=params, tx=tx)
    raw_step = make_clip_train_step(model, jit=False)
    batch = jax.device_put(
        {
            "txt_batched": txt,
            "image_batched": img,
            "txt_mask_batched": mask,
            "image_mask_batched": mask,
        }
    )

    def make(r):
        @jax.jit
        def f(state, batch):
            def body(st, _):
                st2, metrics = raw_step(st, batch)
                return st2, metrics["loss"]

            st, losses = jax.lax.scan(body, state, None, length=r)
            return losses

        return f

    f1, fn = make(1), make(reps)

    def run(f):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(state, batch)
            float(jnp.sum(out.astype(jnp.float32)))  # host fetch = barrier
            times.append(time.perf_counter() - t0)
        return min(times)

    per_step = _amortized(lambda: run(f1), lambda: run(fn), reps)
    return bs / per_step


def main() -> None:
    note = _probe_backend()

    import jax

    if note or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # this rig's sitecustomize bakes jax_platforms=axon, so the env var
        # alone does NOT reroute to CPU -- the config update below is what
        # actually takes effect (same recipe as tests/conftest.py)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialised; jax.devices() decides below

    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    headline_error = None
    try:
        bf16_pairs = bench_embed(jax, jnp, on_tpu)
    except Exception as e:  # emit a parseable artifact even on bf16 failure
        bf16_pairs = 0.0
        headline_error = repr(e)[:300]
    _free_device(jax)
    # All baselines are builder-constructed ESTIMATES (the reference repo
    # publishes no throughput numbers): A100 fp16 dense peak x a typical
    # utilization over the measured per-example FLOPs.  See the module
    # docstring for each derivation; "baseline_basis" marks them as such.
    A100_BASELINE_PAIRS_PER_SEC = 890.0
    A100x8_FAISS_QPS = 12_500.0
    # Train: ~525 GFLOP/pair fwd+bwd (3x the 175 GFLOP forward) at 312 TF
    # fp16 x ~50% autocast utilization => ~297 ex/s per A100; AdamW and the
    # loss all_gather ride inside the same utilization discount.
    A100_TRAIN_EX_PER_SEC = 297.0
    BASIS = "estimate"

    extras = []
    try:
        int8_pairs = bench_embed(jax, jnp, on_tpu, quant=True)
        extras.append(
            {
                "metric": "clip_l_embeds_per_sec_per_chip_int8" if on_tpu else "embeds_per_sec_int8_cpu_smoke",
                "value": round(int8_pairs, 2),
                "unit": "pairs/s",
                "vs_baseline": round(int8_pairs / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
                "baseline_basis": BASIS,
            }
        )
    except Exception as e:
        extras.append({"metric": "clip_l_embeds_per_sec_per_chip_int8", "error": repr(e)[:300]})
    _free_device(jax)
    # the other two int8 activation backends (weight-only / calibrated
    # static), so one bench artifact carries the whole backends shootout
    static_pairs = 0.0
    for backend in ("static", "wonly"):
        metric = f"clip_l_embeds_per_sec_per_chip_int8_{backend}"
        prev = os.environ.get("UNIIR_INT8_BACKEND")
        os.environ["UNIIR_INT8_BACKEND"] = backend
        try:
            v = bench_embed(jax, jnp, on_tpu, quant=True)
            if backend == "static":
                static_pairs = v
            extras.append(
                {
                    "metric": metric if on_tpu else f"embeds_per_sec_int8_{backend}_cpu_smoke",
                    "value": round(v, 2),
                    "unit": "pairs/s",
                    "vs_baseline": round(v / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
                    "baseline_basis": BASIS,
                }
            )
        except Exception as e:
            extras.append({"metric": metric, "error": repr(e)[:300]})
        finally:
            if prev is None:
                os.environ.pop("UNIIR_INT8_BACKEND", None)
            else:
                os.environ["UNIIR_INT8_BACKEND"] = prev
        _free_device(jax)
    try:
        qps = bench_retrieval(jax, jnp, on_tpu)
        extras.append(
            {
                "metric": "retrieval_qps_5.6m_pool" if on_tpu else "retrieval_qps_cpu_smoke",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / A100x8_FAISS_QPS, 4) if on_tpu else 0.0,
                "baseline_basis": BASIS,
            }
        )
    except Exception as e:  # extras must never kill the headline metric
        # OOM fallback: measure a half pool and rescale -- the kernel
        # streams the pool once per query batch, so QPS scales as 1/rows
        if on_tpu and "RESOURCE_EXHAUSTED" in repr(e):
            _free_device(jax)
            try:
                rows = 2_800_000
                qps_eq = bench_retrieval(jax, jnp, on_tpu, n_pool=rows) * rows / 5_600_000
                extras.append(
                    {
                        "metric": "retrieval_qps_5.6m_pool",
                        "value": round(qps_eq, 1),
                        "unit": "queries/s",
                        "vs_baseline": round(qps_eq / A100x8_FAISS_QPS, 4),
                        "baseline_basis": BASIS,
                        "note": "measured at 2.8M rows after device OOM; scaled to the 5.6M-pool equivalent (streaming kernel, QPS inversely proportional to pool rows)",
                    }
                )
            except Exception as e2:
                extras.append({"metric": "retrieval_qps_5.6m_pool", "error": repr(e2)[:300]})
        else:
            extras.append({"metric": "retrieval_qps_5.6m_pool", "error": repr(e)[:300]})
    _free_device(jax)
    # int8-pool sweep (UNIIR_TOPK_POOL=int8 serving config): both pools must
    # be resident (int8 sweep + exact bf16 rescore), so the OOM fallback
    # measures fewer rows and rescales like the bf16 row above
    for rows, note in ((None, None), (2_800_000, "measured at 2.8M rows after device OOM; scaled to the 5.6M-pool equivalent")):
        try:
            qps8, guard_rate = bench_retrieval(jax, jnp, on_tpu, n_pool=rows, int8_pool=True)
            if rows:
                qps8 *= rows / 5_600_000
            extras.append(
                {
                    "metric": "retrieval_qps_5.6m_pool_int8" if on_tpu else "retrieval_qps_int8_cpu_smoke",
                    "value": round(qps8, 1),
                    "unit": "queries/s",
                    "vs_baseline": round(qps8 / A100x8_FAISS_QPS, 4) if on_tpu else 0.0,
                    "baseline_basis": BASIS,
                    "guard_pass_rate": round(guard_rate, 4),
                    **({"note": note} if note else {}),
                }
            )
            break
        except Exception as e:
            _free_device(jax)
            if not (on_tpu and "RESOURCE_EXHAUSTED" in repr(e) and rows is None):
                extras.append({"metric": "retrieval_qps_5.6m_pool_int8", "error": repr(e)[:300]})
                break
    _free_device(jax)
    try:
        exs = bench_train_step(jax, jnp, on_tpu)
        extras.append(
            {
                "metric": "clip_l_train_examples_per_sec" if on_tpu else "train_examples_per_sec_cpu_smoke",
                "value": round(exs, 1),
                "unit": "examples/s",
                "vs_baseline": round(exs / A100_TRAIN_EX_PER_SEC, 4) if on_tpu else 0.0,
                "baseline_basis": BASIS,
            }
        )
    except Exception as e:
        # RESOURCE_EXHAUSTED: genuine HBM pressure -> retry smaller.
        # INTERNAL/remote_compile: this rig's relay compile-helper can crash
        # on the large fwd+bwd scan program (observed: "HTTP 500:
        # tpu_compile_helper subprocess exit code 1") -- also worth one
        # smaller-program retry rather than giving up.
        retriable = ("RESOURCE_EXHAUSTED", "INTERNAL", "remote_compile")
        if on_tpu and any(s in repr(e) for s in retriable):
            _free_device(jax)
            try:
                exs = bench_train_step(jax, jnp, on_tpu, bs=32)
                extras.append(
                    {
                        "metric": "clip_l_train_examples_per_sec",
                        "value": round(exs, 1),
                        "unit": "examples/s",
                        "vs_baseline": round(exs / A100_TRAIN_EX_PER_SEC, 4),
                        "baseline_basis": BASIS,
                        "note": f"batch 32 retry after: {repr(e)[:120]}",
                    }
                )
            except Exception as e2:
                extras.append({"metric": "clip_l_train_examples_per_sec", "error": repr(e2)[:300]})
        else:
            extras.append({"metric": "clip_l_train_examples_per_sec", "error": repr(e)[:300]})

    # Headline = best serving configuration.  Static-int8 is exact to the
    # 0.999-cosine serving contract (tests/test_quant_variants.py); when it
    # measured faster than bf16 it IS the number a user deploying this
    # framework gets, so it carries the headline and bf16 rides in extras.
    if static_pairs > bf16_pairs:
        pairs_per_sec, serving_config = static_pairs, "int8-static-xla (calibrated activation scales)"
        extras = [m for m in extras if m.get("metric") != "clip_l_embeds_per_sec_per_chip_int8_static"]
        extras.insert(
            0,
            {
                "metric": "clip_l_embeds_per_sec_per_chip_bf16" if on_tpu else "embeds_per_sec_bf16_cpu_smoke",
                "value": round(bf16_pairs, 2),
                "unit": "pairs/s",
                "vs_baseline": round(bf16_pairs / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
                "baseline_basis": BASIS,
            },
        )
    else:
        pairs_per_sec, serving_config = bf16_pairs, "bf16"
    out = {
        "metric": "clip_l_embeds_per_sec_per_chip" if on_tpu else "clip_tiny_embeds_per_sec_cpu_smoke",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
        "baseline_basis": BASIS,
        "serving_config": serving_config,
        "extra_metrics": extras,
    }
    if note:
        out["note"] = note
    if headline_error:
        out["error"] = headline_error
    print(json.dumps(out))


if __name__ == "__main__":
    main()
