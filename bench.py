"""Benchmark: the three BASELINE.json metrics, one JSON line (incremental).

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

TIME-BUDGET CONTRACT (round-4 VERDICT item 1 -- BENCH_r04 timed out rc 124
with nothing printed): the driver parses the LAST complete JSON line, so
this bench prints a full updated JSON line after EVERY measurement, starting
with a startup line before the first compile.  Measurements run in priority
order (headline serving config first) under a wall-clock deadline
(`UNIIR_BENCH_DEADLINE_S`, default 540 s): once past it, remaining extras
are emitted as {"metric": ..., "skipped": "deadline"} instead of running.
A driver timeout at ANY point now still leaves the best-so-far artifact.

`extra_metrics` carries the other two BASELINE metrics:
  * `retrieval_qps_5.6m_pool[_int8]` -- batched query QPS of the fused
    Pallas top-k over a synthetic 5,600,000 x 768 pool (the FAISS
    replacement; reference mbeir_retriever.py:188-232).  Baseline: 8x A100
    FAISS sharded exact IP search, ~0.8 s for a 10k-query batch => ~12.5k
    QPS.  The int8-pool row is the serving default (guarded-exact sweep).
  * `clip_l_train_examples_per_sec` -- full jitted train step
    (fwd+bwd+AdamW) throughput.

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

_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("UNIIR_BENCH_DEADLINE_S", "540"))


def _time_left() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _trace(msg: str) -> None:
    """Stage-timing breadcrumb on STDERR (the driver parses stdout's last
    JSON line; these lines always precede the next emit and are flushed so
    the merged stream still ends with JSON)."""
    print(f"[bench {time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _probe_backend(timeout=None):
    """Guard against TPU-backend outages BEFORE importing jax in-process.

    Round 3's driver bench died rc 1 when the axon TPU tunnel was down
    ("Unable to initialize backend"), and backend init can also HANG
    indefinitely -- so a try/except around jax.devices() is not enough.
    Probe in a subprocess with a hard timeout; on any failure force
    JAX_PLATFORMS=cpu so the bench still emits a parseable JSON line with
    a `note` instead of a traceback.  Returns the note string, or None
    when the backend is healthy.

    Timeout calibration (measured 2026-08-19): the FIRST backend init
    after the tunnel has been idle takes ~132 s -- it is what warms the
    relay -- after which inits take ~6 s.  A 60 s timeout therefore
    wrongly reroutes a healthy-but-cold tunnel to the CPU smoke fallback
    (observed this round); 240 s covers the cold init with margin while
    still bounding a genuine hang.  Env override: UNIIR_BENCH_PROBE_S."""
    if timeout is None:
        timeout = float(os.environ.get("UNIIR_BENCH_PROBE_S", "240"))
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
    per_op = (tn - t1) / (reps - 1)
    if per_op <= 0:
        # CPU-smoke timing noise can make the 1-rep wall exceed the N-rep
        # wall; a negative throughput must never reach the artifact.  One
        # remeasure, then give up loudly (the caller's except path records
        # the error as a row instead of a bogus number).
        t1, tn = run1(), runN()
        per_op = (tn - t1) / (reps - 1)
        if per_op <= 0:
            raise ValueError(f"non-positive amortized time ({per_op:.6f}s): measurement noise exceeds the op cost")
    return per_op


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


class EmbedSetup:
    """Init-once state shared by every embed-backend measurement: the bf16
    params and the probe/bench inputs.  Round 4 re-initialized and
    re-calibrated per backend -- 4x the setup cost for identical params.

    DEVICE-RESIDENT on purpose (round 5): params are initialised by a JITTED
    init (the eager flax init dispatches hundreds of ops one relay
    round-trip at a time, ~70 s measured), never device_get (52 s for the
    1.7 GB CLIP-L tree through the tunnel), and quantized ON DEVICE
    (`ops.quant.quantize_tree_jax` under one jit) instead of on host + a
    20-86 s re-upload.  Measured total: setup 292 s -> ~15 s warm.  If
    `_free_device` deleted the params between benches, `params_for` re-runs
    the cached jitted init (~1 s) rather than re-uploading anything."""

    def __init__(self, jax, jnp, on_tpu):
        from uniir_tpu.models.clip import CLIP_CONFIGS
        from uniir_tpu.models.clip_sf import CLIPScoreFusion

        if on_tpu:
            self.model_name, self.batch, self.iters, self.warmup = "ViT-L/14", 256, 10, 3
        else:
            self.model_name, self.batch, self.iters, self.warmup = "test-tiny", 32, 3, 1
        self.cfg = CLIP_CONFIGS[self.model_name]
        self.make_model = lambda quant: CLIPScoreFusion(self.cfg, dtype=jnp.bfloat16, quant=quant)

        rng = np.random.default_rng(0)
        cfg = self.cfg
        self.txt2 = rng.integers(1, cfg.vocab_size - 1, size=(2, cfg.context_length)).astype(np.int32)
        self.img2 = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
        self.mask2 = np.ones((2,), np.int32)
        init_model = self.make_model(False)
        self._init_model = init_model
        self._jax = jax
        self._init_fn = jax.jit(
            lambda key, txt, img, m: init_model.init(key, txt, img, m, m)["params"]
        )
        self._params = None
        self._act_scales = None  # calibrated once, reused across backends
        b = self.batch
        self.txt_b = rng.integers(1, cfg.vocab_size - 1, size=(b, cfg.context_length)).astype(np.int32)
        self.img_b = rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
        self.mask_b = np.ones((b,), np.int32)
        self.params()  # materialize now so setup cost is attributable

    def params(self):
        jax = self._jax
        leaves = jax.tree_util.tree_leaves(self._params) if self._params is not None else []
        if not leaves or (hasattr(leaves[0], "is_deleted") and leaves[0].is_deleted()):
            self._params = self._init_fn(jax.random.PRNGKey(0), self.txt2, self.img2, self.mask2)
            jax.block_until_ready(self._params)
        return self._params

    def params_for(self, jax, quant: bool):
        params = self.params()
        if not quant:
            return params
        from uniir_tpu.ops.quant import quantize_tree_jax

        act_scales = None
        if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static":
            # static-int8 serving needs calibrated activation scales; probe on
            # the same (random) input distribution the bench runs on, with
            # headroom for batch-256 amax growth over the batch-2 probe
            if self._act_scales is None:
                from uniir_tpu.ops.calibrate import calibrate_act_scales

                self._act_scales = calibrate_act_scales(
                    self._init_model,
                    params,
                    [(self.txt2, self.img2, self.mask2, self.mask2)],
                    act="quick_gelu",
                    margin=1.25,
                )
            act_scales = self._act_scales
        return jax.jit(lambda p: quantize_tree_jax(p, act_scales=act_scales))(params)


def bench_embed(jax, jnp, setup: EmbedSetup, quant=False):
    """Embed pairs/s; quant=True runs the int8 serving path (cosine vs bf16
    >= 0.9995, docs/PERFORMANCE.md int8 ablation) under the backend named by
    UNIIR_INT8_BACKEND."""
    model = setup.make_model(quant)
    params = setup.params_for(jax, quant)  # already device-resident
    txt_b, img_b, mask_b = jax.device_put((setup.txt_b, setup.img_b, setup.mask_b))

    def make_embed(reps):
        @jax.jit
        def f(params, txt, img, mask):
            def body(carry, _):
                emb = model.apply({"params": params}, txt, carry, mask, mask)
                return carry + emb[0, 0] * 1e-9, emb.astype(jnp.float16)

            _, embs = jax.lax.scan(body, img, None, length=reps)
            return embs

        return f

    reps = max(2, setup.iters // 2)
    f1, fn = make_embed(1), make_embed(reps)

    def run(f):
        times = []
        for _ in range(max(2, setup.warmup)):
            t0 = time.perf_counter()
            out = f(params, txt_b, img_b, mask_b)
            float(jnp.sum(out[0, :2].astype(jnp.float32)))  # host fetch = barrier
            times.append(time.perf_counter() - t0)
        return min(times)

    per_op = _amortized(lambda: run(f1), lambda: run(fn), reps)
    return setup.batch / per_op


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
    """Full CLIP-L train step (fwd+bwd+AdamW) examples/s, measured in DEVICE
    time: the raw step is scanned N times inside one jit -- each iteration
    consumes the previous state, so XLA cannot CSE the repeats -- and the
    1-rep vs N-rep walls are differenced.  The scan DONATES and RETURNS the
    TrainState, exactly like the engine's jitted step (steps.py
    donate_argnums): round 5 found the earlier non-donating formulation held
    the 5.1 GB input state live across the whole program, forcing XLA's HLO
    rematerializer to re-run 251 forward ops inside the backward (the
    measured effect: 95.7 -> 131.7 ex/s at batch 32 once donated).  `bs`
    overrides the batch (the OOM/compile fallback in main retries at 32)."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.train.optimizer import make_clip_optimizer
    from uniir_tpu.train.state import TrainState
    from uniir_tpu.train.steps import make_clip_train_step

    if on_tpu:
        # batch 32 is the measured best end-to-end with the donated scan
        # (132.2 ex/s vs 114.4 at batch 64, docs/train_bench_r05.txt); both
        # batches compile with the fused Pallas backward (the einsum-VJP
        # program at batch 64 was what the relay's compile helper 500'd on
        # in round 4).  Per-device batch is a throughput knob -- the A100
        # baseline likewise assumes the reference's own per-GPU batch.
        model_name, bs, reps = "ViT-L/14", bs or 32, 4
    else:
        model_name, bs, reps = "test-tiny", 8, 2

    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2 * bs, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2 * bs, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2 * bs,), np.int32)
    # jitted init: the eager flax init dispatches hundreds of ops one relay
    # round-trip at a time (~70 s measured on this rig; same fix as EmbedSetup)
    params = jax.jit(lambda key, t, i, m: model.init(key, t, i, m, m)["params"])(
        jax.random.PRNGKey(0), txt[:2], img[:2], mask[:2]
    )
    jax.block_until_ready(params)
    _trace(f"train setup done (bs={bs})")
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
        def f(state, batch):
            def body(st, _):
                st2, metrics = raw_step(st, batch)
                return st2, metrics["loss"]

            st, losses = jax.lax.scan(body, state, None, length=r)
            return st, losses

        return jax.jit(f, donate_argnums=(0,))

    f1, fn = make(1), make(reps)

    def run(f):
        nonlocal state
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, out = f(state, batch)  # donated in, threaded out
            float(jnp.sum(out.astype(jnp.float32)))  # host fetch = barrier
            times.append(time.perf_counter() - t0)
        return min(times)

    t_first = time.perf_counter()
    state, _ = f1(state, batch)  # compile both programs before the timed runs
    state, _ = fn(state, batch)
    jax.block_until_ready(state)
    _trace(f"train programs compiled ({time.perf_counter() - t_first:.1f}s)")
    per_step = _amortized(lambda: run(f1), lambda: run(fn), reps)
    return bs / per_step


# ---------------------------------------------------------------------------
# Incremental emission: the driver parses the LAST complete JSON line.
# ---------------------------------------------------------------------------

A100_BASELINE_PAIRS_PER_SEC = 890.0
A100x8_FAISS_QPS = 12_500.0
# Train: one example = one (query, positive) pair = TWO multimodal rows,
# each a full image+text dual-tower forward (reference clip_sf.py:77-93
# embeds the flat [q|p] batch through both towers; inbatch.yaml:41 batches
# 105 examples = 210 rows per A100).  Per example fwd+bwd = 2 rows x
# 175 GFLOP x 3 = 1050 GFLOP, at 312 TF fp16 x ~50% autocast utilization
# => ~148.6 ex/s per A100; AdamW and the loss all_gather ride inside the
# same utilization discount.  (Rounds 2-4 used 297 ex/s, derived from 525
# GFLOP/example -- ONE row -- which contradicts the measured unit: this
# bench's step consumes 2*bs rows for bs examples, exactly like the
# reference.  The unit fix halves the baseline; it is a correction of the
# estimate's arithmetic, not a re-target -- the per-ROW equivalent is
# unchanged at ~297 rows/s.)
A100_TRAIN_EX_PER_SEC = 148.6
# All baselines are builder-constructed ESTIMATES (the reference repo
# publishes no throughput numbers): A100 fp16 dense peak x a typical
# utilization over the measured per-example FLOPs.  See the module
# docstring for each derivation; "baseline_basis" marks them as such.
BASIS = "estimate"


class Emitter:
    """Holds the evolving result and prints the FULL JSON line after every
    update (flushing), so whatever the driver's timeout cuts off, the tail
    of stdout is the best measurement set completed so far."""

    def __init__(self, on_tpu, note):
        self.on_tpu = on_tpu
        self.note = note
        self.bf16_pairs = None
        self.static_pairs = None
        self.headline_error = None
        self.extras = []

    def emit(self):
        on_tpu = self.on_tpu
        bf16 = self.bf16_pairs or 0.0
        static = self.static_pairs or 0.0
        # Headline = best serving configuration.  Static-int8 is exact to
        # the 0.999-cosine serving contract (tests/test_quant_variants.py);
        # when it measures faster than bf16 it IS the number a user
        # deploying this framework gets, so it carries the headline and
        # bf16 rides in extras (and vice versa).
        extras = list(self.extras)
        if static > bf16:
            value, serving = static, "int8-static-xla, padded-flat tower (calibrated activation scales)"
            if self.bf16_pairs is not None:
                extras.insert(0, self._pairs_row("bf16", bf16))
        else:
            value, serving = bf16, "bf16"
            if self.static_pairs is not None:
                extras.insert(0, self._pairs_row("int8_static", static))
        out = {
            "metric": "clip_l_embeds_per_sec_per_chip" if on_tpu else "clip_tiny_embeds_per_sec_cpu_smoke",
            "value": round(value, 2),
            "unit": "pairs/s",
            "vs_baseline": round(value / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
            "baseline_basis": BASIS,
            "serving_config": serving,
            "elapsed_s": round(time.monotonic() - _T0, 1),
            "extra_metrics": extras,
        }
        if self.note:
            out["note"] = self.note
        if self.headline_error:
            out["error"] = self.headline_error
        print(json.dumps(out), flush=True)

    def _pairs_row(self, tag, v):
        on_tpu = self.on_tpu
        return {
            "metric": f"clip_l_embeds_per_sec_per_chip_{tag}" if on_tpu else f"embeds_per_sec_{tag}_cpu_smoke",
            "value": round(v, 2),
            "unit": "pairs/s",
            "vs_baseline": round(v / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
            "baseline_basis": BASIS,
        }

    def add(self, row):
        self.extras.append(row)


def _enable_compile_cache(jax):
    """Persistent compilation cache, verified working over the axon relay
    (measured 2026-08-19: a 4.4 s compile replays in 0.10 s from cache).
    The relay's remote compiles dominate this bench's wall clock (the
    static-int8 headline alone spent ~10 min compiling cold); the repo
    ships with a pre-warmed `.jax_cache/` (gitignored) from the round-5
    session, so the driver's end-of-round run hits cache for every program
    and the whole bench -- extras included -- fits the budget.  A cold
    cache degrades gracefully: the deadline + incremental emission still
    bound the run.  Env override: UNIIR_JAX_CACHE_DIR (set empty to
    disable)."""
    cache_dir = os.environ.get("UNIIR_JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization, never a failure mode


def main() -> None:
    note = _probe_backend()

    import jax

    _enable_compile_cache(jax)

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
    em = Emitter(on_tpu, note)
    em.emit()  # startup line: a driver timeout during the first compile still parses

    # ---- headline: embed throughput, best-known serving config first ----
    setup = None
    try:
        _trace("EmbedSetup (jitted init, device-resident params)...")
        setup = EmbedSetup(jax, jnp, on_tpu)
        _trace("EmbedSetup done")
    except Exception as e:
        em.headline_error = repr(e)[:300]
        em.emit()

    if setup is not None:
        prev = os.environ.get("UNIIR_INT8_BACKEND")
        os.environ["UNIIR_INT8_BACKEND"] = "static"
        try:
            em.static_pairs = bench_embed(jax, jnp, setup, quant=True)
            _trace(f"static-int8 embed done: {em.static_pairs:.1f} pairs/s")
        except Exception as e:
            em.add({"metric": "clip_l_embeds_per_sec_per_chip_int8_static", "error": repr(e)[:300]})
        finally:
            if prev is None:
                os.environ.pop("UNIIR_INT8_BACKEND", None)
            else:
                os.environ["UNIIR_INT8_BACKEND"] = prev
        em.emit()
        # params stay resident between the static and bf16 benches (the int8
        # twin + f32 tree + batch-256 activations fit 16 GB together);
        # freeing here would also drop the executable caches and force a
        # persistent-cache reload of every program through the relay.

        try:
            em.bf16_pairs = bench_embed(jax, jnp, setup, quant=False)
            _trace(f"bf16 embed done: {em.bf16_pairs:.1f} pairs/s")
        except Exception as e:
            em.headline_error = em.headline_error or repr(e)[:300]
        em.emit()
        _free_device(jax)

    # ---- extras, in priority order, each gated on the deadline ----
    # Cost-aware: an extra only STARTS if its estimated cost (dominated by
    # the relay's remote compiles, measured on-chip 2026-08-19) still fits
    # before the deadline -- otherwise a long extra started at deadline-1s
    # would blow the driver's hard timeout anyway.  CPU smoke runs are far
    # cheaper; gate those on deadline only (est 0).
    def deadline_skip(metric, est_s=0.0):
        if _time_left() <= (est_s if on_tpu else 0.0):
            em.add({"metric": metric, "skipped": "deadline"})
            em.emit()
            return True
        return False

    # retrieval, int8-pool serving default first (guarded-exact sweep)
    if not deadline_skip("retrieval_qps_5.6m_pool_int8", est_s=90):
        _trace("retrieval int8-pool...")
        for rows, note8 in ((None, None), (2_800_000, "measured at 2.8M rows after device OOM; scaled to the 5.6M-pool equivalent")):
            try:
                qps8, guard_rate = bench_retrieval(jax, jnp, on_tpu, n_pool=rows, int8_pool=True)
                if rows:
                    qps8 *= rows / 5_600_000
                em.add(
                    {
                        "metric": "retrieval_qps_5.6m_pool_int8" if on_tpu else "retrieval_qps_int8_cpu_smoke",
                        "value": round(qps8, 1),
                        "unit": "queries/s",
                        "vs_baseline": round(qps8 / A100x8_FAISS_QPS, 4) if on_tpu else 0.0,
                        "baseline_basis": BASIS,
                        "guard_pass_rate": round(guard_rate, 4),
                        **({"note": note8} if note8 else {}),
                    }
                )
                break
            except Exception as e:
                _free_device(jax)
                if not (on_tpu and "RESOURCE_EXHAUSTED" in repr(e) and rows is None):
                    em.add({"metric": "retrieval_qps_5.6m_pool_int8", "error": repr(e)[:300]})
                    break
        em.emit()
        _free_device(jax)

    if not deadline_skip("retrieval_qps_5.6m_pool", est_s=90):
        _trace("retrieval bf16 pool...")
        try:
            qps = bench_retrieval(jax, jnp, on_tpu)
            em.add(
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
                    em.add(
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
                    em.add({"metric": "retrieval_qps_5.6m_pool", "error": repr(e2)[:300]})
            else:
                em.add({"metric": "retrieval_qps_5.6m_pool", "error": repr(e)[:300]})
        em.emit()
        _free_device(jax)

    if not deadline_skip("clip_l_train_examples_per_sec", est_s=150):
        _trace("train step...")
        try:
            exs = bench_train_step(jax, jnp, on_tpu)
            em.add(
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
            # INTERNAL/remote_compile: this rig's relay compile-helper can
            # crash on the large fwd+bwd scan program (observed: "HTTP 500:
            # tpu_compile_helper subprocess exit code 1") -- also worth one
            # smaller-program retry rather than giving up.
            retriable = ("RESOURCE_EXHAUSTED", "INTERNAL", "remote_compile")
            if on_tpu and any(s in repr(e) for s in retriable) and _time_left() > 0:
                _free_device(jax)
                try:
                    exs = bench_train_step(jax, jnp, on_tpu, bs=32)
                    em.add(
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
                    em.add({"metric": "clip_l_train_examples_per_sec", "error": repr(e2)[:300]})
            else:
                em.add({"metric": "clip_l_train_examples_per_sec", "error": repr(e)[:300]})
        em.emit()
        _free_device(jax)

    # the remaining int8 activation backends (dynamic-xla / weight-only), so
    # one bench artifact carries the whole backends shootout when time allows
    if setup is not None:
        for backend in ("xla", "wonly"):
            metric = f"clip_l_embeds_per_sec_per_chip_int8_{backend}"
            if deadline_skip(metric, est_s=90):
                continue
            prev = os.environ.get("UNIIR_INT8_BACKEND")
            os.environ["UNIIR_INT8_BACKEND"] = backend
            _trace(f"int8 backend {backend}...")
            try:
                v = bench_embed(jax, jnp, setup, quant=True)
                em.add(
                    {
                        "metric": metric if on_tpu else f"embeds_per_sec_int8_{backend}_cpu_smoke",
                        "value": round(v, 2),
                        "unit": "pairs/s",
                        "vs_baseline": round(v / A100_BASELINE_PAIRS_PER_SEC, 4) if on_tpu else 0.0,
                        "baseline_basis": BASIS,
                    }
                )
            except Exception as e:
                em.add({"metric": metric, "error": repr(e)[:300]})
            finally:
                if prev is None:
                    os.environ.pop("UNIIR_INT8_BACKEND", None)
                else:
                    os.environ["UNIIR_INT8_BACKEND"] = prev
            em.emit()
            _free_device(jax)

    em.emit()  # final line


if __name__ == "__main__":
    main()
