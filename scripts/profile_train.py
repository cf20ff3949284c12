"""Per-op device-time accounting of the CLIP-L train step (the 67-pairs/s
investigation).

The round-4 capture measured the full train step (fwd+bwd+AdamW, batch 32)
at 67.3 pairs/s -- ~18% MXU utilization, 0.23x the A100 train estimate --
while the fwd+bwd-only reading at batch 64 was ~304 ex/s.  This captures a
jax.profiler trace of the scanned raw step (the exact bench.py program) and
aggregates self time by category / model op so the gap is attributable.

Usage (real chip): python scripts/profile_train.py [--bs 32] [--reps 3] [--hlo]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_embed import CATEGORIES, classify, parse_xplane  # noqa: E402


def capture(args):
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.train.optimizer import make_clip_optimizer
    from uniir_tpu.train.state import TrainState
    from uniir_tpu.train.steps import make_clip_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    model_name = "ViT-L/14" if on_tpu else "test-tiny"
    bs = args.bs if on_tpu else 4

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

    reps = args.reps

    # donate + return the state, matching the engine's jitted step and
    # bench.bench_train_step: the non-donating variant holds the 5.1 GB
    # input state live and forces XLA to rematerialize forward ops in the
    # backward (251 .remat ops in the round-5 trace; 95.7 vs 131.7 ex/s)
    def f_(state, batch):
        def body(st, _):
            st2, metrics = raw_step(st, batch)
            return st2, metrics["loss"]

        st, losses = jax.lax.scan(body, state, None, length=reps)
        return st, losses

    f = jax.jit(f_, donate_argnums=(0,))

    lowered = f.lower(state, batch) if args.hlo else None
    state, out = f(state, batch)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="uniir_train_trace_")
    os.makedirs(log_dir, exist_ok=True)
    if lowered is not None:
        hlo_path = os.path.join(log_dir, "compiled_hlo.txt")
        with open(hlo_path, "w") as fh:
            fh.write(lowered.compile().as_text())
    jax.profiler.start_trace(log_dir)
    state, out = f(state, batch)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    return log_dir, reps, bs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--log_dir", default=None)
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--parse_only", default=None)
    args = ap.parse_args()

    if args.parse_only:
        log_dir, reps, bs = args.parse_only, args.reps, args.bs
    else:
        log_dir, reps, bs = capture(args)
        print(f"trace: {log_dir}")

    ops, async_us = parse_xplane(log_dir)
    if not ops:
        print("NO DEVICE OPS FOUND")
        return
    total_us = sum(us for _, us, _ in ops)
    by_cat = collections.Counter()
    for name, us, _ in ops:
        by_cat[classify(name)] += us

    print(f"\n== category self-time totals ({reps} reps of batch-{bs} train step) ==")
    print(f"{'category':<32} {'ms':>10} {'ms/rep':>10} {'%':>6}")
    for cat, us in by_cat.most_common():
        print(f"{cat:<32} {us / 1e3:>10.2f} {us / 1e3 / reps:>10.2f} {100 * us / total_us:>5.1f}%")
    print(f"{'TOTAL device (XLA Ops line)':<32} {total_us / 1e3:>10.2f} {total_us / 1e3 / reps:>10.2f}")
    print(f"{'async DMAs (overlap compute)':<32} {async_us / 1e3:>10.2f} {async_us / 1e3 / reps:>10.2f}")

    # model-op join via HLO metadata (forward/backward split rides on the
    # transpose markers jax puts in op_name)
    import re

    name2meta = {}
    hlo_path = os.path.join(log_dir, "compiled_hlo.txt")
    if os.path.exists(hlo_path):
        rx = re.compile(r"%(\S+) = .*?metadata=\{op_name=\"([^\"]+)\"")
        for line in open(hlo_path):
            m = rx.search(line)
            if m:
                name2meta[m.group(1)] = m.group(2)

    def model_op(event_name: str) -> str:
        base = event_name.lstrip("%").split(" ")[0]
        meta = name2meta.get(base)
        if meta is None:
            m = re.match(r"([a-zA-Z_\-]+)", base) or re.match(r"(.{1,16})", base)
            return "unmapped:" + m.group(1)
        side = "bwd" if "transpose" in meta else "fwd"
        tower = "vis" if "encode_image" in meta else ("txt" if "encode_text" in meta else "opt/loss")
        tail = re.sub(r"resblocks_\d+", "resblock", "/".join(meta.split("/")[-2:]))
        return f"{side}:{tower}:{tail}"

    if name2meta:
        agg = collections.Counter()
        cnt = collections.Counter()
        for name, us, n in ops:
            k = model_op(name)
            agg[k] += us
            cnt[k] += n
        print("\n== by model op (HLO metadata join) ==")
        print(f"{'ms/rep':>9} {'n/rep':>6}  model op")
        for k, us in agg.most_common(args.top):
            print(f"{us / 1e3 / reps:>9.2f} {cnt[k] / reps:>6.1f}  {k}")

    print(f"\n== top {args.top} ops by self time ==")
    print(f"{'ms/rep':>9} {'n':>5}  op")
    for name, us, n in sorted(ops, key=lambda t: -t[1])[: args.top]:
        print(f"{us / 1e3 / reps:>9.3f} {n:>5}  {name[:110]}")


if __name__ == "__main__":
    main()
