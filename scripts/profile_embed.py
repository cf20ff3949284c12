"""Per-op device-time accounting of the CLIP-L embed forward (VERDICT r2 #2).

Captures a jax.profiler trace of the jitted batch-256 multimodal embed
(the bench.py headline workload), parses the XPlane proto from the TPU
device plane, and aggregates self-time by HLO op category -- the measured
answer to "where does the non-matmul time go".

Usage (real chip):
    python scripts/profile_embed.py [--quant [--backend static]] [--batch 256] [--top 25]

Output: a table of (category, ms, %) + the top individual ops, suitable for
docs/PERFORMANCE.md's profile-accounting section.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def capture_trace(args):
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize bakes the TPU platform; env alone does not reroute
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion

    on_tpu = jax.devices()[0].platform != "cpu"
    model_name = "ViT-L/14" if on_tpu else "test-tiny"
    batch = args.batch if on_tpu else 8

    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16, quant=args.quant)
    init_model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2,), np.int32)
    params = init_model.init(jax.random.PRNGKey(0), txt, img, mask, mask)["params"]
    if args.quant:
        from uniir_tpu.ops.quant import quantize_tree

        act_scales = None
        if args.backend:
            os.environ["UNIIR_INT8_BACKEND"] = args.backend
        if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static":
            # static scales from a probe on the same input distribution
            # (mirrors bench.bench_embed)
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

    reps = args.reps

    @jax.jit
    def f(params, txt, img, mask):
        def body(carry, _):
            emb = model.apply({"params": params}, txt, carry, mask, mask)
            return carry + emb[0, 0] * 1e-9, emb.astype(jnp.float16)

        _, embs = jax.lax.scan(body, img, None, length=reps)
        return embs

    # compile + warm
    out = f(params, txt_b, img_b, mask_b)
    float(jnp.sum(out[0, :2].astype(jnp.float32)))

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="uniir_embed_trace_")
    os.makedirs(log_dir, exist_ok=True)
    if args.hlo:
        # HLO text alongside the trace: result-name -> metadata op_name lets
        # the report attribute each fusion to its model op (fc2, qkv_proj,
        # ...).  Costs a SECOND AOT compile (slow through a compile relay) --
        # opt-in.
        hlo_path = os.path.join(log_dir, "compiled_hlo.txt")
        with open(hlo_path, "w") as fh:
            fh.write(f.lower(params, txt_b, img_b, mask_b).compile().as_text())
    jax.profiler.start_trace(log_dir)
    out = f(params, txt_b, img_b, mask_b)
    float(jnp.sum(out[0, :2].astype(jnp.float32)))
    jax.profiler.stop_trace()
    return log_dir, reps, batch


CATEGORIES = [
    # (regex over op name, category) -- first match wins
    (re.compile(r".*(custom-call|pallas|tpu_custom_call).*"), "pallas kernel (custom call)"),
    (re.compile(r".*(while|call|jit_|conditional).*"), "control-flow shell"),
    (re.compile(r".*(convolution|conv)[.\d]*"), "conv (patch embed)"),
    (re.compile(r".*(copy-start|copy-done|copy).*"), "copy / layout"),
    (re.compile(r".*(dot|matmul|einsum).*"), "matmul (incl. fused epilogues)"),
    (re.compile(r".*(fusion|add|multiply|subtract|divide|exp|tanh|erf|rsqrt|reduce|select|compare|convert|broadcast|iota|concatenate|slice|pad|transpose|reshape|bitcast|gather|scatter|dynamic).*"), "fusion/elementwise"),
]


def classify(name: str, fallback: str = "other") -> str:
    for rx, cat in CATEGORIES:
        if rx.match(name):
            return cat
    return fallback


def parse_xplane(log_dir: str):
    """Aggregate SELF time per op from the TPU device plane's "XLA Ops" line.

    Events on that line nest (jit_<fn> > while > ops); self time is an
    event's duration minus the duration of events it strictly contains, via
    a stack pass over (start, -end)-sorted intervals.  The "Async XLA Ops"
    line (DMAs that overlap compute) is reported separately as a total.
    Returns ([(op_name, self_us, count)], async_us).
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # proto moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    totals = collections.Counter()
    counts = collections.Counter()
    async_us = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xspace.ParseFromString(fh.read())
        for plane in xspace.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name == "Async XLA Ops":
                    async_us += sum(ev.duration_ps for ev in line.events) / 1e6
                if line.name != "XLA Ops":
                    continue
                evs = sorted(
                    (
                        (ev.offset_ps, ev.offset_ps + ev.duration_ps, meta.get(ev.metadata_id, "?"))
                        for ev in line.events
                    ),
                    key=lambda t: (t[0], -t[1]),
                )
                stack = []  # (end_ps, name) of open (containing) events
                for start, end, name in evs:
                    while stack and start >= stack[-1][0]:
                        stack.pop()
                    dur = end - start
                    totals[name] += dur / 1e6
                    counts[name] += 1
                    if stack:  # immediate parent loses this child's span
                        totals[stack[-1][1]] -= dur / 1e6
                    stack.append((end, name))
    return [(n, totals[n], counts[n]) for n in totals], async_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--backend", default=None, choices=["xla", "wonly", "static"],
                    help="int8 activation backend for --quant (sets UNIIR_INT8_BACKEND)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--log_dir", default=None)
    ap.add_argument("--hlo", action="store_true", help="also dump compiled HLO for the model-op join (slow: second AOT compile)")
    ap.add_argument("--parse_only", default=None, help="parse an existing trace dir instead of capturing")
    args = ap.parse_args()

    if args.parse_only:
        log_dir, reps, batch = args.parse_only, args.reps, args.batch
    else:
        log_dir, reps, batch = capture_trace(args)
        print(f"trace: {log_dir}")

    ops, async_us = parse_xplane(log_dir)
    if not ops:
        print("NO DEVICE OPS FOUND -- relay rig may not export a device plane; fall back to ablation timing")
        return

    total_us = sum(us for _, us, _ in ops)
    by_cat = collections.Counter()
    for name, us, _ in ops:
        by_cat[classify(name)] += us

    print(f"\n== category self-time totals (trace window: {reps} reps of batch-{batch} embed) ==")
    print(f"{'category':<32} {'ms':>10} {'ms/rep':>10} {'%':>6}")
    for cat, us in by_cat.most_common():
        print(f"{cat:<32} {us / 1e3:>10.2f} {us / 1e3 / reps:>10.2f} {100 * us / total_us:>5.1f}%")
    print(f"{'TOTAL device (XLA Ops line)':<32} {total_us / 1e3:>10.2f} {total_us / 1e3 / reps:>10.2f}")
    print(f"{'async DMAs (overlap compute)':<32} {async_us / 1e3:>10.2f} {async_us / 1e3 / reps:>10.2f}")

    # attribute each op to its model op via the HLO metadata, if available
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
            return "unmapped:" + (re.match(r"([a-zA-Z_\-]+)", base) or re.match(r"(.{1,16})", base)).group(1)
        tower = "vis" if "encode_image" in meta else ("txt" if "encode_text" in meta else "?")
        tail = re.sub(r"resblocks_\d+", "resblock", "/".join(meta.split("/")[-2:]))
        return f"{tower}:{tail}"

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
