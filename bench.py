"""Benchmark: CLIP-L (ViT-L/14) multimodal embedding throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is the headline number from BASELINE.json ("CLIP-L embeds/sec/chip"):
the reference embeds M-BEIR with CLIP-SF Large at batch 2048 fp16 on A100-80GB
(reference eval/inbatch/embed.yaml:88,14).  An A100 at fp16 dense peak
312 TFLOPs running the ~175 GFLOP/pair CLIP-L image+text forward at a typical
~50% torch-autocast utilization gives ~890 pairs/s -- that is the
`A100_BASELINE_PAIRS_PER_SEC` the ratio is computed against.

Run on the real chip: `python bench.py` (uses whatever jax.devices() gives --
a TPU under the driver, CPU elsewhere with much smaller shapes).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    if on_tpu:
        model_name, batch, iters, warmup = "ViT-L/14", 256, 10, 3
    else:  # CPU smoke path for local runs
        model_name, batch, iters, warmup = "test-tiny", 32, 3, 1

    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2,), np.int32)
    params = model.init(jax.random.PRNGKey(0), txt, img, mask, mask)["params"]
    params = jax.device_put(jax.tree_util.tree_map(lambda x: x, params))

    txt_b = rng.integers(1, cfg.vocab_size - 1, size=(batch, cfg.context_length)).astype(np.int32)
    img_b = rng.normal(size=(batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask_b = np.ones((batch,), np.int32)

    txt_b, img_b, mask_b = jax.device_put((txt_b, img_b, mask_b))

    # Device-time measurement: run the op `reps` times inside one jit (scan
    # with a data dependency so XLA can't CSE the repeats) and difference the
    # 1-rep and N-rep walls.  A per-call host fetch is floored by the
    # dispatch+fetch round trip (~36 ms over remote-TPU relays), and
    # block_until_ready alone is not a reliable completion barrier there.
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

    t1, tn = run(f1), run(fn)
    per_op = (tn - t1) / (reps - 1) if reps > 1 else t1
    pairs_per_sec = batch / per_op

    A100_BASELINE_PAIRS_PER_SEC = 890.0
    vs_baseline = pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC if on_tpu else 0.0

    print(
        json.dumps(
            {
                "metric": "clip_l_embeds_per_sec_per_chip" if on_tpu else "clip_tiny_embeds_per_sec_cpu_smoke",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
