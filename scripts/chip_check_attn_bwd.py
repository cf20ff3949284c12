"""On-chip validation of the fused Pallas attention-BACKWARD kernel.

Round 4 landed `mha_paired_stack_bwd` as the default VJP for
`paired_attention` with interpret-mode coverage only (round-4 VERDICT weak
item 5: Mosaic interpret passes do not guarantee the compiled kernel lowers
or that its numerics hold on hardware).  This script runs the COMPILED
kernel on the real chip and checks, at the exact CLIP-L shapes the train
step uses:

  1. it lowers + executes (no Mosaic relayout/lowering error);
  2. dq/dk/dv match the fp32 einsum-VJP oracle (`_einsum_bwd`) to bf16
     tolerance, non-causal (ViT path: B=32, L=257, H=16, D=64) and causal
     (text path: B=64, L=77, H=12, D=64);
  3. a short same-seed train-step A/B (fused vs UNIIR_ATTN_BWD=einsum)
     produces loss curves that track within bf16 noise.

Usage (real chip): python scripts/chip_check_attn_bwd.py [--steps 6]
Prints PASS/FAIL per check; exits non-zero on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def check_kernel_parity(jax, jnp, np, on_tpu):
    from uniir_tpu.ops.attention_pallas import _einsum_bwd, mha_paired_stack_bwd

    shapes = [
        # (B, L, H, D, causal)  -- the two shapes the CLIP-L train step runs
        (8 if not on_tpu else 32, 257, 16, 64, False),  # ViT-L/14 vision blocks
        (16 if not on_tpu else 64, 77, 12, 64, True),  # CLIP-L text blocks
    ]
    ok = True
    rng = np.random.default_rng(5)
    for B, L, H, D, causal in shapes:
        W = H * D
        q, k, v, g = (jnp.asarray(rng.standard_normal((B, L, W)), jnp.bfloat16) for _ in range(4))
        scale = D**-0.5
        t0 = time.perf_counter()
        try:
            got = jax.jit(
                lambda q, k, v, g: mha_paired_stack_bwd(
                    q, k, v, g, H, scale, interpret=not on_tpu, causal=causal
                )
            )(q, k, v, g)
            got = [np.asarray(a, np.float32) for a in got]
        except Exception as e:
            print(f"FAIL lower/execute B={B} L={L} causal={causal}: {repr(e)[:300]}")
            ok = False
            continue
        dt = time.perf_counter() - t0
        want = [np.asarray(a, np.float32) for a in _einsum_bwd(q, k, v, g, H, scale, causal)]
        for a, b, name in zip(got, want, "qkv"):
            if np.isnan(a).any():
                print(f"FAIL d{name} has NaNs at B={B} L={L} causal={causal}")
                ok = False
                continue
            err = np.max(np.abs(a - b))
            # bf16 primals + bf16 kernel matmuls vs fp32 oracle over L<=257
            # contractions of O(1) values: tolerance matches the interpret
            # oracle test (tests/test_topk_pallas.py, atol 6e-2)
            status = "PASS" if err <= 8e-2 else "FAIL"
            if status == "FAIL":
                ok = False
            print(f"{status} d{name} B={B} L={L} causal={causal}: max_abs_err={err:.4f} (compile+run {dt:.1f}s)")
    return ok


def check_train_ab(jax, jnp, np, on_tpu, steps):
    """Same-seed short train run, fused vs einsum backward."""
    from uniir_tpu.models.clip import CLIP_CONFIGS
    from uniir_tpu.models.clip_sf import CLIPScoreFusion
    from uniir_tpu.train.optimizer import make_clip_optimizer
    from uniir_tpu.train.state import TrainState
    from uniir_tpu.train.steps import make_clip_train_step

    model_name, bs = ("ViT-L/14", 16) if on_tpu else ("test-tiny", 4)
    cfg = CLIP_CONFIGS[model_name]
    model = CLIPScoreFusion(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    txt = rng.integers(1, cfg.vocab_size - 1, size=(2 * bs, cfg.context_length)).astype(np.int32)
    img = rng.normal(size=(2 * bs, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    mask = np.ones((2 * bs,), np.int32)
    batch = {
        "txt_batched": txt,
        "image_batched": img,
        "txt_mask_batched": mask,
        "image_mask_batched": mask,
    }

    def run(mode):
        # scan the raw step inside ONE jit and fetch the loss trace once:
        # per-step host fetches cost ~53 s each on this rig's remote relay
        # (see bench.py's amortized-scan rationale)
        os.environ["UNIIR_ATTN_BWD"] = mode
        try:
            params = model.init(jax.random.PRNGKey(0), txt[:2], img[:2], mask[:2], mask[:2])["params"]
            tx = make_clip_optimizer(params, learning_rate=1e-4, total_steps=100)
            state = TrainState.create(params=params, tx=tx)
            raw_step = make_clip_train_step(model, jit=False)

            @jax.jit
            def run_steps(state, batch):
                def body(st, _):
                    st2, m = raw_step(st, batch)
                    return st2, m["loss"]

                _, losses = jax.lax.scan(body, state, None, length=steps)
                return losses

            return [float(x) for x in np.asarray(run_steps(state, batch), np.float32)]
        finally:
            os.environ.pop("UNIIR_ATTN_BWD", None)
        return None

    t0 = time.perf_counter()
    fused = run("pallas")
    einsum = run("einsum")
    print(f"fused  losses: {[round(x, 4) for x in fused]}")
    print(f"einsum losses: {[round(x, 4) for x in einsum]}")
    diffs = [abs(a - b) for a, b in zip(fused, einsum)]
    # identical init + identical batch; divergence only from bwd precision.
    # The loss is O(log bs); allow bf16-grad drift to compound over steps.
    tol = 0.05 + 0.05 * steps
    status = "PASS" if max(diffs) <= tol and all(np.isfinite(fused)) else "FAIL"
    print(f"{status} train A/B: max loss divergence {max(diffs):.4f} (tol {tol:.2f}, {time.perf_counter() - t0:.0f}s)")
    return status == "PASS"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--skip-ab", action="store_true")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"platform: {jax.devices()[0].platform} ({'compiled kernel' if on_tpu else 'interpret-mode smoke'})")

    ok = check_kernel_parity(jax, jnp, np, on_tpu)
    if not args.skip_ab:
        ok = check_train_ab(jax, jnp, np, on_tpu, args.steps) and ok
    print("ALL PASS" if ok else "FAILURES -- keep UNIIR_ATTN_BWD=einsum as the default escape hatch")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
