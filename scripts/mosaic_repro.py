"""Bisect the Mosaic crash in the split-K attention kernel (round 5).

The compiled path dies with `Check failed: limits[i] <= dim(i) (32 vs. 1)`
while interpret mode passes.  Each VARIANT compiles one candidate op
pattern in isolation on the real chip; the crash is a hard CHECK (SIGABRT)
so one variant runs per process:

    UNIIR_REPRO=reduce01 python scripts/mosaic_repro.py

Shapes mirror the serving kernel: Lp=264, W=1024 blocks, bf16.
"""

import functools
import os
import sys

import numpy as np


def main():
    variant = os.environ.get("UNIIR_REPRO", "reduce01")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if variant.startswith("real"):
        # the real split-K kernel at tiny batch; realh2 = one head pair
        # (lane offset 0 only), realh4 = two pairs (non-zero lane offsets),
        # realh16 = the serving head count
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from uniir_tpu.ops.attention_pallas import mha_paired_stack

        heads = int(variant[5:])
        B, L, lv = 4, 264, 257
        W = heads * 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)
        out = mha_paired_stack(q, k, v, heads, l_valid=lv)
        print(variant, "OK", np.asarray(out[0, :1, :2], np.float32).tolist())
        return

    if variant in ("skA", "skC", "skD"):
        # skA: sk1 with the matmuls over the FULL 264-row refs (base-kernel
        #      formulation sanity check through this code path)
        # skC: K/V pre-sliced to 256 rows at the XLA level, passed as their
        #      own operands -- the kernel never slices sublanes
        # skD: skC + last-key correction from [B,32,W] broadcast operands
        B, Lp, W = 4, 264, 128
        Km = 256
        hd = 64

        def kernel(q_ref, k_ref, v_ref, kl_ref, vl_ref, o_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 1)
            half0 = (lane < hd).astype(jnp.bfloat16)
            half1 = jnp.bfloat16(1) - half0
            scale = jnp.bfloat16(hd**-0.5)
            q2 = q_ref[0, :, :]
            qcat = jnp.concatenate([q2 * (half0 * scale), q2 * (half1 * scale)], axis=0)
            km = k_ref[0, :, :]
            vm = v_ref[0, :, :]
            nk = km.shape[0]
            s_main = jax.lax.dot_general(
                qcat, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            m = jnp.max(s_main, axis=-1, keepdims=True)
            if variant == "skD":
                k_last = jnp.max(kl_ref[0, :, :], axis=0, keepdims=True)  # rows equal
                s_last = jnp.sum((qcat * k_last).astype(jnp.float32), axis=-1, keepdims=True)
                m = jnp.maximum(m, s_last)
            e = jnp.exp(s_main - m)
            rsum = jnp.sum(e, axis=-1, keepdims=True)
            if variant == "skD":
                e_last = jnp.exp(s_last - m)
                rsum = rsum + e_last
            p = e.astype(jnp.bfloat16)
            o0 = jax.lax.dot_general(
                p[:Lp], vm * half0[:nk], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o1 = jax.lax.dot_general(
                p[Lp:], vm * half1[:nk], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "skD":
                p_last = e_last.astype(jnp.bfloat16)
                v_last0 = jnp.max(vl_ref[0, :, :] * half0[:32], axis=0, keepdims=True)
                v_last1 = jnp.max(vl_ref[0, :, :] * half1[:32], axis=0, keepdims=True)
                zf = jnp.zeros((Lp, 128), jnp.bfloat16)
                o0 = o0 + ((zf + p_last[:Lp]) * v_last0).astype(jnp.float32)
                o1 = o1 + ((zf + p_last[Lp:]) * v_last1).astype(jnp.float32)
            o = o0 * (1.0 / rsum[:Lp]) + o1 * (1.0 / rsum[Lp:])
            o_ref[0, :, :] = o.astype(o_ref.dtype)

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        if variant == "skA":
            k_main, v_main = k, v
            nk = Lp
        else:
            k_main = jax.lax.slice_in_dim(k, 0, Km, axis=1)
            v_main = jax.lax.slice_in_dim(v, 0, Km, axis=1)
            nk = Km
        k_lastb = jnp.broadcast_to(jax.lax.slice_in_dim(k, Km, Km + 1, axis=1), (B, 32, W))
        v_lastb = jnp.broadcast_to(jax.lax.slice_in_dim(v, Km, Km + 1, axis=1), (B, 32, W))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, Lp, W), jnp.bfloat16),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, nk, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, nk, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 32, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 32, W), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0)),
        )(q, k_main, v_main, k_lastb, v_lastb)
        print(variant, "OK", np.asarray(out[0, :1, :2], np.float32).tolist())
        return

    if variant.startswith("sk"):
        # the split-K kernel body at one head pair, built up in stages:
        #   sk1: main 256-key matmul + softmax + PV (no last key at all)
        #   sk2: + the last-key logit column riding m and rsum
        #   sk3: + the last-key value correction (the full kernel)
        B, Lp, W = 4, 264, 128
        Km = 256
        hd = 64
        NEG = -1e30

        def kernel(q_ref, k_ref, v_ref, o_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 1)
            half0 = (lane < hd).astype(jnp.bfloat16)
            half1 = jnp.bfloat16(1) - half0
            rowv = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 0)
            lastrow = rowv == Km
            zero = jnp.bfloat16(0)
            scale = jnp.bfloat16(hd**-0.5)
            q2 = q_ref[0, :, :]
            qcat = jnp.concatenate([q2 * (half0 * scale), q2 * (half1 * scale)], axis=0)
            km = k_ref[0, :Km, :]
            s_main = jax.lax.dot_general(
                qcat, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            m = jnp.max(s_main, axis=-1, keepdims=True)
            if variant != "sk1":
                k_last = jnp.sum(jnp.where(lastrow, k_ref[0, :, :], zero), axis=0, keepdims=True)
                s_last = jnp.sum((qcat * k_last).astype(jnp.float32), axis=-1, keepdims=True)
                m = jnp.maximum(m, s_last)
            e = jnp.exp(s_main - m)
            rsum = jnp.sum(e, axis=-1, keepdims=True)
            if variant != "sk1":
                e_last = jnp.exp(s_last - m)
                rsum = rsum + e_last
            p = e.astype(jnp.bfloat16)
            vm = v_ref[0, :Km, :]
            o0 = jax.lax.dot_general(
                p[:Lp], vm * half0[:Km], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o1 = jax.lax.dot_general(
                p[Lp:], vm * half1[:Km], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "sk3":
                p_last = e_last.astype(jnp.bfloat16)
                v_last0 = jnp.sum(
                    jnp.where(lastrow, v_ref[0, :, :] * half0, zero), axis=0, keepdims=True
                )
                v_last1 = jnp.sum(
                    jnp.where(lastrow, v_ref[0, :, :] * half1, zero), axis=0, keepdims=True
                )
                zf = jnp.zeros((Lp, 128), jnp.bfloat16)
                o0 = o0 + ((zf + p_last[:Lp]) * v_last0).astype(jnp.float32)
                o1 = o1 + ((zf + p_last[Lp:]) * v_last1).astype(jnp.float32)
            o = o0 * (1.0 / rsum[:Lp]) + o1 * (1.0 / rsum[Lp:])
            o_ref[0, :, :] = o.astype(o_ref.dtype)

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, Lp, W)), jnp.bfloat16)
        spec = pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, Lp, W), jnp.bfloat16),
            grid=(B,),
            in_specs=[spec] * 3,
            out_specs=spec,
        )(q, k, v)
        print(variant, "OK", np.asarray(out[0, :1, :2], np.float32).tolist())
        return

    B, Lp, W = 8, 264, 1024
    hd = 64
    Km = 256

    def kernel(x_ref, o_ref):
        x = x_ref[0, :, :128]  # [Lp, 128] bf16
        rowv = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 0)
        lastrow = rowv == Km
        zero = jnp.bfloat16(0)
        if variant == "base":
            o_ref[0, :, :128] = x * jnp.bfloat16(2)
            return
        if variant == "reduce01":
            # masked sublane reduction to [1, 128], then one-sided broadcast
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            o_ref[0, :, :128] = x * last
            return
        if variant == "reduce_only":
            # sublane reduction to [1, 128], written to one output row
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            o_ref[0, :1, :128] = last
            return
        if variant == "lanedot":
            # [2Lp,128] * [1,128] one-sided broadcast + lane reduce -> [2Lp,1]
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            xcat = jnp.concatenate([x, x], axis=0)
            s = jnp.sum((xcat * last).astype(jnp.float32), axis=-1, keepdims=True)
            o_ref[0, :, :128] = (xcat[:Lp] + s[:Lp].astype(jnp.bfloat16)) * jnp.bfloat16(1)
            return
        if variant == "twoside":
            # [Lp,1] x [1,128] two-sided broadcast outer product
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            col = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True).astype(jnp.bfloat16)
            o_ref[0, :, :128] = col * last
            return
        if variant == "bcast2":
            # [2Lp,128] * [1,128] (reduce01 pattern at stacked height)
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            xcat = jnp.concatenate([x, x], axis=0)
            y = xcat * last
            o_ref[0, :, :128] = y[:Lp]
            return
        if variant == "lanered":
            # + fp32 lane reduction of the broadcast product -> [2Lp,1]
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            xcat = jnp.concatenate([x, x], axis=0)
            s = jnp.sum((xcat * last).astype(jnp.float32), axis=-1, keepdims=True)
            o_ref[0, :, :128] = x * s[:Lp].astype(jnp.bfloat16)
            return
        if variant == "chain":
            # outer product via two chained ONE-sided broadcasts
            last = jnp.sum(jnp.where(lastrow, x, zero), axis=0, keepdims=True)
            col = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True).astype(jnp.bfloat16)
            colb = jnp.zeros((Lp, 128), jnp.bfloat16) + col  # [Lp,1] -> [Lp,128]
            o_ref[0, :, :128] = colb * last
            return
        if variant == "elast":
            # exp of a [2Lp,1] column + add into the row-sum denominator
            xcat = jnp.concatenate([x, x], axis=0)
            s = jnp.sum(xcat.astype(jnp.float32), axis=-1, keepdims=True)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s)
            e = jnp.exp(s - m)
            o_ref[0, :, :128] = (xcat[:Lp] * e[:Lp].astype(jnp.bfloat16))
            return
        raise SystemExit(f"unknown variant {variant}")

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, Lp, W)), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lp, W), jnp.bfloat16),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, Lp, W), lambda i: (i, 0, 0)),
    )(x)
    print(variant, "OK", np.asarray(out[0, :2, :2], np.float32).tolist())


if __name__ == "__main__":
    main()
