"""Shared Flax transformer building blocks (TPU-first).

Used by the CLIP towers, BLIP ViT, MED BERT and the T5 fusion stack.  Design
choices for the MXU/XLA:
  * NHWC images + `nn.Conv` patch embedding (feature-minor layout).
  * fused QKV projection, attention via `jnp.einsum` in a configurable compute
    dtype (bf16 by default on TPU) with fp32 softmax accumulation.
  * pre-LN blocks with optional `jax.checkpoint` rematerialization, replacing
    fairscale checkpoint_wrapper (reference src/models/uniir_blip/backbone/vit.py:146-148).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (torch.nn.GELU default) -- weight-import parity with
    timm ViT and HF BERT requires the exact form, not flax's tanh approx."""
    return nn.gelu(x, approximate=False)


ACTIVATIONS: dict = {"gelu": gelu_exact, "quick_gelu": quick_gelu, "relu": nn.relu}


def static_scales(mod):
    """Calibrated `act_scales` leaf under `mod`'s param path, or None.

    Only consulted under UNIIR_INT8_BACKEND=static; written by
    ops.quant.quantize_tree from ops.calibrate.calibrate_act_scales."""
    import os

    if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static" and mod.has_variable(
        "params", "act_scales"
    ):
        return mod.get_variable("params", "act_scales")
    return None


def make_dense(features: int, *, dtype, quant: bool, name: str, use_bias: bool = True, kernel_init=None):
    """nn.Dense or its int8 twin (uniir_tpu.ops.quant.QuantDense)."""
    if quant:
        from uniir_tpu.ops.quant import QuantDense

        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    kwargs = {} if kernel_init is None else {"kernel_init": kernel_init}
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name, **kwargs)


class QKVProj(nn.Module):
    """Fused [W, 3W] qkv parameter applied as three separate dots.

    The param layout matches torch's fused in_proj (converter writes the
    transpose straight in); computing q/k/v as separate dots keeps each
    output contiguous for the attention kernel (slicing one [B,L,3W] output
    costs three full activation copies).
    """

    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None):
        W = self.width
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (W, 3 * W), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (3 * W,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        kv_src = x if kv is None else kv

        def dot(inp, i):
            return inp @ kernel[:, i * W : (i + 1) * W] + bias[i * W : (i + 1) * W]

        return dot(x, 0), dot(kv_src, 1), dot(kv_src, 2)


class MultiHeadAttention(nn.Module):
    """Multi-head self-attention with a FUSED qkv projection.

    One [W, 3W] matmul replaces three [W, W] matmuls: fewer, larger MXU ops
    and (on the int8 path) a single activation quantization shared by q/k/v.
    The `kv` argument serves the last-block pooled-query trim (layers below):
    both operands go through the same fused projection and the relevant
    slices are used.
    """

    width: int
    num_heads: int
    dtype: Dtype = jnp.float32
    out_init: Callable = nn.initializers.xavier_uniform()
    quant: bool = False  # int8 projections (inference path)
    fused: bool = False  # paired-head Pallas attention
    causal: bool = False  # lower-triangular self-attention (CLIP text tower)

    @nn.compact
    def __call__(self, x, kv=None, mask=None, flat=None):
        # x: [B, Lq, W]; kv: [B, Lk, W] or None (self-attention)
        #
        # `flat=(B, Lp, l_valid)` is the padded-flat serving contract
        # (UNIIR_INT8_FLAT): x is [B*Lp, W] with Lp a multiple of 8, so the
        # q/k/v/out projections below run as 2-D dots with agreeing {1,0}
        # layouts -- over 3-D [B, 257, W] operands XLA lowers them through
        # convolution emitters whose layout preferences disagree, costing a
        # 270 MB s8 relayout per layer on the static-int8 path (measured
        # round 5, docs/PERFORMANCE.md).  [B*Lp, W] <-> [B, Lp, W] reshapes
        # are layout-preserving bitcasts because Lp is tile-aligned; only
        # the attention kernel sees 3-D, with the true length in l_valid.
        head_dim = self.width // self.num_heads
        W = self.width
        if flat is not None:
            assert kv is None and mask is None, "flat mode is self-attention only"
            assert x.ndim == 2 and x.shape[0] == flat[0] * flat[1], (x.shape, flat)

        # Static-int8 serving (UNIIR_INT8_BACKEND=static): a calibrated
        # `act_scales` leaf [a_qkv, a_out] under this module's path (written
        # by quantize_tree from ops/calibrate.py) switches both projections to
        # static per-tensor activation scales -- no amax reduce, quant fuses
        # into the preceding LN / attention epilogue.  Absent the leaf (e.g.
        # an uncalibrated submodel like MED) the dynamic path is used.
        a_attn = None
        if self.quant:
            import os

            if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static" and self.has_variable(
                "params", "act_scales"
            ):
                a_attn = self.get_variable("params", "act_scales")  # [a_qkv, a_out] f32

        if self.quant:
            # int8: ONE fused projection so q/k/v share a single activation
            # quantization pass (the dominant int8 overhead).
            from uniir_tpu.ops.quant import QuantDense

            qkv_dense = QuantDense(3 * W, dtype=self.dtype, name="qkv_proj")
            a_in = None if a_attn is None else a_attn[0]
            if kv is None:
                # three column-sliced matmuls, NOT one [B,L,3W] output that
                # gets sliced: activation slices cost three full [B,L,W]
                # copies (~30 ms/rep measured in the round-3 profile), while
                # the three identical quantize-activation subgraphs are
                # CSE'd by XLA into a single quant pass
                q = qkv_dense(x, columns=(0, W), a_static=a_in)
                k = qkv_dense(x, columns=(W, 2 * W), a_static=a_in)
                v = qkv_dense(x, columns=(2 * W, 3 * W), a_static=a_in)
            else:
                # cross-attention: slice the quantized kernel columns so each
                # operand pays only the thirds it uses (q for x, k/v for kv)
                q = qkv_dense(x, columns=(0, W), a_static=a_in)
                kv_out = qkv_dense(kv, columns=(W, 3 * W), a_static=a_in)
                k, v = kv_out[..., :W], kv_out[..., W:]
        else:
            # bf16: same fused [W, 3W] param, but three dots over kernel
            # SLICES -- weight slices are 2 MB copies, while slicing a fused
            # [B,L,3W] activation would copy ~400 MB/layer (measured -6%
            # end-to-end).
            qkv = QKVProj(W, dtype=self.dtype, name="qkv_proj")
            q, k, v = qkv(x) if kv is None else qkv(x, kv)
        kv_src = x if kv is None else kv

        def out_proj(out):
            # calibration probe point: amax of the attention output feeding
            # out_proj (the a_out static scale); no-op unless the
            # "intermediates" collection is mutable (capture_intermediates)
            self.sow("intermediates", "attn_pre_out", out)
            if self.quant:
                from uniir_tpu.ops.quant import QuantDense

                return QuantDense(self.width, dtype=self.dtype, name="out_proj")(
                    out, a_static=None if a_attn is None else a_attn[1]
                )
            return nn.Dense(
                self.width, dtype=self.dtype, name="out_proj", kernel_init=self.out_init
            )(out)

        if flat is not None:
            Bf, Lp, l_valid = flat
            q3, k3, v3 = (t.reshape(Bf, Lp, W) for t in (q, k, v))  # bitcasts
            if self.fused and self.dtype == jnp.bfloat16:
                from uniir_tpu.ops.attention_pallas import mha_paired_stack, paired_attention_supported

                on_tpu = jax.default_backend() == "tpu"
                if paired_attention_supported(self.num_heads, self.width, on_tpu):
                    # direct kernel call (not the custom_vjp wrapper): flat
                    # mode is inference-only (gated on quant serving)
                    out = mha_paired_stack(
                        q3, k3, v3, self.num_heads, head_dim**-0.5,
                        interpret=not on_tpu, causal=self.causal, l_valid=l_valid,
                    )
                    return out_proj(out.reshape(Bf * Lp, W))
            # einsum fallback: mask the pad keys explicitly
            mask = (jnp.arange(Lp) < l_valid)[None, None, None, :]
            if self.causal:
                mask = mask & jnp.tril(jnp.ones((Lp, Lp), dtype=bool))[None, None]
            q, k, v = q3, k3, v3
            B, Lq = Bf, Lp
            Lk = Lp
        elif self.fused and mask is None and kv is None and self.dtype == jnp.bfloat16:
            from uniir_tpu.ops.attention_pallas import paired_attention, paired_attention_supported

            on_tpu = jax.default_backend() == "tpu"
            if paired_attention_supported(self.num_heads, self.width, on_tpu):
                out = paired_attention(
                    q, k, v, self.num_heads, head_dim**-0.5, not on_tpu, self.causal
                )
                return out_proj(out)

        if flat is None:
            B, Lq = x.shape[0], x.shape[1]
            Lk = kv_src.shape[1]
        if self.causal and mask is None:
            # self-attention einsum fallback builds the triangular mask here
            mask = jnp.tril(jnp.ones((Lq, Lk), dtype=bool))[None, None]
        q = q.reshape(B, Lq, self.num_heads, head_dim)
        k = k.reshape(B, Lk, self.num_heads, head_dim)
        v = v.reshape(B, Lk, self.num_heads, head_dim)

        scale = head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        if mask is not None:
            # mask: broadcastable to [B, H, Lq, Lk]; 0 -> masked
            big_neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(mask, logits, big_neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, self.width)
        if flat is not None:
            out = out.reshape(B * Lq, self.width)
        return out_proj(out)


class MLP(nn.Module):
    width: int
    hidden_width: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, res=None):
        """With `res` the residual add rides inside the MLP: returns
        `res + fc2(act(fc1(x)))`.  That ownership is what lets the
        static-int8 serving path (`UNIIR_INT8_BACKEND=static`) run the whole
        half-block as ONE Pallas kernel on the int8 MXU with the [M, 4W]
        hidden never leaving VMEM (ops/mlp_pallas.py); it needs calibrated
        `act_scales` in the param tree (ops/calibrate.py + quantize_tree).
        Without calibrated scales (e.g. an uncalibrated submodel) the static
        backend falls back to dynamic per-row quantization; with scales but an
        unsupported shape/act (T5's relu FFN, unaligned widths) the two dense
        matmuls still use the static scales individually."""
        a = None
        if self.quant:
            import os

            if os.environ.get("UNIIR_INT8_BACKEND", "xla") == "static" and self.has_variable(
                "params", "act_scales"
            ):
                a = self.get_variable("params", "act_scales")  # [a1, a2] f32
        if a is not None and res is not None:
            import os

            from uniir_tpu.ops.mlp_pallas import fused_int8_mlp, fused_int8_mlp_supported
            from uniir_tpu.ops.quant import QuantParams

            # UNIIR_INT8_MLP picks the static-path MLP formulation: "xla"
            # (DEFAULT) = plain static-scale XLA matmuls (quant fuses into
            # the producing LN, dequant into the consumer); "fused" = the
            # Pallas megakernel (ops/mlp_pallas.py).  Measured on v5e
            # (CLIP-L batch 256, docs/PERFORMANCE.md): the megakernel's
            # matmul time equals XLA's, but its 2-D [M, W] operand forces a
            # materialized [B,L,W]->[B*L,W] tiled-layout reshape copy
            # (~48 ms/rep of copy + ~15 ms of unfused elementwise), so XLA
            # wins end-to-end: 1304 vs 889 pairs/s.
            use_fused = os.environ.get("UNIIR_INT8_MLP", "xla") == "fused"
            if use_fused and fused_int8_mlp_supported(self.width, self.hidden_width, self.act):
                w1q, s1, b1 = QuantParams(x.shape[-1], self.hidden_width, name="fc1")()
                w2q, s2, b2 = QuantParams(self.hidden_width, self.width, name="fc2")()
                return fused_int8_mlp(
                    x, res, w1q, s1, b1, w2q, s2, b2, a[0], a[1],
                    act=self.act, interpret=jax.default_backend() != "tpu",
                ).astype(self.dtype)
        if self.quant:
            from uniir_tpu.ops.quant import QuantDense

            h = QuantDense(self.hidden_width, dtype=self.dtype, name="fc1")(
                x, a_static=None if a is None else a[0]
            )
            h = ACTIVATIONS[self.act](h)
            h = QuantDense(self.width, dtype=self.dtype, name="fc2")(
                h, a_static=None if a is None else a[1]
            )
            return h if res is None else res + h
        x = make_dense(self.hidden_width, dtype=self.dtype, quant=False, name="fc1")(x)
        x = ACTIVATIONS[self.act](x)
        x = make_dense(self.width, dtype=self.dtype, quant=False, name="fc2")(x)
        return x if res is None else res + x


class TransformerBlock(nn.Module):
    """Pre-LN residual block (CLIP ResidualAttentionBlock / timm Block shape)."""

    width: int
    num_heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    quant: bool = False
    fused_attention: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None, pool_idx=None, flat=None):
        attn = MultiHeadAttention(
            self.width,
            self.num_heads,
            dtype=self.dtype,
            quant=self.quant,
            fused=self.fused_attention,
            causal=self.causal,
            name="attn",
        )
        mlp = MLP(self.width, int(self.width * self.mlp_ratio), act=self.act, dtype=self.dtype, quant=self.quant, name="mlp")
        ln_1 = nn.LayerNorm(dtype=self.dtype, name="ln_1")
        ln_2 = nn.LayerNorm(dtype=self.dtype, name="ln_2")

        if pool_idx is None:
            # identical math for 3-D [B, L, W] and padded-flat [B*Lp, W]
            # inputs: LN/MLP/residual are elementwise over rows; only the
            # attention module needs the (B, Lp, l_valid) structure.
            h = ln_1(x)
            x = x + attn(h, mask=mask, flat=flat)
            return mlp(ln_2(x), res=x)
        assert flat is None, "pooled blocks take 3-D input (Transformer unflattens first)"

        # Pooled-query block: downstream only reads the token at pool_idx
        # ([B] int32), so run attention with a single query row and the MLP on
        # one token -- mathematically identical output for that token, ~1/L of
        # the block's FLOPs.  Used for the LAST block of pooled towers only
        # (earlier blocks feed every position back through attention).
        B, L = x.shape[0], x.shape[1]
        idx = pool_idx.astype(jnp.int32)[:, None, None]
        h = ln_1(x)
        hq = jnp.take_along_axis(h, idx, axis=1)  # [B, 1, W]
        xq = jnp.take_along_axis(x, idx, axis=1)
        qmask = None
        if mask is not None:
            # the pooled query's row of the [.., Lq, Lk] mask
            m = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
            qmask = jnp.take_along_axis(m, idx[:, None, :, 0:1], axis=2)  # [B, 1|H, 1, Lk]
        elif self.causal:
            # the pooled query attends to positions <= its own (its causal row)
            qmask = (jnp.arange(L)[None, :] <= pool_idx[:, None])[:, None, None, :]
        xq = xq + attn(hq, kv=h, mask=qmask)
        return mlp(ln_2(xq), res=xq)


class Transformer(nn.Module):
    """Stack of pre-LN blocks with optional rematerialization.

    `remat` trades FLOPs for HBM (jax.checkpoint), the TPU-native form of the
    reference's fairscale checkpoint_wrapper on the last `ckpt_layer` blocks.
    """

    width: int
    layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool = False
    fused_attention: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None, pool_idx=None, flat=None):
        """With `pool_idx` ([B] int32), the LAST block computes only the
        pooled token's output (returns [B, 1, W]) -- exact for pooled towers
        where every other final-layer position is discarded.

        With `flat=(B, Lp, l_valid)` (padded-flat serving, see
        MultiHeadAttention), `x` is [B*Lp, W]; the stack runs flat and the
        pooled last block gets the 3-D bitcast view plus a pad-key mask.
        Without `pool_idx` the FLAT array is returned -- callers slice the
        valid rows."""
        assert not (self.remat and flat is not None), "flat serving mode has no remat"
        # causal flat would need the tril folded into the pooled block's key
        # mask; only the non-causal vision tower uses flat today
        assert not (self.causal and flat is not None and pool_idx is not None), "causal pooled flat unsupported"
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=())
        for i in range(self.layers):
            blk = block_cls(
                self.width,
                self.num_heads,
                self.mlp_ratio,
                act=self.act,
                dtype=self.dtype,
                quant=self.quant,
                fused_attention=self.fused_attention,
                causal=self.causal,
                name=f"resblocks_{i}",
            )
            if i == self.layers - 1 and pool_idx is not None:
                if flat is not None:
                    B, Lp, l_valid = flat
                    x = x.reshape(B, Lp, self.width)  # bitcast (Lp % 8 == 0)
                    key_mask = jnp.broadcast_to(
                        (jnp.arange(Lp) < l_valid)[None, None, None, :], (1, 1, Lp, Lp)
                    )
                    mask = key_mask if mask is None else mask & key_mask
                x = blk(x, mask, pool_idx)
            else:
                x = blk(x, mask, flat=flat)
        return x


class PatchEmbed(nn.Module):
    """Conv patch embedding over NHWC images."""

    width: int
    patch_size: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 3] -> [B, (H/p)*(W/p), width]
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
        B, gh, gw, C = x.shape
        return x.reshape(B, gh * gw, C)


def interpolate_pos_embed(pos_embed: jnp.ndarray, num_patches_new: int, num_prefix_tokens: int = 1) -> jnp.ndarray:
    """Bicubic 2-D resize of grid position embeddings on resolution change.

    Functional equivalent of the reference's checkpoint-load interpolation
    (reference src/models/uniir_blip/backbone/vit.py:359-384).
    pos_embed: [L, D] or [1, L, D] with `num_prefix_tokens` leading tokens.
    """
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    gs_old = int(round(grid.shape[1] ** 0.5))
    gs_new = int(round(num_patches_new**0.5))
    if gs_old != gs_new:
        D = grid.shape[-1]
        grid = grid.reshape(1, gs_old, gs_old, D)
        grid = jax.image.resize(grid, (1, gs_new, gs_new, D), method="bicubic")
        grid = grid.reshape(1, gs_new * gs_new, D)
    out = jnp.concatenate([prefix, grid], axis=1)
    return out[0] if squeeze else out
