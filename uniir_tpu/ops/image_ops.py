"""Device-side fused image preprocessing (resize + crop + CLIP-normalize).

Replaces the reference's host-side torchvision/PIL pipeline
(reference blip_transform.py, clip preprocess) for the throughput path: the
host only decodes JPEG to a fixed-size uint8 array (see
`data.preprocess.raw_resize_uint8`); the resize-to-model-resolution, dtype
conversion and normalization run on the TPU.

TPU-native formulation: separable resampling as two small matmuls --
``out = A_h @ img @ A_w.T`` with interpolation matrices A (2 taps/row for
bilinear, 4 for bicubic).  That puts the work on the MXU and lets XLA fuse
the normalization; `pallas_fused_preprocess` additionally fuses the uint8
conversion + both matmuls + normalize into a single VMEM-resident kernel (no
HBM intermediates).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uniir_tpu.data.preprocess import CLIP_MEAN, CLIP_STD


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (PIL/torch 'bicubic', a=-0.5)."""
    x = np.abs(x)
    out = np.where(
        x <= 1,
        (a + 2) * x**3 - (a + 3) * x**2 + 1,
        np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
    )
    return out


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


@lru_cache(maxsize=64)
def resize_matrix(src: int, dst: int, method: str = "bilinear", antialias: bool = True) -> np.ndarray:
    """[dst, src] interpolation matrix with align_corners=False sampling.

    With `antialias` (the default, matching PIL/torchvision semantics) the
    filter support is widened by the downscale factor, which is exactly what
    PIL's convolution resampling does -- resize stays a fixed linear map, just
    with more taps per row.
    """
    kernel, base_support = (_triangle_kernel, 1.0) if method == "bilinear" else (_cubic_kernel, 2.0)
    scale = src / dst
    filt_scale = max(1.0, scale) if antialias else 1.0
    support = base_support * filt_scale
    centers = (np.arange(dst) + 0.5) * scale - 0.5
    A = np.zeros((dst, src), np.float32)
    for i in range(dst):
        # PIL window semantics: clip to the image and renormalize over the
        # clipped window (no edge-tap accumulation)
        lo = max(0, int(centers[i] - support + 1.0))
        hi = min(src, int(centers[i] + support + 1.0) + 1)
        taps = np.arange(lo, hi)
        weights = kernel((taps - centers[i]) / filt_scale)
        wsum = weights.sum()
        if wsum <= 0:
            taps = np.array([min(src - 1, max(0, int(round(centers[i]))))])
            weights = np.array([1.0])
            wsum = 1.0
        A[i, taps] = weights / wsum
    return A


def _crop_bounds(src: int, out: int, resize_to: int) -> Tuple[int, int]:
    """Center-crop `out` from a virtual resize to `resize_to` (shortest side)."""
    start = (resize_to - out) // 2
    return start, start + out


@partial(jax.jit, static_argnames=("out_size", "method", "out_dtype"))
def preprocess_images(
    images_u8: jnp.ndarray,
    out_size: int = 224,
    method: str = "bilinear",
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 [B, H, W, 3] square inputs -> normalized [B, out, out, 3].

    Shortest-side semantics are assumed handled on the host (inputs already
    square, e.g. 256x256); this performs resize-to-out_size + normalize via
    two MXU matmuls.
    """
    B, H, W, C = images_u8.shape
    Ah = jnp.asarray(resize_matrix(H, out_size, method))
    Aw = jnp.asarray(resize_matrix(W, out_size, method))
    x = images_u8.astype(jnp.float32) / 255.0
    # [out,H]@[B,H,W,C] over H, then over W
    x = jnp.einsum("oh,bhwc->bowc", Ah, x)
    x = jnp.einsum("pw,bowc->bopc", Aw, x)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return x.astype(out_dtype)


def pallas_fused_preprocess(
    images_u8: jnp.ndarray,
    out_size: int = 224,
    method: str = "bilinear",
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-kernel fused convert+resize+normalize (one image per grid step).

    The whole source image, both interpolation matrices and the output tile
    live in VMEM; no intermediate ever touches HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = images_u8.shape
    O = out_size
    Ah = jnp.asarray(resize_matrix(H, O, method))  # [O, H]
    AwT = jnp.asarray(resize_matrix(W, O, method).T)  # [W, O]
    mean = [float(v) for v in CLIP_MEAN]
    inv_std = [float(1.0 / v) for v in CLIP_STD]

    # Planar layout: Mosaic wants clean 2-D tiles, so each channel is an
    # independent [H, W] slab: out_c = (Ah @ img_c) @ Aw.T.
    planar = jnp.transpose(images_u8, (0, 3, 1, 2))  # [B, C, H, W] uint8

    def kernel(img_ref, ah_ref, awt_ref, out_ref):
        ah = ah_ref[...]
        awt = awt_ref[...]
        for c in range(C):
            # Mosaic has no direct uint8->float cast; go via int32
            img_c = img_ref[0, c].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
            x = jnp.dot(ah, img_c, preferred_element_type=jnp.float32)  # [O, W]
            x = jnp.dot(x, awt, preferred_element_type=jnp.float32)  # [O, O]
            out_ref[0, c] = ((x - mean[c]) * inv_std[c]).astype(out_ref.dtype)

    out_planar = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, O, O), out_dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((O, H), lambda b: (0, 0)),
            pl.BlockSpec((W, O), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, O, O), lambda b: (b, 0, 0, 0)),
        interpret=interpret,
    )(planar, Ah, AwT)
    return jnp.transpose(out_planar, (0, 2, 3, 1))  # back to NHWC


def preprocess_reference_numpy(images_u8: np.ndarray, out_size: int = 224, method: str = "bilinear") -> np.ndarray:
    """Matrix-resize reference in numpy for tests."""
    B, H, W, C = images_u8.shape
    Ah = resize_matrix(H, out_size, method)
    Aw = resize_matrix(W, out_size, method)
    x = images_u8.astype(np.float32) / 255.0
    x = np.einsum("oh,bhwc->bowc", Ah, x)
    x = np.einsum("pw,bowc->bopc", Aw, x)
    return (x - CLIP_MEAN) / CLIP_STD
