import numpy as np
import pytest
from PIL import Image

from uniir_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
from uniir_tpu.ops.image_ops import (
    pallas_fused_preprocess,
    preprocess_images,
    preprocess_reference_numpy,
    resize_matrix,
)


def test_resize_matrix_rows_sum_to_one():
    for method in ("bilinear", "bicubic"):
        A = resize_matrix(256, 224, method)
        np.testing.assert_allclose(A.sum(axis=1), 1.0, atol=1e-5)
        A_up = resize_matrix(16, 32, method)
        np.testing.assert_allclose(A_up.sum(axis=1), 1.0, atol=1e-5)


def test_matrix_resize_matches_pil_bilinear():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    A = resize_matrix(64, 32, "bilinear")
    ours = np.einsum("oh,hwc->owc", A, np.einsum("pw,hwc->hpc", A, img.astype(np.float32) / 255.0).transpose(0, 1, 2))
    # simpler: full reference path
    ours = preprocess_reference_numpy(img[None], out_size=32)[0]
    pil = Image.fromarray(img).resize((32, 32), Image.BILINEAR)
    pil_norm = (np.asarray(pil, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(ours, pil_norm, atol=0.05)  # PIL uses slightly different tap handling at borders
    # interior pixels should be very close
    np.testing.assert_allclose(ours[4:-4, 4:-4], pil_norm[4:-4, 4:-4], atol=0.02)


def test_preprocess_images_jit_matches_numpy():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(3, 48, 48, 3), dtype=np.uint8)
    out = np.asarray(preprocess_images(imgs, out_size=32))
    ref = preprocess_reference_numpy(imgs, out_size=32)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_fused_preprocess_interpret():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, size=(2, 48, 48, 3), dtype=np.uint8)
    out = np.asarray(pallas_fused_preprocess(imgs, out_size=32, interpret=True))
    ref = preprocess_reference_numpy(imgs, out_size=32)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bicubic_upscale_identity_on_constant():
    imgs = np.full((1, 16, 16, 3), 128, np.uint8)
    out = np.asarray(preprocess_images(imgs, out_size=24, method="bicubic"))
    expected = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[0, 5, 5], expected, atol=1e-4)
