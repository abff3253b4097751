"""Pallas fused resize+normalize kernel (interpret mode) vs einsum path."""

import numpy as np
import pytest

import jax.numpy as jnp

from tubedetr_tpu.ops.pallas_preprocess import resize_normalize_pallas
from tubedetr_tpu.ops.preprocess import resize_normalize


def test_pallas_matches_einsum_resize():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (2, 36, 48, 3), dtype=np.uint8)
    ref = np.asarray(resize_normalize(frames, 24, 32))
    out = np.asarray(
        resize_normalize_pallas(jnp.asarray(frames), 24, 32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_crop_fused():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (1, 40, 40, 3), dtype=np.uint8)
    crop = (5, 8, 30, 24)
    ref = np.asarray(resize_normalize(frames, 16, 16, crop=crop))
    out = np.asarray(
        resize_normalize_pallas(
            jnp.asarray(frames), 16, 16, crop=crop, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_bf16_output():
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    out = resize_normalize_pallas(
        jnp.asarray(frames), 8, 8, out_dtype=jnp.bfloat16, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(resize_normalize(frames, 8, 8))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, atol=0.05
    )


def test_resize_normalize_bf16_close_to_f32():
    """The TPU-fast bf16 einsum path (normalize-first, which commutes
    exactly with the convex interp) must agree with the f32 HIGHEST path
    to bf16 rounding (~0.4% of the normalized range)."""
    from tubedetr_tpu.ops.preprocess import (
        resize_normalize,
        resize_normalize_bf16,
    )

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (3, 36, 64, 3), dtype=np.uint8)
    ref = np.asarray(resize_normalize(frames, 24, 32), np.float32)
    out = np.asarray(
        resize_normalize_bf16(jnp.asarray(frames), 24, 32,
                              out_dtype=jnp.float32),
        np.float32,
    )
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()
    # crop fusion agrees too
    ref_c = np.asarray(resize_normalize(frames, 24, 32, crop=(4, 8, 28, 48)))
    out_c = np.asarray(
        resize_normalize_bf16(jnp.asarray(frames), 24, 32,
                              crop=(4, 8, 28, 48), out_dtype=jnp.float32)
    )
    assert np.abs(out_c - ref_c).max() < 0.05
