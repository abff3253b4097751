"""Native C++ staging library vs numpy reference."""

import numpy as np
import pytest

from tubedetr_tpu.data import native
from tubedetr_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def numpy_reference(frames, pad_h, pad_w):
    t, h, w, _ = frames.shape
    out = np.zeros((t, pad_h, pad_w, 3), np.float32)
    x = frames.astype(np.float32) / 255.0
    out[:, :h, :w] = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return out


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of staging.cc failed"


def test_stage_clip_matches_numpy():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, 17, 23, 3), dtype=np.uint8)
    out = native.stage_clip(frames, 24, 32)
    ref = numpy_reference(frames, 24, 32)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_gather_strided_matches_slice():
    rng = np.random.RandomState(1)
    clip = rng.randn(7, 4, 5, 3).astype(np.float32)
    out = native.gather_strided(clip, 3)
    np.testing.assert_array_equal(out, clip[::3])
