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


def _einsum_reference(frames, ah, aw, normalize):
    x = np.einsum(
        "oh,nhwc,pw->nopc",
        ah.astype(np.float64),
        frames.astype(np.float64) / 255.0,
        aw.astype(np.float64),
    )
    if normalize:
        x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return x.astype(np.float32)


@pytest.mark.parametrize("normalize", [True, False])
def test_resize_normalize_clip_matches_einsum(normalize):
    """Native CSR separable resize == dense einsum, incl. a composed
    (resize->crop->resize) operator with >2 nonzeros per row."""
    from tubedetr_tpu.ops.preprocess import _interp_matrix

    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (4, 31, 27, 3), dtype=np.uint8)
    # composed operator: 31 -> 21 then crop [3, 3+14) -> 12
    ah = (_interp_matrix(21, 12, 3.0, 14.0) @ _interp_matrix(31, 21)).astype(
        np.float32
    )
    aw = (_interp_matrix(19, 10, 2.0, 15.0) @ _interp_matrix(27, 19)).astype(
        np.float32
    )
    out = native.resize_normalize_clip(frames, ah, aw, normalize=normalize)
    ref = _einsum_reference(frames, ah, aw, normalize)
    assert out.shape == (4, 12, 10, 3)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_resize_normalize_clip_numpy_fallback_matches(monkeypatch):
    from tubedetr_tpu.ops.preprocess import _interp_matrix

    monkeypatch.setattr(native, "get_lib", lambda *a, **k: None)
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (2, 16, 14, 3), dtype=np.uint8)
    ah = _interp_matrix(16, 8)
    aw = _interp_matrix(14, 6)
    out = native.resize_normalize_clip(frames, ah, aw)
    ref = _einsum_reference(frames, ah, aw, True)
    np.testing.assert_allclose(out, ref, atol=2e-4)
