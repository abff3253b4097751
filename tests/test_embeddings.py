"""Golden parity of sine position/time embeddings against the PyTorch
reference implementation (imported read-only from /root/reference)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tubedetr_tpu.core.embeddings import position_embedding_sine, time_embedding_sine

# fast confidence subset for the 1-core box (VERDICT r2 weak #7)
pytestmark = pytest.mark.quick


REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_pos_encoding():
    torch = pytest.importorskip("torch")
    # load the reference module file directly (its package __init__ pulls in
    # unavailable deps like hostlist)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_position_encoding", f"{REF}/models/position_encoding.py"
    )
    position_encoding = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(position_encoding)
    return torch, position_encoding


def test_position_embedding_sine_matches_reference(ref_pos_encoding):
    torch, pe = ref_pos_encoding
    n, h, w = 3, 7, 9
    rng = np.random.RandomState(0)
    # ragged valid regions per image
    mask = np.ones((n, h, w), dtype=bool)
    for i in range(n):
        vh, vw = rng.randint(3, h + 1), rng.randint(3, w + 1)
        mask[i, :vh, :vw] = False

    module = pe.PositionEmbeddingSine(128, normalize=True)

    from types import SimpleNamespace

    tl = SimpleNamespace(
        tensors=torch.zeros(n, 3, h, w), mask=torch.from_numpy(mask)
    )
    ref = module(tl).numpy()  # (n, 256, h, w)
    ours = np.asarray(position_embedding_sine(jnp.asarray(mask), 128))
    ours_nchw = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, atol=1e-5)


def test_time_embedding_sine_matches_reference(ref_pos_encoding):
    torch, pe = ref_pos_encoding
    module = pe.TimeEmbeddingSine(max_len=200, d_model=256)
    ref = module(200).squeeze(1).numpy()  # (200, 256)
    ours = np.asarray(time_embedding_sine(200, 256))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_masking_helpers():
    from tubedetr_tpu.core import masking as M

    durations = jnp.array([5, 3])
    tm = np.asarray(M.time_pad_mask(durations, 6))
    assert tm.tolist() == [
        [False] * 5 + [True],
        [False] * 3 + [True] * 3,
    ]
    cm = np.asarray(M.clip_pad_mask(durations, 3, 2))
    # ceil(5/2)=3 valid clips; ceil(3/2)=2 valid clips
    assert cm.tolist() == [[False, False, False], [False, False, True]]
    f2c = np.asarray(M.frame_to_clip(7, 3))
    assert f2c.tolist() == [0, 0, 0, 1, 1, 1, 2]
    pm = np.asarray(M.inter_positive_map(jnp.array([[1, 3], [-100, -100]]), 5))
    assert pm.tolist() == [
        [False, True, True, True, False],
        [False] * 5,
    ]


def test_downsample_pad_mask_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from tubedetr_tpu.core.masking import downsample_pad_mask

    rng = np.random.RandomState(1)
    mask = np.ones((4, 224, 200), dtype=bool)
    for i in range(4):
        mask[i, : rng.randint(50, 225), : rng.randint(50, 201)] = False
    ref = (
        F.interpolate(torch.from_numpy(mask)[None].float(), size=(7, 7))
        .bool()[0]
        .numpy()
    )
    ours = np.asarray(downsample_pad_mask(jnp.asarray(mask), 7, 7))
    np.testing.assert_array_equal(ours, ref)
