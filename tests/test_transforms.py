"""Transform pipeline tests: resize rule parity, operator composition
exactness, box math, collate/div_vid bookkeeping."""

import numpy as np
import pytest

from tubedetr_tpu.data.collate import VideoSample, collate, split_video_into_clips
from tubedetr_tpu.data.synthetic import make_synthetic_sample
from tubedetr_tpu.data.transforms import (
    make_eval_transform,
    normalize_boxes_cxcywh,
    prepare_boxes,
    sample_train_transform,
    size_with_aspect_ratio,
)
from tubedetr_tpu.ops.preprocess import _interp_matrix, resize_normalize


def test_size_with_aspect_ratio_matches_detr_rule():
    # shortest side -> size
    assert size_with_aspect_ratio(480, 640, 224, 373) == (224, 298)
    # max_size cap engages: 224*(640/360)=398 > 373
    oh, ow = size_with_aspect_ratio(360, 640, 224, 373)
    assert ow <= 373 and oh <= 373
    assert abs(ow / oh - 640 / 360) < 0.02
    # no-op when already at size
    assert size_with_aspect_ratio(224, 300, 224, 373) == (224, 300)


def test_interp_matrix_rows_sum_to_one():
    m = _interp_matrix(37, 17)
    np.testing.assert_allclose(m.sum(1), np.ones(17), atol=1e-6)
    m2 = _interp_matrix(37, 17, crop_start=5.0, crop_size=20.0)
    np.testing.assert_allclose(m2.sum(1), np.ones(17), atol=1e-6)


def test_sequential_resize_composition_is_exact():
    """resize(a->b) then resize(b->c) == composed single operator."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, 32, 40, 3), dtype=np.uint8)
    step1 = np.asarray(resize_normalize(img, 20, 24, normalize=False)) * 255.0
    step2 = np.asarray(
        resize_normalize(step1.astype(np.float32), 12, 16, normalize=False)
    ) * 255.0
    a1h, a1w = _interp_matrix(32, 20), _interp_matrix(40, 24)
    a2h, a2w = _interp_matrix(20, 12), _interp_matrix(24, 16)
    ch, cw = a2h @ a1h, a2w @ a1w
    x = img[0].astype(np.float64)
    composed = np.einsum("oh,hwc->owc", ch, x)
    composed = np.einsum("pw,owc->opc", cw, composed)
    np.testing.assert_allclose(step2[0], composed, atol=1e-2)


def test_train_transform_keeps_boxes_alive_and_in_range():
    rng = np.random.default_rng(0)
    boxes = np.array([[50.0, 60.0, 200.0, 180.0], [10.0, 10.0, 80.0, 90.0]])
    for seed in range(20):
        r = np.random.default_rng(seed)
        ct = sample_train_transform(r, 240, 320, boxes, resolution=224)
        assert ct.a_h.shape[1] == 240 and ct.a_w.shape[1] == 320
        out = ct.boxes_xyxy
        assert out.shape == (2, 4)
        # respect_boxes: all boxes keep positive area
        assert ((out[:, 2] > out[:, 0]) & (out[:, 3] > out[:, 1])).all()
        assert (out[:, 0] >= -1e-9).all() and (out[:, 1] >= -1e-9).all()
        assert (out[:, 2] <= ct.out_w + 1e-9).all()
        assert (out[:, 3] <= ct.out_h + 1e-9).all()


def test_eval_transform_shape_and_box_scaling():
    boxes = np.array([[0.0, 0.0, 100.0, 100.0]])
    # max_size cap engages: 224 * 400/200 = 448 > 373 -> size 186
    ct = make_eval_transform(200, 400, boxes, 224)
    assert (ct.out_h, ct.out_w) == (186, 372)
    r = ct.out_h / 200
    np.testing.assert_allclose(ct.boxes_xyxy[0][3], 100 * r, rtol=1e-6)
    # no cap for a square input
    ct2 = make_eval_transform(300, 300, boxes, 224)
    assert (ct2.out_h, ct2.out_w) == (224, 224)


def test_prepare_and_normalize_boxes():
    b = prepare_boxes(np.array([10.0, 20.0, 30.0, 40.0]), 100, 100)
    np.testing.assert_allclose(b[0], [10, 20, 40, 60])
    n = normalize_boxes_cxcywh(b, 100, 100)
    np.testing.assert_allclose(n[0], [0.25, 0.40, 0.30, 0.40])


def test_collate_shapes_and_masks():
    samples = [make_synthetic_sample(i, t=6, h=32, w=48) for i in range(2)]
    samples[1].frames = samples[1].frames[:4]  # ragged duration
    samples[1].boxes_cxcywh = samples[1].boxes_cxcywh[:4]
    samples[1].frames_id = samples[1].frames_id[:4]
    batch, meta = collate(samples, t=8, stride=3, max_text_len=6)
    assert batch["frames_fast"].shape == (2, 8, 32, 48, 3)
    assert batch["frames_slow"].shape == (2, 3, 32, 48, 3)
    assert batch["durations"].tolist() == [6, 4]
    assert batch["time_mask"][1].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    # slow stream is frames[::3]
    np.testing.assert_array_equal(
        batch["frames_slow"][0, 1], batch["frames_fast"][0, 3]
    )
    assert not batch["fast_pad_mask"][0, 0].any()
    assert batch["fast_pad_mask"][1, 5].all()  # temporal padding


def test_split_video_into_clips_inter_idx_offsets():
    s = make_synthetic_sample(0, t=10)
    s.inter_idx = (3, 8)
    clips = split_video_into_clips(s, 4)
    assert len(clips) == 3
    # clip0 covers frames [0,4): moment [3,8] intersects at local index 3
    assert clips[0].inter_idx == (3, 3)
    assert clips[1].inter_idx == (0, 3)  # frames [4,8): moment covers all
    assert clips[2].inter_idx == (0, 0)  # frames [8,10): moment frame 8
    assert all(c.video_id == s.video_id for c in clips)


def test_split_video_no_overlap_clip():
    s = make_synthetic_sample(0, t=9)
    s.inter_idx = (0, 2)
    clips = split_video_into_clips(s, 3)
    assert clips[0].inter_idx == (0, 2)
    assert clips[1].inter_idx == (-100, -100)
    assert clips[2].inter_idx == (-100, -100)


def test_hflip_caption_swap():
    from tubedetr_tpu.data.transforms import hflip_caption

    assert hflip_caption("the man on the left.") == "the man on the right."
    assert hflip_caption("turn right, then left") == "turn left, then right"
    assert hflip_caption("an upright lefty") == "an upright lefty"


def test_hflip_operator_flips_pixels_and_boxes():
    from tubedetr_tpu.data.transforms import sample_train_transform

    img = np.zeros((1, 40, 60, 3), np.uint8)
    img[0, :, :10] = 255  # bright band on the LEFT
    boxes = np.array([[0.0, 10.0, 10.0, 30.0]])
    found = False
    for seed in range(60):
        rng = np.random.default_rng(seed)
        ct = sample_train_transform(
            rng, 40, 60, boxes, resolution=224, allow_hflip=True
        )
        if not ct.hflip:
            continue
        found = True
        # apply the composed operator directly
        x = img[0].astype(np.float64)
        y = ct.a_h @ x[:, :, 0] @ ct.a_w.T
        # the bright band must now be on the RIGHT of the output
        ow = ct.out_w
        left_mass = y[:, : ow // 4].sum()
        right_mass = y[:, -ow // 4 :].sum()
        assert right_mass > left_mass * 2
        # box flipped: x-range near the right edge
        bx = ct.boxes_xyxy[0]
        assert bx[2] > ct.out_w * 0.7
        break
    assert found, "no hflip sampled in 60 seeds"
