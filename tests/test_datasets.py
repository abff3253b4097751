"""End-to-end STVGDataset test with .npy clips (the ffmpeg-free decode path):
annotations -> decode -> per-frame box targets -> spatial transform ->
temporal crop / dense window -> VideoSample invariants."""

import json

import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.datasets import STVGDataset, build_dataset
from tubedetr_tpu.data.annotations import load_vidstg


def write_clip(tmp_path, name, t=20, h=60, w=80, seed=0):
    rng = np.random.RandomState(seed)
    clip = rng.randint(0, 255, (t, h, w, 3), dtype=np.uint8)
    path = tmp_path / name
    np.save(path, clip)
    return str(path) + ".npy" if not str(path).endswith(".npy") else str(path)


def make_annotations(tmp_path, clip_path, h=60, w=80):
    videos, trajectories = [], {}
    videos.append(
        {
            "video_id": 0,
            "original_video_id": "o0",
            "target_id": 0,
            "fps": 5.0,
            "start_frame": 0,
            "end_frame": 20,
            "tube_start_frame": 4,
            "tube_end_frame": 15,
            "caption": "a red square on the left",
            "qtype": "declarative",
            "video_path": clip_path,
            "width": w,
            "height": h,
        }
    )
    trajectories["o0"] = {
        "0": {str(f): {"bbox": [10.0, 12.0, 25.0, 20.0]} for f in range(4, 15)}
    }
    (tmp_path / "val.json").write_text(
        json.dumps({"videos": videos, "trajectories": trajectories})
    )
    return str(tmp_path)


@pytest.fixture(scope="module")
def dataset_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("vidstg")
    clip = write_clip(tmp_path, "clip0.npy")
    ann_dir = make_annotations(tmp_path, clip)
    return ann_dir


def test_eval_getitem(dataset_env):
    cfg = TubeDETRConfig(
        vidstg_ann_path=dataset_env,
        vidstg_vid_path="",
        resolution=128,
        video_max_len=200,
        video_max_len_train=200,
        stride=2,
        fps=5,
    )
    ds = build_dataset("vidstg", "val", cfg)
    assert len(ds) == 1
    s = ds[0]
    # 20 frames at matching fps -> all sampled
    assert s.frames.shape[0] == len(s.frames_id) == 20
    assert s.frames.dtype == np.float32
    oh, ow = s.valid_hw
    assert oh == 128 or ow == 128  # shortest side resized to resolution
    assert s.inter_idx == (4, 14)  # tube frames [4, 15) inclusive end
    # boxes normalized cxcywh inside the moment, zeros outside
    assert np.abs(s.boxes_cxcywh[0]).max() == 0.0
    b = s.boxes_cxcywh[5]
    assert 0 < b[0] < 1 and 0 < b[2] < 1
    assert s.caption == "a red square on the left"


def test_train_getitem_temporal_augmentation(dataset_env):
    cfg = TubeDETRConfig(
        vidstg_ann_path=dataset_env,
        resolution=128,
        video_max_len=200,
        video_max_len_train=8,  # force dense-window sampling
        stride=2,
        fps=5,
        tmp_crop=True,
    )
    anns = load_vidstg(dataset_env, "val", fps=5, video_max_len=200)
    ds = STVGDataset(anns, "", cfg, is_train=True, seed=3)
    for i in range(5):
        s = ds[0]
        t = s.frames.shape[0]
        assert t <= cfg.video_max_len_train
        assert len(s.frames_id) == t == s.boxes_cxcywh.shape[0]
        s0, e0 = s.inter_idx
        # dense window must overlap the moment
        assert s0 >= 0 and e0 >= s0 and e0 < t
        # boxes positive exactly on the moment frames
        in_moment = np.abs(s.boxes_cxcywh).sum(1) > 0
        assert in_moment[s0] and in_moment[e0]
        assert not in_moment[:s0].any()
        assert not in_moment[e0 + 1 :].any()


# ---------------------------------------------------------------------------
# HC-STVG end-to-end (.npy decode path) — v1 test / v2 val selection and
# trajectory indexing by frame_id - tube_start_frame
# (/root/reference/datasets/hcstvg.py:53-121,245-274)
# ---------------------------------------------------------------------------


def make_hcstvg_env(tmp_path, v2: bool):
    frame_count = 100  # video_fps = frame_count / 20 = 5
    t = frame_count - 1  # reference samples over [0, frame_count - 1)
    rng = np.random.RandomState(7)
    clip = rng.randint(0, 255, (t, 32, 40, 3), dtype=np.uint8)
    clip_path = tmp_path / "person.npy"
    np.save(clip_path, clip)
    ann = [
        {
            "video_id": "hc0",
            "frame_count": frame_count,
            "tube_start_frame": 20,
            "tube_end_frame": 60,
            "trajectory": [
                [5.0 + 0.1 * i, 6.0, 12.0, 10.0] for i in range(40)
            ],
            "caption": "the man walks to the left",
            "video_path": str(clip_path),
            "width": 40,
            "height": 32,
        }
    ]
    name = "val_v2.json" if v2 else "test.json"
    (tmp_path / name).write_text(json.dumps(ann))
    return str(tmp_path)


@pytest.mark.parametrize("v2", [False, True])
def test_hcstvg_end_to_end(tmp_path, v2):
    ann_dir = make_hcstvg_env(tmp_path, v2)
    cfg = TubeDETRConfig(
        hcstvg_ann_path=ann_dir,
        hcstvg_vid_path="",
        v2=v2,
        resolution=128,
        video_max_len=200,
        video_max_len_train=200,
        stride=2,
        fps=5,
    )
    # v1 has test only, v2 has val only — both image_set names must resolve
    ds = build_dataset("hcstvg", "val", cfg)
    assert len(ds) == 1
    ann = ds.annotations[0]
    # all 99 full-rate frames sampled (video_fps == fps == 5)
    assert ann.frame_ids == list(range(99))
    # trajectory indexed by frame_id - tube_start_frame
    assert ann.boxes_xywh[20][0] == pytest.approx(5.0)
    assert ann.boxes_xywh[59][0] == pytest.approx(5.0 + 0.1 * 39)
    assert ann.qtype == "declarative"

    s = ds[0]
    assert s.frames.shape[0] == len(s.frames_id) == 99
    assert s.inter_idx == (20, 59)
    in_moment = np.abs(s.boxes_cxcywh).sum(1) > 0
    assert in_moment[20] and in_moment[59]
    assert not in_moment[:20].any() and not in_moment[60:].any()
    assert s.caption == "the man walks to the left"


def test_hcstvg_video_max_len_cap(tmp_path):
    """Uniform subsampling cap + full-rate .npy indexing by frame id."""
    ann_dir = make_hcstvg_env(tmp_path, v2=False)
    cfg = TubeDETRConfig(
        hcstvg_ann_path=ann_dir,
        v2=False,
        resolution=128,
        video_max_len=40,
        video_max_len_train=40,
        stride=2,
        fps=5,
    )
    ds = build_dataset("hcstvg", "test", cfg)
    ann = ds.annotations[0]
    assert len(ann.frame_ids) == 40
    assert ann.frame_ids == [(j * 99) // 40 for j in range(40)]
    s = ds[0]
    assert s.frames.shape[0] == 40
    # moment alignment must survive the subsample + full-rate indexing
    inter = [i for i, f in enumerate(ann.frame_ids) if 20 <= f < 60]
    assert s.inter_idx == (inter[0], inter[-1])
