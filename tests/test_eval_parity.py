"""Golden parity of the headline metric path: our vIoU evaluator and
PostProcessSTVG vs the reference implementations, on a fabricated
VidSTG-format annotation file and shared random predictions."""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_layer_parity import REF, _stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    if "hostlist" not in sys.modules:
        _stub("hostlist")
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv_ops = _stub("torchvision.ops")
        tv_boxes = _stub("torchvision.ops.boxes")
        tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops
        tv_models = _stub("torchvision.models")
        tv_models_utils = _stub("torchvision.models._utils")
        tv_models_utils.IntermediateLayerGetter = object
        tv_models._utils = tv_models_utils
        tv.models = tv_models
    if "timm" not in sys.modules:
        timm = _stub("timm")
        timm_models = _stub("timm.models")
        timm_models.create_model = lambda *a, **k: None
        timm.models = timm_models
    for extra in ("ffmpeg", "cv2", "tqdm"):
        if extra not in sys.modules:
            m = _stub(extra)
            if extra == "tqdm":
                m.tqdm = lambda x, *a, **k: x
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import datasets.vidstg_eval as ref_eval
    import models.postprocessors as ref_pp

    return ref_eval, ref_pp


def fabricate_vidstg_annotations(tmp_path, n_videos=3, seed=0):
    """Minimal VidSTG-format test.json with per-video tubes + trajectories."""
    rng = np.random.RandomState(seed)
    videos, trajectories = [], {}
    for v in range(n_videos):
        video_fps = 5.0  # sampling rate 1 -> frame ids dense
        start, end = 0, 20
        t0 = int(rng.randint(2, 8))
        t1 = int(rng.randint(t0 + 4, 18))
        ovid = f"orig{v}"
        tid = "0"
        trajectories.setdefault(ovid, {})[tid] = {
            str(f): {"bbox": [float(10 + f), float(5 + f), 20.0, 15.0]}
            for f in range(t0, t1)
        }
        videos.append(
            {
                "video_id": v,
                "original_video_id": ovid,
                "target_id": 0,
                "fps": video_fps,
                "start_frame": start,
                "end_frame": end,
                "tube_start_frame": t0,
                "tube_end_frame": t1,
                "caption": "c",
                "qtype": "declarative" if v % 2 == 0 else "interrogative",
                "video_path": "",
                "width": 320,
                "height": 240,
            }
        )
    path = tmp_path / "test.json"
    path.write_text(json.dumps({"videos": videos, "trajectories": trajectories}))
    return str(tmp_path), videos


def test_evaluator_matches_reference(ref_modules, tmp_path):
    ref_eval, _ = ref_modules
    ann_dir, videos = fabricate_vidstg_annotations(tmp_path)

    ref = ref_eval.VidSTGEvaluator(
        ann_dir, "test", iou_thresholds=[0.3, 0.5], fps=5, video_max_len=200
    )

    from tubedetr_tpu.data.annotations import load_vidstg
    from tubedetr_tpu.eval.viou import VIoUEvaluator

    ours = VIoUEvaluator(load_vidstg(ann_dir, "test", fps=5, video_max_len=200))

    rng = np.random.RandomState(7)
    for v in videos:
        vid = v["video_id"]
        # noisy predicted boxes on every tube frame
        for f in range(v["tube_start_frame"], v["tube_end_frame"]):
            gt = [10 + f, 5 + f, 10 + f + 20, 5 + f + 15]
            jitter = rng.randn(4) * 3
            box = [float(g + j) for g, j in zip(gt, jitter)]
            box = [box[0], box[1], max(box[2], box[0] + 1), max(box[3], box[1] + 1)]
            ref.update({f"{vid}_{f}": {"boxes": [box]}})
            ours.update({f"{vid}_{f}": {"boxes": [box]}})
        # predicted segment: shifted GT
        sted = [v["tube_start_frame"] + 2, v["tube_end_frame"] + 1]
        ref.video_update({vid: {"sted": sted, "qtype": v["qtype"]}})
        ours.video_update({vid: {"sted": sted, "qtype": v["qtype"]}})

    ref_out = ref.summarize()
    our_out = ours.summarize()
    keys = [k for k in ref_out if isinstance(ref_out[k], (int, float))]
    assert keys, ref_out
    for k in keys:
        assert k in our_out, k
        np.testing.assert_allclose(our_out[k], ref_out[k], rtol=1e-9, err_msg=k)


def test_postprocess_sted_matches_reference(ref_modules):
    _, ref_pp = ref_modules
    rng = np.random.RandomState(3)
    b, t = 3, 12
    logits = rng.randn(b, t, 2).astype(np.float32) * 3
    durations = [12, 9, 12]
    time_mask = np.arange(t)[None] < np.array(durations)[:, None]
    video_ids = ["a", "a", "b"]  # first two are clips of one video
    # the reference collate keeps ONE frames_id list per VIDEO even when the
    # video is split into clips (/root/reference/util/misc.py:61,70-102);
    # ours carries per-clip lists and re-concatenates in the postprocessor
    video_a_frames = list(range(100, 121))  # 12 + 9 frames
    video_b_frames = list(range(200, 212))
    ref_frames_id = [video_a_frames, video_b_frames]
    our_frames_id = [video_a_frames[:12], video_a_frames[12:], video_b_frames]

    module = ref_pp.PostProcessSTVG()
    with torch.no_grad():
        ref_out = module(
            {"pred_sted": torch.from_numpy(logits)},
            frames_id=ref_frames_id,
            video_ids=video_ids,
            time_mask=torch.from_numpy(time_mask),
        )

    from tubedetr_tpu.models.postprocess import postprocess_sted

    our_out = postprocess_sted(logits, our_frames_id, video_ids, time_mask)
    assert len(our_out) == len(ref_out)
    for a, r in zip(our_out, ref_out):
        np.testing.assert_allclose(a, r, atol=1e-9)


def test_postprocess_sted_no_split_matches_reference(ref_modules):
    _, ref_pp = ref_modules
    rng = np.random.RandomState(4)
    b, t = 2, 8
    logits = rng.randn(b, t, 2).astype(np.float32) * 2
    time_mask = np.ones((b, t), dtype=bool)  # equal durations: no masking path
    frames_id = [list(range(t)) for _ in range(b)]
    video_ids = ["x", "y"]

    module = ref_pp.PostProcessSTVG()
    with torch.no_grad():
        ref_out = module(
            {"pred_sted": torch.from_numpy(logits)},
            frames_id=frames_id,
            video_ids=video_ids,
            time_mask=torch.from_numpy(time_mask),
        )
    from tubedetr_tpu.models.postprocess import postprocess_sted

    our_out = postprocess_sted(logits, frames_id, video_ids, time_mask)
    for a, r in zip(our_out, ref_out):
        np.testing.assert_allclose(a, r, atol=1e-9)


def fabricate_hcstvg_annotations(tmp_path, n_videos=2, seed=5):
    rng = np.random.RandomState(seed)
    anns = []
    for v in range(n_videos):
        frame_count = 100  # 5 fps over 20 s
        t0 = int(rng.randint(10, 30))
        t1 = int(rng.randint(t0 + 20, 90))
        anns.append(
            {
                "video_id": v,
                "video_path": "",
                "frame_count": frame_count,
                "tube_start_frame": t0,
                "tube_end_frame": t1,
                "trajectory": [
                    [float(5 + i % 7), float(8 + i % 5), 30.0, 40.0]
                    for i in range(t1 - t0)
                ],
                "caption": "c",
            }
        )
    path = tmp_path / "test_proc.json"
    path.write_text(json.dumps(anns))
    return str(tmp_path), anns


def test_hcstvg_evaluator_matches_reference(ref_modules, tmp_path):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import datasets.hcstvg_eval as ref_hc

    ann_dir, anns = fabricate_hcstvg_annotations(tmp_path)
    ref = ref_hc.HCSTVGEvaluator(ann_dir, "test", v2=False, tmp_loc=True)

    from tubedetr_tpu.data.annotations import load_hcstvg
    from tubedetr_tpu.eval.viou import VIoUEvaluator

    ours = VIoUEvaluator(load_hcstvg(ann_dir, "test", v2=False))

    rng = np.random.RandomState(11)
    for v in anns:
        vid = v["video_id"]
        for fi, fid in enumerate(range(v["tube_start_frame"], v["tube_end_frame"])):
            x, y, w, h = v["trajectory"][fid - v["tube_start_frame"]]
            jitter = rng.randn(4) * 4
            box = [x + jitter[0], y + jitter[1],
                   max(x + w + jitter[2], x + jitter[0] + 1),
                   max(y + h + jitter[3], y + jitter[1] + 1)]
            ref.update({f"{vid}_{fid}": {"boxes": [box]}})
            ours.update({f"{vid}_{fid}": {"boxes": [box]}})
        sted = [v["tube_start_frame"] + 5, v["tube_end_frame"] - 3]
        ref.video_update({vid: {"sted": sted, "qtype": "declarative"}})
        ours.video_update({vid: {"sted": sted, "qtype": "declarative"}})

    ref_out = ref.summarize()
    our_out = ours.summarize()
    keys = [k for k in ref_out if isinstance(ref_out[k], (int, float))]
    assert keys
    for k in keys:
        # HC-STVG has a single category: the reference reports bare keys,
        # ours prefixes the (constant) qtype
        np.testing.assert_allclose(
            our_out[f"declarative_{k}"], ref_out[k], rtol=1e-9, err_msg=k
        )
