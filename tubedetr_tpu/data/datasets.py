"""VidSTG / HC-STVG dataset pipeline.

Composes: annotation loading (``annotations.py``) -> ffmpeg decode
(``decode.py``) -> per-frame box targets -> sampled spatial transform with
device-side fused resize (``transforms.py`` + ``ops/preprocess.py``) ->
temporal crop + train-time dense window sampling -> ``VideoSample``.

Temporal augmentations mirror /root/reference/datasets/vidstg.py:148-235:

* random temporal crop (p=0.5) that never cuts the annotated moment: new
  start uniformly before the moment, new end uniformly after it;
* train-time dense window sampling when the clip exceeds
  ``video_max_len_train``: a random window overlapping the moment.
"""

from __future__ import annotations

from typing import List

import numpy as np

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.annotations import (
    VideoAnnotation,
    load_hcstvg,
    load_vidstg,
)
from tubedetr_tpu.data.collate import VideoSample
from tubedetr_tpu.data.decode import decode_video
from tubedetr_tpu.data.transforms import (
    ClipTransform,
    make_eval_transform,
    normalize_boxes_cxcywh,
    prepare_boxes,
    sample_train_transform,
)


class STVGDataset:
    """Map-style dataset over VideoAnnotation entries."""

    def __init__(
        self,
        annotations: List[VideoAnnotation],
        vid_folder: str,
        cfg: TubeDETRConfig,
        is_train: bool,
        tokenizer=None,
        seed: int = 0,
    ):
        self.annotations = annotations
        self.vid_folder = vid_folder
        self.cfg = cfg
        self.is_train = is_train
        self.tokenizer = tokenizer
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return len(self.annotations)

    def set_epoch(self, epoch: int):
        """Augmentations reseed per epoch (DistributedSampler.set_epoch
        semantics); called by DataLoader.set_epoch."""
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.Generator:
        """Independent generator per (epoch, sample): DataLoader workers call
        __getitem__ concurrently from a thread pool, and a shared numpy
        Generator is neither thread-safe nor schedule-reproducible."""
        return np.random.default_rng((self.seed, self.epoch, idx))

    # -- temporal augmentations -----------------------------------------
    def _temporal_crop(self, rng, n: int, inter: List[int]):
        """Returns (start_idx, end_idx) inclusive after the p=0.5 random crop
        (never cuts the moment)."""
        if rng.random() <= 0.5:
            return 0, n - 1
        starts = [i for i in range(n) if not inter or i < inter[0]]
        new_start = int(rng.choice(starts)) if starts else 0
        ends = [
            i
            for i in range(n)
            if (i > inter[-1] if inter else i > new_start)
        ]
        new_end = int(rng.choice(ends)) if ends else n - 1
        return new_start, new_end

    def _dense_window(self, rng, n: int, inter: List[int], vml_train: int):
        starts = (
            [i for i in range(n) if inter[0] - vml_train < i <= inter[-1]]
            if inter
            else list(range(n))
        )
        new_start = int(rng.choice(starts)) if starts else 0
        new_end = min(new_start + vml_train - 1, n - 1)
        return new_start, new_end

    # -- main -----------------------------------------------------------
    def __getitem__(self, idx: int) -> VideoSample:
        cfg = self.cfg
        rng = self._rng(idx)
        ann = self.annotations[idx]
        frame_ids = list(ann.frame_ids)
        n = len(frame_ids)

        import os

        vid_path = (
            os.path.join(self.vid_folder, ann.video_path)
            if self.vid_folder
            else ann.video_path
        )
        frames = decode_video(
            vid_path, ann.start_seconds, ann.duration_seconds, n
        )  # (n, H, W, 3) uint8
        if frames.shape[0] != n:
            # pre-extracted full-rate clip (.npy path): index the sampled
            # absolute frame ids relative to the decode window start
            base = frame_ids[0]
            sel_idx = np.clip(
                np.asarray(frame_ids) - base, 0, frames.shape[0] - 1
            )
            frames = frames[sel_idx]
        assert frames.shape[0] == n, (frames.shape, n)
        h, w = frames.shape[1:3]

        # per-frame raw boxes at decode resolution
        boxes_xyxy = np.zeros((n, 4), np.float64)
        inter = []
        for i, fid in enumerate(frame_ids):
            if fid in ann.boxes_xywh:
                boxes_xyxy[i] = prepare_boxes(
                    np.asarray(ann.boxes_xywh[fid]), h, w
                )[0]
                inter.append(i)

        # spatial transform (one sampled transform applied to the whole clip)
        moment_boxes = boxes_xyxy[inter] if inter else np.zeros((0, 4))
        if self.is_train:
            ct: ClipTransform = sample_train_transform(
                rng, h, w, moment_boxes, cfg.resolution, respect_boxes=True
            )
        else:
            ct = make_eval_transform(h, w, moment_boxes, cfg.resolution)

        # host-side fused resize+normalize (C++ pool / numpy fallback):
        # data workers must never dispatch device work — on the
        # single-tenant TPU every eager jit here would contend with the
        # train step (SURVEY.md §7 hard part 3)
        from tubedetr_tpu.data.native import resize_normalize_clip

        out = resize_normalize_clip(frames, ct.a_h, ct.a_w, normalize=True)
        tb = np.zeros((n, 4), np.float64)
        if inter:
            tb[inter] = ct.boxes_xyxy

        # temporal crop + dense window
        lo, hi = 0, n - 1
        if self.is_train and cfg.tmp_crop:
            lo, hi = self._temporal_crop(rng, n, inter)
        sel = slice(lo, hi + 1)
        frames_sel = out[sel]
        tb = tb[sel]
        frame_ids = frame_ids[sel]
        inter = [i - lo for i in inter if lo <= i <= hi]

        if self.is_train and len(frame_ids) > cfg.video_max_len_train:
            lo2, hi2 = self._dense_window(
                rng, len(frame_ids), inter, cfg.video_max_len_train
            )
            sel2 = slice(lo2, hi2 + 1)
            frames_sel = frames_sel[sel2]
            tb = tb[sel2]
            frame_ids = frame_ids[sel2]
            inter = [i - lo2 for i in inter if lo2 <= i <= hi2]

        boxes_norm = normalize_boxes_cxcywh(
            tb.reshape(-1, 4), ct.out_h, ct.out_w
        ).reshape(len(frame_ids), 4)

        caption = ann.caption
        if getattr(ct, "hflip", False):
            from tubedetr_tpu.data.transforms import hflip_caption

            caption = hflip_caption(caption)

        tokens = None
        if self.tokenizer is not None:
            tokens = np.asarray(self.tokenizer.encode(caption), np.int64)

        return VideoSample(
            frames=frames_sel.astype(np.float32),
            valid_hw=(ct.out_h, ct.out_w),
            boxes_cxcywh=boxes_norm.astype(np.float32),
            inter_idx=(inter[0], inter[-1]) if inter else (-100, -100),
            frames_id=frame_ids,
            video_id=ann.video_id,
            caption=caption,
            tokens=tokens,
            qtype=ann.qtype,
            orig_size=(h, w),
        )


def build_dataset(
    name: str, image_set: str, cfg: TubeDETRConfig, tokenizer=None
) -> STVGDataset:
    """Dataset factory (/root/reference/datasets/__init__.py:5-10)."""
    vml = cfg.video_max_len_train if image_set == "train" else cfg.video_max_len
    if name == "synthetic":
        # offline smoke dataset: full train/eval CLI without video downloads
        from tubedetr_tpu.data.synthetic import SyntheticDataset

        n = (cfg.synthetic_train_size if image_set == "train"
             else cfg.synthetic_val_size)
        res = cfg.synthetic_res
        return SyntheticDataset(
            n=n or (32 if image_set == "train" else 8),
            t=cfg.synthetic_t or min(vml, 8),
            h=res or 64,
            w=res or 64,
            seed=cfg.seed + (0 if image_set == "train" else 1000),
            vocab=cfg.text_vocab_size,
            text_len=min(cfg.max_text_len, 8),
        )
    if name == "vidstg":
        ann_file = None
        if (
            image_set == "train"
            and cfg.video_max_len_train != 200
            and cfg.sted
        ):
            ann_file = f"train_{cfg.video_max_len_train}.json"
        anns = load_vidstg(
            cfg.vidstg_ann_path,
            image_set,
            fps=cfg.fps,
            video_max_len=cfg.video_max_len,
            tmp_loc=cfg.tmp_loc,
            ann_file=ann_file,
        )
        folder = cfg.vidstg_vid_path
    elif name == "hcstvg":
        subset = image_set
        if image_set in ("val", "test"):
            # v1 has test only; v2 has val only (reference hcstvg.py:245-274)
            subset = "val" if cfg.v2 else "test"
        anns = load_hcstvg(
            cfg.hcstvg_ann_path,
            subset,
            v2=cfg.v2,
            fps=cfg.fps,
            video_max_len=cfg.video_max_len,
        )
        folder = cfg.hcstvg_vid_path
    else:
        raise ValueError(f"unknown dataset {name}")
    return STVGDataset(
        anns, folder, cfg, is_train=(image_set == "train"), tokenizer=tokenizer,
        seed=cfg.seed,
    )
