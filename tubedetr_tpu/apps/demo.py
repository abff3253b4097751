"""One-shot spatio-temporal grounding demo (the reference demo_stvg.py, L7).

Pipeline (/root/reference/demo_stvg.py:17-194): probe video -> decode at
``min(fps*t, video_max_len)/t`` -> eval transforms -> two-phase forward ->
postprocess (segment + per-frame pixel boxes) -> draw the predicted box on
frames inside [start, end) -> re-encode an h264 tube video.

Drawing uses pure numpy (rectangle strokes) instead of matplotlib — no
display stack needed on a TPU VM.

Usage:
    python -m tubedetr_tpu.apps.demo --load ckpt.ckpt \
        --video_example clip.mp4 --caption_example "a man riding a horse" \
        --output-dir out/
"""

from __future__ import annotations

import os
import sys

import numpy as np


def draw_box(frame: np.ndarray, box, color=(255, 40, 40), width: int = 3):
    """In-place rectangle stroke on an (H, W, 3) uint8 frame."""
    h, w = frame.shape[:2]
    x0, y0, x1, y1 = [int(round(v)) for v in box]
    x0, x1 = max(0, min(x0, w - 1)), max(0, min(x1, w - 1))
    y0, y1 = max(0, min(y0, h - 1)), max(0, min(y1, h - 1))
    c = np.asarray(color, np.uint8)
    frame[y0 : y0 + width, x0:x1] = c
    frame[max(y1 - width, 0) : y1, x0:x1] = c
    frame[y0:y1, x0 : x0 + width] = c
    frame[y0:y1, max(x1 - width, 0) : x1] = c
    return frame


def run_demo(cfg, video_path: str, caption: str, start: float = -1.0,
             end: float = -1.0, out_dir: str = "demo_out"):
    """One-shot CLI inference: builds a GroundingPipeline for this call.
    Long-lived callers (the HTTP server) construct the pipeline once and
    call ``pipeline.ground`` per request instead."""
    from tubedetr_tpu.apps.pipeline import GroundingPipeline

    pipe = GroundingPipeline(cfg)
    return pipe.ground(video_path, caption, start, end, out_dir=out_dir)


def main(argv=None):
    from tubedetr_tpu.apps.cli import config_from_args

    cfg = config_from_args(argv)
    if not cfg.video_example or not cfg.caption_example:
        print("need --video_example and --caption_example")
        return 1
    run_demo(
        cfg,
        cfg.video_example,
        cfg.caption_example,
        cfg.start_example,
        cfg.end_example,
        cfg.output_dir or "demo_out",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
