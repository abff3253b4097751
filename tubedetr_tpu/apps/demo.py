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
    import jax

    from tubedetr_tpu.data.collate import VideoSample, collate
    from tubedetr_tpu.data.decode import decode_video, encode_video, probe
    from tubedetr_tpu.data.transforms import make_eval_transform
    from tubedetr_tpu.models.postprocess import postprocess_boxes, postprocess_sted
    from tubedetr_tpu.models.tokenizer import build_tokenizer
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import model_inputs
    from tubedetr_tpu.train.checkpoint import (
        load_checkpoint,
        load_torch_checkpoint_into,
    )
    import jax.numpy as jnp

    # decode window
    if video_path.endswith((".npy", ".npz")):
        raw = decode_video(video_path, 0, 0, 0)
        video_fps = cfg.fps
        ss, dur = 0.0, len(raw) / video_fps
        n_frames = min(len(raw), cfg.video_max_len)
        raw = raw[:n_frames]
    else:
        meta = probe(video_path)
        ss = max(start, 0.0)
        dur = (end if end > 0 else meta["duration"]) - ss
        # fps rule of demo_stvg.py:91-93
        n_frames = int(min(cfg.fps * dur, cfg.video_max_len))
        raw = decode_video(video_path, ss, dur, n_frames)
    t = len(raw)
    h, w = raw.shape[1:3]

    # eval transform + device resize/normalize: on TPU this is the fused
    # Pallas kernel (one HBM read/write per frame); elsewhere the einsum path
    ct = make_eval_transform(h, w, np.zeros((0, 4)), cfg.resolution)
    from tubedetr_tpu.ops.pallas_preprocess import resize_normalize_fused

    frames = np.asarray(
        resize_normalize_fused(jnp.asarray(raw), ct.out_h, ct.out_w)
    )

    tokenizer = build_tokenizer(cfg.tokenizer_path, cfg.text_vocab_size)
    sample = VideoSample(
        frames=frames,
        valid_hw=(ct.out_h, ct.out_w),
        boxes_cxcywh=np.zeros((t, 4), np.float32),
        inter_idx=(0, t - 1),
        frames_id=list(range(t)),
        video_id="demo",
        caption=caption,
        tokens=np.asarray(tokenizer.encode(caption), np.int64),
        orig_size=(h, w),
    )
    batch, meta_b = collate([sample], t, cfg.stride, cfg.max_text_len,
                            with_fast=cfg.fast)

    model = build_model(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), **model_inputs(batch)
    )
    if cfg.load:
        if cfg.load.endswith(".pth"):
            variables, _ = load_torch_checkpoint_into(variables, cfg.load, cfg)
        else:
            ck = load_checkpoint(cfg.load)
            params = ck.get("ema_params") or ck["params"]
            variables = {"params": params, "buffers": ck["buffers"]}

    outputs = jax.jit(lambda v, b: model.apply(v, **b))(
        variables, model_inputs(batch)
    )
    boxes_px = postprocess_boxes(
        np.asarray(outputs["pred_boxes"])[0], np.array([h, w])
    )  # (T, 4) xyxy in original pixels
    sted = postprocess_sted(
        np.asarray(outputs["pred_sted"]),
        [sample.frames_id],
        ["demo"],
        np.asarray(batch["time_mask"]),
    )[0] if cfg.sted else [0, t]
    s_f, e_f = int(sted[0]), int(sted[1])
    print(f"predicted segment: frames [{s_f}, {e_f}) "
          f"≈ seconds [{ss + s_f / cfg.fps:.2f}, {ss + e_f / cfg.fps:.2f})")

    os.makedirs(out_dir, exist_ok=True)
    rendered = raw.copy()
    for i in range(t):
        if s_f <= i < e_f:
            draw_box(rendered[i], boxes_px[i])
    np.save(os.path.join(out_dir, "tube_frames.npy"), rendered)
    try:
        encode_video(rendered, os.path.join(out_dir, "tube.mp4"), fps=cfg.fps)
        print(f"wrote {out_dir}/tube.mp4")
    except Exception as e:
        print(f"(video encode unavailable: {e}; wrote tube_frames.npy)")
    return {"sted": [s_f, e_f], "boxes": boxes_px.tolist()}


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
