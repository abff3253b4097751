"""App-level smoke tests: demo inference on a .npy clip (no ffmpeg)."""

import numpy as np

from tubedetr_tpu.config import TubeDETRConfig


def test_demo_on_npy_clip(tmp_path):
    from tubedetr_tpu.apps.demo import run_demo

    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    vid_path = str(tmp_path / "clip.npy")
    np.save(vid_path, clip)

    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    out = run_demo(
        cfg, vid_path, "a red square", out_dir=str(tmp_path / "out")
    )
    assert "sted" in out and "boxes" in out
    s, e = out["sted"]
    assert 0 <= s < e <= 7
    assert len(out["boxes"]) == 6
    assert (tmp_path / "out" / "tube_frames.npy").exists()


def test_drawn_box_is_visible(tmp_path):
    from tubedetr_tpu.apps.demo import draw_box

    frame = np.zeros((32, 32, 3), np.uint8)
    draw_box(frame, [4, 4, 20, 20])
    assert frame[4, 10].tolist() == [255, 40, 40]
    assert frame[10, 4].tolist() == [255, 40, 40]
    assert frame[10, 10].tolist() == [0, 0, 0]  # interior untouched


def test_demo_with_int8_static_backbone(tmp_path):
    """Serving pipeline with the PTQ int8 backbone: calibrates on the first
    request, outputs stay structurally valid and close to the float path."""
    import jax

    from tubedetr_tpu.apps.pipeline import GroundingPipeline

    rng = np.random.RandomState(1)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    vid_path = str(tmp_path / "clip.npy")
    np.save(vid_path, clip)
    kw = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    pipe_q = GroundingPipeline(TubeDETRConfig(backbone_quant="int8_static", **kw))
    assert pipe_q._needs_calibration
    out_q = pipe_q.ground(vid_path, "a red square", out_dir=str(tmp_path / "q"))
    assert not pipe_q._needs_calibration  # calibrated on first request
    # the stem-level observer replaced the layer1_0/conv1 one (the int8
    # carrier now starts at the pre-maxpool quantize)
    assert float(pipe_q.variables["qscales"]["backbone"]["stem_act_max"]) > 0

    pipe_f = GroundingPipeline(TubeDETRConfig(**kw))
    out_f = pipe_f.ground(vid_path, "a red square", out_dir=str(tmp_path / "f"))
    bq = np.asarray(out_q["boxes"])
    bf = np.asarray(out_f["boxes"])
    assert bq.shape == bf.shape
    # same fabricated weights -> quantized boxes near the float boxes
    assert np.abs(bq - bf).max() < 0.15 * max(clip.shape[1:3])
