"""Config surface, JSON overlay, weight dict expansion; tokenizer behavior."""

import json

import pytest

from tubedetr_tpu.config import TubeDETRConfig, loss_weight_dict
from tubedetr_tpu.models.tokenizer import (
    BOS,
    EOS,
    BPETokenizer,
    HashTokenizer,
    build_tokenizer,
)


def test_defaults_match_reference_flags():
    cfg = TubeDETRConfig()
    assert cfg.lr == 5e-5
    assert cfg.lr_backbone == 1e-5
    assert cfg.text_encoder_lr == 5e-5
    assert cfg.batch_size == 1
    assert cfg.weight_decay == 1e-4
    assert cfg.epochs == 10
    assert cfg.ema_decay == 0.9998
    assert cfg.hidden_dim == 256
    assert cfg.nheads == 8
    assert cfg.num_queries == 1
    assert cfg.video_max_len == 200
    assert cfg.stride == 5
    assert cfg.fps == 5
    assert cfg.sigma == 1
    assert (cfg.bbox_loss_coef, cfg.giou_loss_coef, cfg.sted_loss_coef,
            cfg.guided_attn_loss_coef) == (5.0, 2.0, 10.0, 1.0)
    assert cfg.schedule == "linear_with_warmup"


def test_n_clips():
    assert TubeDETRConfig(video_max_len_train=200, stride=5).n_clips == 40
    assert TubeDETRConfig(video_max_len_train=200, stride=4).n_clips == 50
    assert TubeDETRConfig(video_max_len_train=7, stride=3).n_clips == 3
    assert TubeDETRConfig(video_max_len_train=8, stride=0).n_clips == 8


def test_json_overlay(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"combine_datasets": ["vidstg"], "lr": 1e-4}))
    cfg = TubeDETRConfig().apply_json_overlay(str(p))
    assert cfg.combine_datasets == ["vidstg"]
    assert cfg.lr == 1e-4
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps({"nonsense_key": 1}))
    with pytest.raises(ValueError):
        TubeDETRConfig().apply_json_overlay(str(p2))


def test_weight_dict_expansion():
    cfg = TubeDETRConfig(dec_layers=6, aux_loss=True, guided_attn=True, sted=True)
    wd = loss_weight_dict(cfg)
    assert wd["loss_bbox"] == 5.0 and wd["loss_giou"] == 2.0
    assert wd["loss_sted"] == 10.0 and wd["loss_guided_attn"] == 1.0
    assert wd["loss_bbox_4"] == 5.0
    assert "loss_bbox_5" not in wd
    assert len(wd) == 4 * 6


def test_cli_roundtrip():
    from tubedetr_tpu.apps.cli import config_from_args

    cfg = config_from_args(
        [
            "--combine_datasets", "vidstg",
            "--no_fast", "--no_aux_loss", "--stride", "4",
            "--resolution", "352", "--ema",
        ]
    )
    assert cfg.combine_datasets == ["vidstg"]
    assert cfg.fast is False and cfg.aux_loss is False
    assert cfg.stride == 4 and cfg.resolution == 352 and cfg.ema is True


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(1000)
    a = tok.encode("a man rides a horse")
    b = tok.encode("a man rides a horse")
    assert a == b
    assert a[0] == BOS and a[-1] == EOS
    assert all(4 <= t < 1000 for t in a[1:-1])


def test_bpe_tokenizer_with_tiny_vocab():
    # build a minimal byte-level BPE: vocab covers single printable bytes +
    # one merge ("h","e" -> "he")
    from tubedetr_tpu.models.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in "helo wrd":
        vocab.setdefault(b2u[ord(ch)], len(vocab))
    vocab.setdefault(b2u[ord(" ")], len(vocab))
    vocab["he"] = len(vocab)
    tok = BPETokenizer(vocab, [(b2u[ord("h")], b2u[ord("e")])])
    ids = tok.encode("hello", add_special=False)
    # "hello" -> pieces: "he", "l", "l", "o"
    assert ids[0] == vocab["he"]
    assert len(ids) == 4


def test_build_tokenizer_fallback():
    tok = build_tokenizer("", 500)
    assert isinstance(tok, HashTokenizer)
