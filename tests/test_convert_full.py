"""Full-model converter coverage: a fabricated reference-named state_dict
must map onto every leaf of our initialised variable tree (no missing keys),
through the same ``--load`` path used for real checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tubedetr_tpu.config import TubeDETRConfig  # noqa: E402
from tubedetr_tpu.models.tubedetr import build_model  # noqa: E402
from tubedetr_tpu.train.checkpoint import merge_params, warm_start_surgery  # noqa: E402
from tubedetr_tpu.interop.torch_convert import convert_tubedetr  # noqa: E402


def tiny_cfg(backbone="resnet14"):
    return TubeDETRConfig(
        backbone=backbone,
        hidden_dim=32,
        nheads=4,
        enc_layers=2,
        dec_layers=2,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        max_text_len=6,
        text_vocab_size=64,
        text_hidden_size=32,
        text_layers=2,
        text_heads=4,
        text_ffn=64,
        text_max_positions=20,
        fast=True,
        guided_attn=True,
        sted=True,
    )


def fabricate_reference_state_dict(cfg) -> dict:
    """Reference checkpoint names (torch layouts) with shapes matching the
    tiny config. Mirrors the module naming of /root/reference/models/*."""
    sd = {}
    rng = np.random.RandomState(0)
    t = lambda *shape: torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.02)

    d = cfg.hidden_dim
    td = cfg.text_hidden_size

    def linear(name, o, i):
        sd[f"{name}.weight"] = t(o, i)
        sd[f"{name}.bias"] = t(o)

    def ln(name, n):
        sd[f"{name}.weight"] = t(n)
        sd[f"{name}.bias"] = t(n)

    def mha(name, dim):
        sd[f"{name}.in_proj_weight"] = t(3 * dim, dim)
        sd[f"{name}.in_proj_bias"] = t(3 * dim)
        linear(f"{name}.out_proj", dim, dim)

    def bn(name, n):
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{k}"] = t(n).abs() + 0.1
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    # ---- backbone -------------------------------------------------------
    B = "backbone.0.body"
    if cfg.backbone.startswith("timm_regnet"):
        # timm RegNet naming (stem / s{i}.b{j}.conv{1,2,3}.{conv,bn})
        from tubedetr_tpu.models.regnet import feature_channels, stage_plan

        sd[f"{B}.stem.conv.weight"] = t(32, 3, 3, 3)
        bn(f"{B}.stem.bn", 32)
        c_prev = 32
        for si, (w, depth, gw, se) in enumerate(
            stage_plan(cfg.backbone[len("timm_"):]), start=1
        ):
            for bi in range(1, depth + 1):
                base = f"{B}.s{si}.b{bi}"
                sd[f"{base}.conv1.conv.weight"] = t(w, c_prev, 1, 1)
                bn(f"{base}.conv1.bn", w)
                sd[f"{base}.conv2.conv.weight"] = t(w, gw, 3, 3)
                bn(f"{base}.conv2.bn", w)
                if se:
                    red = int(round(c_prev * se))
                    sd[f"{base}.se.fc1.weight"] = t(red, w, 1, 1)
                    sd[f"{base}.se.fc1.bias"] = t(red)
                    sd[f"{base}.se.fc2.weight"] = t(w, red, 1, 1)
                    sd[f"{base}.se.fc2.bias"] = t(w)
                sd[f"{base}.conv3.conv.weight"] = t(w, w, 1, 1)
                bn(f"{base}.conv3.bn", w)
                if bi == 1:  # stride/width change: projection shortcut
                    sd[f"{base}.downsample.conv.weight"] = t(w, c_prev, 1, 1)
                    bn(f"{base}.downsample.bn", w)
                c_prev = w
        num_channels = feature_channels(cfg.backbone[len("timm_"):])
    else:
        # resnet14: 1 bottleneck per stage
        sd[f"{B}.conv1.weight"] = t(64, 3, 7, 7)
        bn(f"{B}.bn1", 64)
        inplanes = 64
        for li, planes in enumerate((64, 128, 256, 512), start=1):
            base = f"{B}.layer{li}.0"
            sd[f"{base}.conv1.weight"] = t(planes, inplanes, 1, 1)
            bn(f"{base}.bn1", planes)
            sd[f"{base}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{base}.bn2", planes)
            sd[f"{base}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            bn(f"{base}.bn3", planes * 4)
            sd[f"{base}.downsample.0.weight"] = t(planes * 4, inplanes, 1, 1)
            bn(f"{base}.downsample.1", planes * 4)
            inplanes = planes * 4
        num_channels = 2048

    # ---- text encoder (HF roberta naming) ------------------------------
    R = "transformer.text_encoder"
    sd[f"{R}.embeddings.word_embeddings.weight"] = t(cfg.text_vocab_size, td)
    sd[f"{R}.embeddings.position_embeddings.weight"] = t(cfg.text_max_positions, td)
    sd[f"{R}.embeddings.token_type_embeddings.weight"] = t(1, td)
    ln(f"{R}.embeddings.LayerNorm", td)
    for i in range(cfg.text_layers):
        L = f"{R}.encoder.layer.{i}"
        linear(f"{L}.attention.self.query", td, td)
        linear(f"{L}.attention.self.key", td, td)
        linear(f"{L}.attention.self.value", td, td)
        linear(f"{L}.attention.output.dense", td, td)
        ln(f"{L}.attention.output.LayerNorm", td)
        linear(f"{L}.intermediate.dense", cfg.text_ffn, td)
        linear(f"{L}.output.dense", td, cfg.text_ffn)
        ln(f"{L}.output.LayerNorm", td)

    # ---- transformer ----------------------------------------------------
    linear("transformer.resizer.fc", d, td)
    ln("transformer.resizer.layer_norm", d)
    for i in range(cfg.enc_layers):
        E = f"transformer.encoder.layers.{i}"
        mha(f"{E}.self_attn", d)
        linear(f"{E}.linear1", cfg.dim_feedforward, d)
        linear(f"{E}.linear2", d, cfg.dim_feedforward)
        ln(f"{E}.norm1", d)
        ln(f"{E}.norm2", d)
    for i in range(cfg.dec_layers):
        D = f"transformer.decoder.layers.{i}"
        mha(f"{D}.self_attn", d)
        mha(f"{D}.cross_attn_image", d)
        linear(f"{D}.linear1", cfg.dim_feedforward, d)
        linear(f"{D}.linear2", d, cfg.dim_feedforward)
        ln(f"{D}.norm1", d)
        ln(f"{D}.norm3", d)
        ln(f"{D}.norm4", d)
    ln("transformer.decoder.norm", d)
    linear("transformer.fast_encoder", d, d)
    linear("transformer.fast_residual", d, d)
    # sine time-embed buffer: deleted by the load surgery
    sd["transformer.time_embed.te"] = t(cfg.video_max_len_train, 1, d)

    # ---- heads ----------------------------------------------------------
    sd["input_proj.weight"] = t(d, num_channels, 1, 1)
    sd["input_proj.bias"] = t(d)
    sd["query_embed.weight"] = t(5, d)  # 5 queries -> truncated to 1
    for i, (o, inp) in enumerate(((d, d), (d, d), (4, d))):
        linear(f"bbox_embed.layers.{i}", o, inp)
    for i, (o, inp) in enumerate(((d, d), (2, d))):
        linear(f"sted_embed.layers.{i}", o, inp)
    return sd


@pytest.mark.parametrize("backbone", ["resnet14", "timm_regnety_002"])
def test_convert_full_covers_every_leaf(backbone):
    cfg = tiny_cfg(backbone)
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    batch = dict(
        frames_slow=rng.randn(1, cfg.n_clips, 32, 32, 3).astype(np.float32),
        slow_pad_mask=np.zeros((1, cfg.n_clips, 32, 32), bool),
        tokens=rng.randint(2, cfg.text_vocab_size, (1, cfg.max_text_len)),
        text_pad_mask=np.zeros((1, cfg.max_text_len), bool),
        durations=np.array([cfg.video_max_len_train]),
        frames_fast=rng.randn(1, cfg.video_max_len_train, 32, 32, 3).astype(
            np.float32
        ),
        fast_pad_mask=np.zeros((1, cfg.video_max_len_train, 32, 32), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch)

    sd = fabricate_reference_state_dict(cfg)
    sd = warm_start_surgery(sd, cfg.num_queries)
    assert "transformer.time_embed.te" not in sd
    assert sd["query_embed.weight"].shape[0] == 1

    params, buffers = convert_tubedetr(sd, cfg)
    merged_p, missing_p, used_p = merge_params(variables["params"], params)
    merged_b, missing_b, _ = merge_params(variables.get("buffers", {}), buffers)
    assert missing_p == [], f"unconverted params: {missing_p[:10]}"
    assert missing_b == [], f"unconverted buffers: {missing_b[:10]}"

    # spot-check layout rules
    np.testing.assert_allclose(
        merged_p["input_proj"]["kernel"],
        sd["input_proj.weight"].numpy()[:, :, 0, 0].T,
    )
    if backbone == "resnet14":
        np.testing.assert_allclose(
            merged_p["backbone"]["conv1"]["kernel"],
            sd["backbone.0.body.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        )
    else:
        np.testing.assert_allclose(
            merged_p["backbone"]["stem_conv"]["kernel"],
            sd["backbone.0.body.stem.conv.weight"].numpy()
            .transpose(2, 3, 1, 0),
        )
    # model must run with converted weights
    out = model.apply({"params": merged_p, "buffers": merged_b}, **batch)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
