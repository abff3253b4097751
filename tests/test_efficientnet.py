"""Timm-style EfficientNet backbone: golden forward vs a torch
re-implementation with timm naming, leaf-complete checkpoint conversion, and
TubeDETR integration via --backbone timm_efficientnet_b0
(/root/reference/models/backbone.py:188-217)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402
from tubedetr_tpu.models.efficientnet import (  # noqa: E402
    EfficientNet,
    arch_config,
    feature_channels,
)


def _bn(n):
    m = tnn.BatchNorm2d(n)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.3, 0.3)
        m.running_mean.uniform_(-0.2, 0.2)
        m.running_var.uniform_(0.5, 1.5)
    return m


class _TorchSE(tnn.Module):
    def __init__(self, c, reduced):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(c, reduced, 1)
        self.conv_expand = tnn.Conv2d(reduced, c, 1)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = tnn.functional.silu(self.conv_reduce(se))
        return x * torch.sigmoid(self.conv_expand(se))


class _TorchDS(tnn.Module):
    """timm DepthwiseSeparableConv."""

    def __init__(self, c_in, c_out, stride, k, se_reduced):
        super().__init__()
        self.conv_dw = tnn.Conv2d(c_in, c_in, k, stride, k // 2,
                                  groups=c_in, bias=False)
        self.bn1 = _bn(c_in)
        self.se = _TorchSE(c_in, se_reduced)
        self.conv_pw = tnn.Conv2d(c_in, c_out, 1, bias=False)
        self.bn2 = _bn(c_out)
        self.has_res = stride == 1 and c_in == c_out

    def forward(self, x):
        h = tnn.functional.silu(self.bn1(self.conv_dw(x)))
        h = self.bn2(self.conv_pw(self.se(h)))
        return h + x if self.has_res else h


class _TorchIR(tnn.Module):
    """timm InvertedResidual (MBConv)."""

    def __init__(self, c_in, c_out, stride, k, expand, se_reduced):
        super().__init__()
        mid = c_in * expand
        self.conv_pw = tnn.Conv2d(c_in, mid, 1, bias=False)
        self.bn1 = _bn(mid)
        self.conv_dw = tnn.Conv2d(mid, mid, k, stride, k // 2,
                                  groups=mid, bias=False)
        self.bn2 = _bn(mid)
        self.se = _TorchSE(mid, se_reduced)
        self.conv_pwl = tnn.Conv2d(mid, c_out, 1, bias=False)
        self.bn3 = _bn(c_out)
        self.has_res = stride == 1 and c_in == c_out

    def forward(self, x):
        h = tnn.functional.silu(self.bn1(self.conv_pw(x)))
        h = tnn.functional.silu(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(self.se(h)))
        return h + x if self.has_res else h


class _TorchEffNet(tnn.Module):
    """timm-named EfficientNet features-only trunk."""

    def __init__(self, arch):
        super().__init__()
        stem_ch, stages = arch_config(arch)
        self.conv_stem = tnn.Conv2d(3, stem_ch, 3, 2, 1, bias=False)
        self.bn1 = _bn(stem_ch)
        blocks = []
        c_prev = stem_ch
        for (expand, ch, repeats, stride, kernel) in stages:
            stage = []
            for bi in range(repeats):
                s = stride if bi == 0 else 1
                se_reduced = max(1, int(c_prev * 0.25))
                if expand == 1:
                    stage.append(_TorchDS(c_prev, ch, s, kernel, se_reduced))
                else:
                    stage.append(
                        _TorchIR(c_prev, ch, s, kernel, expand, se_reduced)
                    )
                c_prev = ch
            blocks.append(tnn.Sequential(*stage))
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(tnn.functional.silu(self.bn1(self.conv_stem(x))))


def test_efficientnet_b0_golden_vs_torch():
    torch.manual_seed(0)
    ref = _TorchEffNet("efficientnet_b0").eval()
    x = torch.randn(2, 3, 64, 64) * 0.5
    with torch.no_grad():
        out_ref = ref(x).numpy()

    params, buffers = tc.convert_timm_efficientnet(ref.state_dict())
    model = EfficientNet(arch="efficientnet_b0")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    from tubedetr_tpu.train.checkpoint import merge_params

    merged_p, missing_p, _ = merge_params(variables["params"], params)
    merged_b, missing_b, _ = merge_params(variables["buffers"], buffers)
    assert missing_p == [], missing_p[:8]
    assert missing_b == [], missing_b[:8]

    out = model.apply(
        {"params": merged_p, "buffers": merged_b},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    assert out.shape == (2, 2, 2, feature_channels("efficientnet_b0"))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, atol=2e-4
    )


def test_feature_channels():
    assert feature_channels("efficientnet_b0") == 320
    assert feature_channels("efficientnet_b3") == 384


def test_tubedetr_with_timm_backbone_runs():
    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.models.tubedetr import build_model

    cfg = TubeDETRConfig(
        backbone="timm_efficientnet_b0",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=4,
        video_max_len_train=4,
        stride=2,
        max_text_len=6,
        text_vocab_size=64,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=20,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = dict(
        frames_slow=rng.randn(1, cfg.n_clips, 64, 64, 3).astype(np.float32),
        slow_pad_mask=np.zeros((1, cfg.n_clips, 64, 64), bool),
        tokens=rng.randint(2, 64, (1, 6)).astype(np.int32),
        text_pad_mask=np.zeros((1, 6), bool),
        durations=np.array([4], np.int32),
        frames_fast=rng.randn(1, 4, 64, 64, 3).astype(np.float32),
        fast_pad_mask=np.zeros((1, 4, 64, 64), bool),
    )
    v = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(v, **batch)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert out["pred_boxes"].shape == (1, 4, 4)

    with pytest.raises(NotImplementedError):
        build_model(cfg.replace(backbone="timm_nope")).init(
            jax.random.PRNGKey(0), **batch
        )


def test_timm_backbone_rejects_frozen_prefix_quant():
    """EfficientNet has no always-frozen prefix (timm freezes only BN),
    so only backbone_quant_frozen is rejected; backbone_quant/-_fast are
    supported (see the quant tests below)."""
    import pytest

    from tubedetr_tpu.config import TubeDETRConfig

    with pytest.raises(NotImplementedError, match="resnet"):
        TubeDETRConfig(
            backbone="timm_efficientnet_b0",
            backbone_quant_frozen="int8_static",
        ).validate()
    TubeDETRConfig(
        backbone="timm_efficientnet_b0", backbone_quant="int8_static"
    ).validate()
    TubeDETRConfig(
        backbone="timm_efficientnet_b0", fast=True,
        backbone_quant_fast="int8",
    ).validate()


def _effnet_setup(quant):
    trunk_f = EfficientNet(arch="efficientnet_b0")
    trunk_q = EfficientNet(arch="efficientnet_b0", quant=quant)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    vf = trunk_f.init(jax.random.PRNGKey(0), x)
    return trunk_f, trunk_q, x, vf


def test_efficientnet_int8_param_layout_and_forward():
    """int8 EfficientNet: the quantized trunk declares the SAME parameter
    tree as the float one (BottleneckConv's ``kernel`` path matches
    nn.Conv's — checkpoints interchange), adds only qscales observers on
    conv_pw/conv_dw/conv_pwl (stem + SE stay float), and the dynamic-int8
    forward stays close to float."""
    trunk_f, trunk_q, x, vf = _effnet_setup("int8")
    vq = trunk_q.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert paths(vf["params"]) == paths(vq["params"])
    q_paths = sorted(paths(vq["qscales"]))
    assert q_paths and all(
        any(c in p for c in ("conv_pw", "conv_dw", "conv_pwl"))
        for p in q_paths
    ), q_paths
    assert not any("conv_stem" in p or "se" in p for p in q_paths), q_paths

    out_f = trunk_f.apply(vf, x)
    out_q, upd = trunk_q.apply(
        {"params": vf["params"], "buffers": vf["buffers"],
         "qscales": vq["qscales"]},
        x, mutable=["qscales"],
    )
    f, q = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(q).all()
    denom = max(1e-6, float(np.abs(f).max()))
    assert np.abs(f - q).max() / denom < 0.1, np.abs(f - q).max()

    # static path consumes the just-recorded maxima and stays close too
    trunk_s = EfficientNet(arch="efficientnet_b0", quant="int8_static")
    out_s = trunk_s.apply(
        {"params": vf["params"], "buffers": vf["buffers"],
         "qscales": upd["qscales"]},
        x,
    )
    assert np.abs(f - np.asarray(out_s)).max() / denom < 0.1


def test_efficientnet_int8_static_full_model():
    """Full TubeDETR with --backbone timm_efficientnet_b0 --backbone_quant
    int8_static: the shared calibration machinery records observers and the
    static forward runs close to float."""
    from tests.test_quant_fast_train import _batch, tiny_cfg
    from tubedetr_tpu.models.quantize import calibrate_qscales
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import model_inputs

    cfg_f = tiny_cfg(backbone="timm_efficientnet_b0")
    cfg_s = tiny_cfg(backbone="timm_efficientnet_b0",
                     backbone_quant="int8_static")
    model_f, model_s = build_model(cfg_f), build_model(cfg_s)
    batch = _batch(cfg_f)
    inputs = model_inputs(batch)
    vf = model_f.init(jax.random.PRNGKey(0), **inputs)
    qscales = calibrate_qscales(cfg_s, vf, inputs)
    out_f = model_f.apply(vf, **inputs)
    out_s = model_s.apply(
        {"params": vf["params"], "buffers": vf["buffers"],
         "qscales": qscales},
        **inputs,
    )
    bf = np.asarray(out_f["pred_boxes"], np.float32)
    bs = np.asarray(out_s["pred_boxes"], np.float32)
    assert np.isfinite(bs).all()
    assert np.abs(bf - bs).max() < 0.05, np.abs(bf - bs).max()


def test_efficientnet_qat_grads_flow():
    """int8_qat on the EfficientNet trunk: STE gradients reach every
    quantized conv kernel (incl. the depthwise grouped convs)."""
    trunk_f, trunk_q, x, vf = _effnet_setup("int8_qat")
    vq = trunk_q.init(jax.random.PRNGKey(0), x)
    from tubedetr_tpu.models.quantize import _flatten

    # calibrated stand-in: dynamic observers from one int8 forward
    trunk_d = EfficientNet(arch="efficientnet_b0", quant="int8")
    _, upd = trunk_d.apply(
        {"params": vf["params"], "buffers": vf["buffers"],
         "qscales": vq["qscales"]},
        x, mutable=["qscales"],
    )

    def loss(params):
        out = trunk_q.apply(
            {"params": params, "buffers": vf["buffers"],
             "qscales": upd["qscales"]},
            x,
        )
        return jnp.sum(jnp.square(out))

    grads = jax.grad(loss)(vf["params"])
    flat = _flatten(jax.tree_util.tree_map(np.asarray, grads))
    for name in ("conv_pw", "conv_dw", "conv_pwl"):
        ks = [k for k in flat if name in k and "kernel" in k]
        assert ks
        assert any(np.abs(flat[k]).max() > 0 for k in ks), name


@pytest.mark.quick
def test_stage_truncation_shapes():
    """``stages=N`` truncates after the Nth block stage (profiling aid,
    same semantics as ResNet.stages; 0 = stem output)."""
    stem_ch, plan = arch_config("efficientnet_b0")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for n in (0, 2, len(plan)):
        model = EfficientNet(arch="efficientnet_b0", stages=n)
        out = model.apply(model.init(jax.random.PRNGKey(0), x), x)
        hw, ch = 32, stem_ch  # 3x3/s2 stem
        for expand, c, repeats, stride, kernel in plan[:n]:
            hw, ch = hw // stride, c
        assert out.shape == (1, hw, hw, ch), (n, out.shape)
