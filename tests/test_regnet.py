"""Timm-style RegNetX/Y backbone: stage plans pinned against the RegNet
paper tables, golden forward vs a torch re-implementation with timm naming
(timm==0.4.12 layout, the reference's pin), leaf-complete checkpoint
conversion, int8 wiring, and TubeDETR integration via
--backbone timm_regnety_004 (/root/reference/models/backbone.py:188-217)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402
from tubedetr_tpu.models.regnet import (  # noqa: E402
    RegNet,
    feature_channels,
    stage_plan,
)


@pytest.mark.quick
def test_stage_plans_match_published_tables():
    """The quantized-linear-width generator must reproduce the RegNet
    paper's per-stage (widths, depths) for the supported variants."""
    expect = {
        "regnetx_002": ([24, 56, 152, 368], [1, 1, 4, 7], 8),
        "regnetx_032": ([96, 192, 432, 1008], [2, 6, 15, 2], 48),
        "regnety_004": ([48, 104, 208, 440], [1, 3, 6, 6], 8),
        "regnety_008": ([64, 128, 320, 768], [1, 3, 8, 2], 16),
        "regnety_032": ([72, 216, 576, 1512], [2, 5, 13, 1], 24),
    }
    for name, (widths, depths, g) in expect.items():
        plan = stage_plan(name)
        assert [p[0] for p in plan] == widths, (name, plan)
        assert [p[1] for p in plan] == depths, (name, plan)
        assert all(p[2] == g for p in plan), (name, plan)
    assert feature_channels("regnety_008") == 768
    assert feature_channels("regnetx_002") == 368


def _bn(n):
    m = tnn.BatchNorm2d(n)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.3, 0.3)
        m.running_mean.uniform_(-0.2, 0.2)
        m.running_var.uniform_(0.5, 1.5)
    return m


class _TorchConvBn(tnn.Module):
    """timm ConvBnAct without the act (keys: .conv / .bn)."""

    def __init__(self, c_in, c_out, k, s, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(c_in, c_out, k, s, k // 2, groups=groups,
                               bias=False)
        self.bn = _bn(c_out)

    def forward(self, x):
        return self.bn(self.conv(x))


class _TorchSE(tnn.Module):
    """timm SEModule (keys: se.fc1 / se.fc2)."""

    def __init__(self, c, reduced):
        super().__init__()
        self.fc1 = tnn.Conv2d(c, reduced, 1)
        self.fc2 = tnn.Conv2d(reduced, c, 1)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = tnn.functional.relu(self.fc1(se))
        return x * torch.sigmoid(self.fc2(se))


class _TorchBottleneck(tnn.Module):
    """timm RegNet Bottleneck, bottle_ratio 1."""

    def __init__(self, c_in, w, stride, gw, se_reduced):
        super().__init__()
        self.conv1 = _TorchConvBn(c_in, w, 1, 1)
        self.conv2 = _TorchConvBn(w, w, 3, stride, groups=w // gw)
        if se_reduced:
            self.se = _TorchSE(w, se_reduced)
        else:
            self.se = None
        self.conv3 = _TorchConvBn(w, w, 1, 1)
        if stride != 1 or c_in != w:
            self.downsample = _TorchConvBn(c_in, w, 1, stride)
        else:
            self.downsample = None

    def forward(self, x):
        h = tnn.functional.relu(self.conv1(x))
        h = tnn.functional.relu(self.conv2(h))
        if self.se is not None:
            h = self.se(h)
        h = self.conv3(h)
        shortcut = x if self.downsample is None else self.downsample(x)
        return tnn.functional.relu(h + shortcut)


class _TorchRegNet(tnn.Module):
    """timm-named RegNet features-only trunk (stem + s1..s4 / b1..bN)."""

    def __init__(self, arch):
        super().__init__()
        self.stem = _TorchConvBn(3, 32, 3, 2)
        c_prev = 32
        for si, (w, d, gw, se) in enumerate(stage_plan(arch), start=1):
            stage = tnn.Module()
            for bi in range(1, d + 1):
                se_reduced = int(round(c_prev * se)) if se else 0
                setattr(
                    stage,
                    f"b{bi}",
                    _TorchBottleneck(
                        c_prev, w, 2 if bi == 1 else 1, gw, se_reduced
                    ),
                )
                c_prev = w
            setattr(self, f"s{si}", stage)

    def forward(self, x):
        x = tnn.functional.relu(self.stem(x))
        for si in range(1, 5):
            stage = getattr(self, f"s{si}")
            bi = 1
            while hasattr(stage, f"b{bi}"):
                x = getattr(stage, f"b{bi}")(x)
                bi += 1
        return x


@pytest.mark.parametrize("arch", ["regnetx_002", "regnety_004"])
def test_regnet_golden_vs_torch(arch):
    torch.manual_seed(0)
    ref = _TorchRegNet(arch).eval()
    x = torch.randn(2, 3, 64, 64) * 0.5
    with torch.no_grad():
        out_ref = ref(x).numpy()

    sd = ref.state_dict()
    params, buffers = tc.convert_timm_regnet(sd)
    model = RegNet(arch=arch)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    from tubedetr_tpu.train.checkpoint import merge_params

    merged_p, missing_p, _ = merge_params(variables["params"], params)
    merged_b, missing_b, _ = merge_params(variables["buffers"], buffers)
    assert missing_p == [], missing_p[:8]
    assert missing_b == [], missing_b[:8]
    # leaf-complete conversion: every torch tensor was consumed
    n_torch = sum(1 for k in sd if "num_batches_tracked" not in k)
    n_jax = len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(buffers)
    )
    assert n_torch == n_jax, (n_torch, n_jax)

    out = model.apply(
        {"params": merged_p, "buffers": merged_b},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    assert out.shape == (2, 2, 2, feature_channels(arch))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, atol=2e-4
    )


def test_regnet_int8_param_layout_and_forward():
    """int8 RegNet: identical parameter tree to float (checkpoints
    interchange), qscales observers only on the block convs (stem + SE
    stay float), dynamic-int8 forward close to float."""
    trunk_f = RegNet(arch="regnety_004")
    trunk_q = RegNet(arch="regnety_004", quant="int8")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    vf = trunk_f.init(jax.random.PRNGKey(0), x)
    vq = trunk_q.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert paths(vf["params"]) == paths(vq["params"])
    q_paths = sorted(paths(vq["qscales"]))
    assert q_paths and all("conv" in p for p in q_paths), q_paths
    assert not any("stem" in p or "se" in p for p in q_paths), q_paths

    out_f = trunk_f.apply(vf, x)
    out_q, _ = trunk_q.apply(
        {"params": vf["params"], "buffers": vf["buffers"],
         "qscales": vq["qscales"]},
        x, mutable=["qscales"],
    )
    f, q = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(q).all()
    assert np.abs(f - q).max() / (np.abs(f).max() + 1e-9) < 0.1


def test_tubedetr_with_regnet_backbone_runs():
    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.models.tubedetr import build_model

    cfg = TubeDETRConfig(
        backbone="timm_regnety_004",
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


@pytest.mark.quick
def test_regnet_int8_static_full_model():
    """Full TubeDETR with --backbone timm_regnety_004 --backbone_quant
    int8_static: the shared calibration machinery records observers and
    the static forward runs close to float."""
    from tests.test_quant_fast_train import _batch, tiny_cfg
    from tubedetr_tpu.models.quantize import calibrate_qscales
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import model_inputs

    cfg_f = tiny_cfg(backbone="timm_regnety_004")
    cfg_s = tiny_cfg(backbone="timm_regnety_004",
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


def test_regnet_qat_grads_flow():
    """int8_qat on the RegNet trunk: STE gradients reach every quantized
    conv kernel (incl. the grouped 3x3s and the downsample projections)."""
    trunk_f = RegNet(arch="regnety_004")
    trunk_q = RegNet(arch="regnety_004", quant="int8_qat")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    vf = trunk_f.init(jax.random.PRNGKey(0), x)
    vq = trunk_q.init(jax.random.PRNGKey(0), x)
    from tubedetr_tpu.models.quantize import _flatten

    # calibrated stand-in: dynamic observers from one int8 forward
    trunk_d = RegNet(arch="regnety_004", quant="int8")
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
    for name in ("conv1_conv", "conv2_conv", "conv3_conv",
                 "downsample_conv"):
        ks = [k for k in flat if name in k and "kernel" in k]
        assert ks, name
        assert any(np.abs(flat[k]).max() > 0 for k in ks), name


def test_regnet_rejects_frozen_prefix_quant():
    from tubedetr_tpu.config import TubeDETRConfig

    with pytest.raises(NotImplementedError, match="resnet"):
        TubeDETRConfig(
            backbone="timm_regnety_004",
            backbone_quant_frozen="int8_static",
        ).validate()
    TubeDETRConfig(
        backbone="timm_regnety_004", backbone_quant="int8_static"
    ).validate()


@pytest.mark.quick
def test_stage_truncation_shapes():
    """``stages=N`` truncates after stage sN (profiling aid, same semantics
    as ResNet.stages; 0 = stem output)."""
    plan = stage_plan("regnety_004")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for n in (0, 2, 4):
        model = RegNet(arch="regnety_004", stages=n)
        out = model.apply(model.init(jax.random.PRNGKey(0), x), x)
        hw = 32 // (2 ** n)  # s2 stem, every stage's first block is s2
        ch = 32 if n == 0 else plan[n - 1][0]
        assert out.shape == (1, hw, hw, ch), (n, out.shape)
