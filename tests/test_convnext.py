"""Timm-style ConvNeXt backbone (third TimmBackbone family): variant tables
pinned, golden forward vs a torch re-implementation with timm naming
(timm >= 0.5 convnext layout), leaf-complete checkpoint conversion, the
no-BatchNorm property (empty buffers — the reference's replace_bn is a no-op
on ConvNeXt, /root/reference/models/backbone.py:163-175), int8 wiring on the
MLP pointwise convs, a real train step, and TubeDETR integration via
--backbone timm_convnext_tiny (/root/reference/models/backbone.py:188-217)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402
from tubedetr_tpu.models.convnext import (  # noqa: E402
    ConvNeXt,
    arch_config,
    feature_channels,
)


@pytest.mark.quick
def test_variant_tables():
    assert arch_config("convnext_tiny") == ([3, 3, 9, 3], [96, 192, 384, 768])
    assert arch_config("convnext_small") == (
        [3, 3, 27, 3], [96, 192, 384, 768]
    )
    assert arch_config("convnext_base") == (
        [3, 3, 27, 3], [128, 256, 512, 1024]
    )
    assert feature_channels("convnext_tiny") == 768
    assert feature_channels("convnext_base") == 1024


class _TorchLN2d(tnn.LayerNorm):
    """timm LayerNorm2d: LN over the channel dim of NCHW."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _TorchMlp(tnn.Module):
    """timm Mlp (keys: mlp.fc1 / mlp.fc2), exact-erf GELU (torch default)."""

    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class _TorchBlock(tnn.Module):
    """timm ConvNeXtBlock (keys: conv_dw / norm / mlp.fc1 / mlp.fc2 /
    gamma)."""

    def __init__(self, dim):
        super().__init__()
        self.conv_dw = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim)
        # randomized layer scale so the golden test exercises it (the 1e-6
        # init would make every block a near-identity)
        self.gamma = tnn.Parameter(torch.rand(dim) * 0.5 + 0.25)

    def forward(self, x):
        h = self.conv_dw(x)
        h = h.permute(0, 2, 3, 1)
        h = self.mlp(self.norm(h))
        h = (self.gamma * h).permute(0, 3, 1, 2)
        return x + h


class _TorchConvNeXt(tnn.Module):
    """timm-named ConvNeXt features-only trunk (stem.{0,1} +
    stages.{i}.{downsample.{0,1},blocks.{j}})."""

    def __init__(self, arch):
        super().__init__()
        depths, dims = arch_config(arch)
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, dims[0], 4, 4), _TorchLN2d(dims[0], eps=1e-6)
        )
        stages = []
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            stage = tnn.Module()
            if si > 0:
                stage.downsample = tnn.Sequential(
                    _TorchLN2d(dims[si - 1], eps=1e-6),
                    tnn.Conv2d(dims[si - 1], dim, 2, 2),
                )
            stage.blocks = tnn.Sequential(
                *[_TorchBlock(dim) for _ in range(depth)]
            )
            stages.append(stage)
        self.stages = tnn.Sequential(*stages)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            x = stage.blocks(x)
        return x


def test_convnext_golden_vs_torch():
    torch.manual_seed(0)
    ref = _TorchConvNeXt("convnext_tiny").eval()
    x = torch.randn(2, 3, 64, 64) * 0.5
    with torch.no_grad():
        out_ref = ref(x).numpy()

    sd = ref.state_dict()
    params, buffers = tc.convert_timm_convnext(sd)
    assert buffers == {}  # no BatchNorm anywhere: replace_bn is a no-op
    model = ConvNeXt(arch="convnext_tiny")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert set(variables) == {"params"}  # LNs are trainable params
    from tubedetr_tpu.train.checkpoint import merge_params

    merged_p, missing_p, _ = merge_params(variables["params"], params)
    assert missing_p == [], missing_p[:8]
    # leaf-complete conversion: every torch tensor was consumed
    n_torch = len(sd)
    n_jax = len(jax.tree_util.tree_leaves(params))
    assert n_torch == n_jax, (n_torch, n_jax)

    out = model.apply({"params": merged_p},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert out.shape == (2, 2, 2, feature_channels("convnext_tiny"))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, atol=2e-4
    )


def test_convnext_int8_param_layout_and_forward():
    """int8 ConvNeXt: identical parameter tree to float (checkpoints
    interchange), qscales observers ONLY on the MLP pointwise convs — the
    only ConvNeXt convs above the measured >=256-channel int8 win threshold
    (stem / downsample / depthwise stay float) — dynamic-int8 forward close
    to float."""
    trunk_f = ConvNeXt(arch="convnext_tiny")
    trunk_q = ConvNeXt(arch="convnext_tiny", quant="int8")
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
    assert q_paths and all("mlp_fc" in p for p in q_paths), q_paths
    assert not any(
        "stem" in p or "downsample" in p or "conv_dw" in p for p in q_paths
    ), q_paths

    out_f = trunk_f.apply(vf, x)
    out_q, _ = trunk_q.apply(
        {"params": vf["params"], "qscales": vq["qscales"]},
        x, mutable=["qscales"],
    )
    f, q = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(q).all()
    assert np.abs(f - q).max() / (np.abs(f).max() + 1e-9) < 0.1


def test_tubedetr_with_convnext_backbone_trains_one_step():
    """Full TubeDETR with --backbone timm_convnext_tiny through a REAL
    jitted train step — exercises the empty-buffers path (TrainState with
    no FrozenBN collection) end-to-end, and that backbone LN/conv grads are
    nonzero (everything trains under lr_backbone; reference freezes only
    BN, of which ConvNeXt has none)."""
    from tests.test_quant_fast_train import _batch, tiny_cfg
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
        model_inputs,
    )

    cfg = tiny_cfg(backbone="timm_convnext_tiny")
    model = build_model(cfg)
    batch = _batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    assert "buffers" not in variables
    state, tx, labels = create_train_state(cfg, variables)
    step = make_train_step(cfg, model, tx, labels, donate=False)
    lrs = {k: jnp.asarray(1e-4, jnp.float32) for k in
           ("lr", "lr_backbone", "lr_text_encoder")}
    new_state, logs = step(state, batch, lrs, np.int32(0))
    assert np.isfinite(float(logs["loss_total"]))
    # backbone moved: LN scale and dw-conv kernel both received updates
    b0_old = state.params["backbone"]["s0_b0"]
    b0_new = new_state.params["backbone"]["s0_b0"]
    assert np.abs(
        np.asarray(b0_new["norm"]["scale"] - b0_old["norm"]["scale"])
    ).max() > 0
    assert np.abs(
        np.asarray(b0_new["conv_dw"]["kernel"] - b0_old["conv_dw"]["kernel"])
    ).max() > 0


@pytest.mark.quick
def test_convnext_int8_static_full_model():
    """Full TubeDETR with --backbone timm_convnext_tiny --backbone_quant
    int8_static: the shared calibration machinery records observers and the
    static forward runs close to float."""
    from tests.test_quant_fast_train import _batch, tiny_cfg
    from tubedetr_tpu.models.quantize import calibrate_qscales
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import model_inputs

    cfg_f = tiny_cfg(backbone="timm_convnext_tiny")
    cfg_s = tiny_cfg(backbone="timm_convnext_tiny",
                     backbone_quant="int8_static")
    model_f, model_s = build_model(cfg_f), build_model(cfg_s)
    batch = _batch(cfg_f)
    inputs = model_inputs(batch)
    vf = model_f.init(jax.random.PRNGKey(0), **inputs)
    qscales = calibrate_qscales(cfg_s, vf, inputs)
    out_f = model_f.apply(vf, **inputs)
    out_s = model_s.apply(
        {"params": vf["params"], "qscales": qscales}, **inputs
    )
    bf = np.asarray(out_f["pred_boxes"], np.float32)
    bs = np.asarray(out_s["pred_boxes"], np.float32)
    assert np.isfinite(bs).all()
    assert np.abs(bf - bs).max() < 0.05, np.abs(bf - bs).max()


def test_convnext_qat_grads_flow():
    """int8_qat: STE gradients reach the quantized MLP kernels AND their
    biases (the bias adds outside the quantization grid)."""
    trunk_f = ConvNeXt(arch="convnext_tiny")
    trunk_q = ConvNeXt(arch="convnext_tiny", quant="int8_qat")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    vf = trunk_f.init(jax.random.PRNGKey(0), x)
    vq = trunk_q.init(jax.random.PRNGKey(0), x)
    from tubedetr_tpu.models.quantize import _flatten

    trunk_d = ConvNeXt(arch="convnext_tiny", quant="int8")
    _, upd = trunk_d.apply(
        {"params": vf["params"], "qscales": vq["qscales"]},
        x, mutable=["qscales"],
    )

    def loss(params):
        out = trunk_q.apply(
            {"params": params, "qscales": upd["qscales"]}, x
        )
        return jnp.sum(jnp.square(out))

    grads = jax.grad(loss)(vf["params"])
    flat = _flatten(jax.tree_util.tree_map(np.asarray, grads))
    for name in ("mlp_fc1", "mlp_fc2"):
        for leaf in ("kernel", "bias"):
            ks = [k for k in flat if name in k and leaf in k]
            assert ks, (name, leaf)
            assert any(np.abs(flat[k]).max() > 0 for k in ks), (name, leaf)


@pytest.mark.quick
def test_convnext_rejects_frozen_prefix_quant():
    from tubedetr_tpu.config import TubeDETRConfig

    with pytest.raises(NotImplementedError, match="resnet"):
        TubeDETRConfig(
            backbone="timm_convnext_tiny",
            backbone_quant_frozen="int8_static",
        ).validate()
    TubeDETRConfig(
        backbone="timm_convnext_tiny", backbone_quant="int8_static"
    ).validate()


@pytest.mark.quick
def test_stage_truncation_shapes():
    """``stages=N`` truncates after stage N-1 (profiling aid, ResNet.stages
    semantics; 0 = stem output). Stage 0 has no downsample (the 4x4/s4
    patchify stem already produced stride 4)."""
    _, dims = arch_config("convnext_tiny")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for n in (0, 1, 2, 4):
        model = ConvNeXt(arch="convnext_tiny", stages=n)
        out = model.apply(model.init(jax.random.PRNGKey(0), x), x)
        hw = 16 // (2 ** max(0, n - 1))  # s4 stem; stages 1..3 downsample
        ch = dims[0] if n == 0 else dims[n - 1]
        assert out.shape == (1, hw, hw, ch), (n, out.shape)
