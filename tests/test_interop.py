"""Interop/parity tests: converted torch weights must reproduce torch logits.

These validate the converter's layout rules (SURVEY.md §7 hard part 2):
packed MHA in_proj splitting, Linear/Conv transposes, FrozenBN buffers,
RoBERTa position-id offsets — against live torch modules with random
weights (pretrained downloads are unavailable offline).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402


def test_mha_matches_torch_multihead_attention():
    torch.manual_seed(0)
    d, h, b, sq, sk = 32, 4, 3, 5, 7
    ref = torch.nn.MultiheadAttention(d, h, dropout=0.0)
    q = torch.randn(sq, b, d)
    k = torch.randn(sk, b, d)
    v = torch.randn(sk, b, d)
    key_pad = torch.zeros(b, sk, dtype=torch.bool)
    key_pad[0, -2:] = True
    with torch.no_grad():
        out_t, w_t = ref(q, k, v, key_padding_mask=key_pad)

    from tubedetr_tpu.models.layers import MultiHeadAttention

    m = MultiHeadAttention(d_model=d, num_heads=h, dropout=0.0)
    params = tc.split_in_proj(ref.state_dict(), "")
    # our params use name prefixes q_proj/... directly
    variables = {"params": params}
    out_j, w_j = m.apply(
        variables,
        jnp.asarray(q.numpy().transpose(1, 0, 2)),
        jnp.asarray(k.numpy().transpose(1, 0, 2)),
        jnp.asarray(v.numpy().transpose(1, 0, 2)),
        key_pad_mask=jnp.asarray(key_pad.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(1, 0, 2), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=2e-5)


def test_roberta_matches_hf_torch_random_init():
    from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        pad_token_id=1,
        layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    ref = HFModel(hf_cfg, add_pooling_layer=False).eval()

    ids = torch.tensor([[0, 10, 11, 12, 2, 1, 1], [0, 20, 21, 2, 1, 1, 1]])
    attn = (ids != 1).long()
    with torch.no_grad():
        out_t = ref(input_ids=ids, attention_mask=attn).last_hidden_state

    from tubedetr_tpu.models.roberta import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        ln_eps=1e-5,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    model = RobertaModel(cfg)
    params = tc.convert_roberta(ref.state_dict(), "")
    out_j = model.apply(
        {"params": params},
        jnp.asarray(ids.numpy()),
        jnp.asarray((ids == 1).numpy()),
    )
    # padded positions differ (torch computes them, we mask attention the
    # same way, but downstream consumers mask them anyway) — compare valid
    valid = (ids != 1).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j)[valid], out_t.numpy()[valid], atol=5e-5
    )


class _TorchBottleneck(torch.nn.Module):
    """Minimal torchvision-style bottleneck (v1.5) for conversion testing."""

    def __init__(self, cin, planes, stride):
        super().__init__()

        def bn(n):
            m = torch.nn.BatchNorm2d(n)
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
            return m

        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = bn(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = bn(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = bn(planes * 4)
        self.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            bn(planes * 4),
        )
        self.relu = torch.nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


def test_bottleneck_conversion_matches_torch():
    torch.manual_seed(1)
    blk = _TorchBottleneck(8, 4, 2).eval()
    x = torch.randn(2, 8, 9, 11)
    with torch.no_grad():
        ref = blk(x).numpy()

    from tubedetr_tpu.models.resnet import Bottleneck

    sd = {f"layer1.0.{k}": v for k, v in blk.state_dict().items()}
    # rename downsample.0/.1 to the converter's expected torchvision names
    sd = {
        k.replace("downsample.0", "downsample.0").replace(
            "downsample.1", "downsample.1"
        ): v
        for k, v in sd.items()
    }
    params, buffers = {}, {}
    p = {
        "conv1": tc.conv(sd, "layer1.0.conv1"),
        "conv2": tc.conv(sd, "layer1.0.conv2"),
        "conv3": tc.conv(sd, "layer1.0.conv3"),
        "downsample_conv": tc.conv(sd, "layer1.0.downsample.0"),
    }
    b = {
        "bn1": tc.frozen_bn(sd, "layer1.0.bn1"),
        "bn2": tc.frozen_bn(sd, "layer1.0.bn2"),
        "bn3": tc.frozen_bn(sd, "layer1.0.bn3"),
        "downsample_bn": tc.frozen_bn(sd, "layer1.0.downsample.1"),
    }
    m = Bottleneck(planes=4, stride=2, downsample=True)
    out = m.apply(
        {"params": p, "buffers": b},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


def test_resnet_converter_name_mapping():
    """convert_resnet handles the layerN.M naming and downsample presence."""
    torch.manual_seed(2)
    sd = {}
    blk = _TorchBottleneck(8, 2, 1)
    for k, v in blk.state_dict().items():
        sd[f"backbone.0.body.layer2.0.{k}"] = v
    # stem
    sd["backbone.0.body.conv1.weight"] = torch.randn(64, 3, 7, 7)
    for suffix, shape in (
        ("weight", 64),
        ("bias", 64),
        ("running_mean", 64),
        ("running_var", 64),
    ):
        sd[f"backbone.0.body.bn1.{suffix}"] = torch.rand(shape)
    params, buffers = tc.convert_resnet(sd, "backbone.0.body.")
    assert "conv1" in params and "layer2_0" in params
    assert params["layer2_0"]["conv2"]["kernel"].shape == (3, 3, 2, 2)
    assert "downsample_conv" in params["layer2_0"]
    assert buffers["layer2_0"]["bn3"]["running_var"].shape == (8,)


class _TorchGNBottleneck(torch.nn.Module):
    """torchvision bottleneck with GroupNorm32 (the reference resnet*-gn
    backbones, /root/reference/models/backbone.py:127-161)."""

    def __init__(self, cin, planes, stride):
        super().__init__()

        def gn(n):
            m = torch.nn.GroupNorm(32, n)
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
            return m

        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = gn(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = gn(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = gn(planes * 4)
        self.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            gn(planes * 4),
        )
        self.relu = torch.nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


def test_gn_checkpoint_converts_and_matches_torch():
    """A fabricated resnet*-gn state_dict (no running stats) converts
    leaf-complete onto the GN model and is forward-exact vs torch
    (VERDICT missing #6 / reference backbone.py:132-161)."""
    torch.manual_seed(3)
    stem_w = torch.randn(64, 3, 7, 7) * 0.05
    stem_gn_w = torch.rand(64) + 0.5
    stem_gn_b = torch.rand(64) - 0.5
    blk = _TorchGNBottleneck(64, 64, 1).eval()

    sd = {"conv1.weight": stem_w, "bn1.weight": stem_gn_w,
          "bn1.bias": stem_gn_b}
    for k, v in blk.state_dict().items():
        sd[f"layer1.0.{k}"] = v

    params, buffers = tc.convert_resnet(sd, "")
    assert buffers == {}, "GN checkpoints must carry no FrozenBN buffers"
    np.testing.assert_array_equal(params["bn1"]["scale"], stem_gn_w.numpy())
    np.testing.assert_array_equal(params["bn1"]["bias"], stem_gn_b.numpy())
    # leaf-complete merge onto the GN model variant
    from tubedetr_tpu.models.resnet import ResNet
    from tubedetr_tpu.train.checkpoint import merge_params

    model = ResNet(arch="resnet14-gn", stages=1)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged, missing, _ = merge_params(variables["params"], params)
    assert missing == [], missing

    out = model.apply({"params": merged}, jnp.asarray(x))

    # torch reference: stem (conv7x7/s2 + GN + relu + maxpool) + block
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = torch.nn.functional.conv2d(xt, stem_w, stride=2, padding=3)
        h = torch.nn.functional.group_norm(h, 32, stem_gn_w, stem_gn_b, 1e-5)
        h = torch.relu(h)
        h = torch.nn.functional.max_pool2d(h, 3, 2, 1)
        ref = blk(h).numpy()
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4
    )
