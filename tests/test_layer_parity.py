"""Golden logit parity: our Flax encoder/decoder layers vs the reference's
torch layers with converted weights (SURVEY.md §4 golden-tensor strategy).

The reference package needs torchvision/timm/hostlist, which this image
lacks; they are stubbed with minimal fakes (only ``box_area`` is actually
touched by the imported module graph).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402

REF = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.__path__ = []  # mark as package so submodule imports resolve
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref_transformer():
    # stub unavailable deps of the reference package
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv_ops = _stub("torchvision.ops")
        tv_boxes = _stub("torchvision.ops.boxes")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        tv_boxes.box_area = box_area
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops
        tv_models = _stub("torchvision.models")
        tv_models_utils = _stub("torchvision.models._utils")
        tv_models_utils.IntermediateLayerGetter = object
        tv_models._utils = tv_models_utils
        tv.models = tv_models
    if "hostlist" not in sys.modules:
        _stub("hostlist")
    if "timm" not in sys.modules:
        timm = _stub("timm")
        timm_models = _stub("timm.models")
        timm_models.create_model = lambda *a, **k: None
        timm.models = timm_models
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.transformer as ref_tr  # noqa: E402

    return ref_tr


def test_encoder_layer_parity(ref_transformer):
    torch.manual_seed(0)
    d, h, s, b = 32, 4, 9, 3
    ref = ref_transformer.TransformerEncoderLayer(d, h, 64, dropout=0.0).eval()
    src = torch.randn(s, b, d)
    pos = torch.randn(s, b, d)
    pad = torch.zeros(b, s, dtype=torch.bool)
    pad[0, -3:] = True
    with torch.no_grad():
        out_t, w_t = ref(src, src_key_padding_mask=pad, pos=pos)

    from tubedetr_tpu.models.transformer import EncoderLayer

    sd = {f"layer.{k}": v for k, v in ref.state_dict().items()}
    params = tc._encoder_layer(sd, "layer")
    m = EncoderLayer(d, h, 64, 0.0)
    out_j, w_j = m.apply(
        {"params": params},
        jnp.asarray(src.numpy().transpose(1, 0, 2)),
        jnp.asarray(pos.numpy().transpose(1, 0, 2)),
        jnp.asarray(pad.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(1, 0, 2), atol=3e-5
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=3e-5)


def test_decoder_layer_parity(ref_transformer):
    """TSA + time-aligned cross-attention + FFN, ragged durations."""
    torch.manual_seed(1)
    d, h, t, b, s = 32, 4, 5, 2, 7
    ref = ref_transformer.TransformerDecoderLayer(d, h, 64, dropout=0.0).eval()

    tgt = torch.randn(t, b, d)
    query_pos = torch.randn(t, b, d)
    memory = torch.randn(s, b * t, d)  # per-frame memory, seq-first
    mem_pos = torch.randn(s, b * t, d)
    mem_pad = torch.zeros(b * t, s, dtype=torch.bool)
    mem_pad[3, -2:] = True
    mem_pad[7, -4:] = True
    tgt_pad = torch.zeros(b, t, dtype=torch.bool)
    tgt_pad[1, -2:] = True  # video 1 has only 3 valid frames

    with torch.no_grad():
        out_t, w_t, cw_t = ref(
            tgt,
            memory,
            memory_key_padding_mask=mem_pad,
            pos=mem_pos,
            query_pos=query_pos,
            tgt_key_padding_mask=tgt_pad,
        )

    from tubedetr_tpu.models.transformer import DecoderLayer

    sd = {f"layer.{k}": v for k, v in ref.state_dict().items()}
    params = tc._decoder_layer(sd, "layer")
    m = DecoderLayer(d, h, 64, 0.0)

    # reference memory layout is (s, b*t, d) with frame-major flattening of
    # (b, t); ours is (b, t, s, d)
    mem_j = memory.numpy().transpose(1, 0, 2).reshape(b, t, s, d)
    mem_pos_j = mem_pos.numpy().transpose(1, 0, 2).reshape(b, t, s, d)
    mem_pad_j = mem_pad.numpy().reshape(b, t, s)
    out_j, w_j, cw_j = m.apply(
        {"params": params},
        jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
        jnp.asarray(query_pos.numpy().transpose(1, 0, 2)),
        jnp.asarray(mem_j),
        jnp.asarray(mem_pos_j),
        jnp.asarray(mem_pad_j),
        jnp.asarray(tgt_pad.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(1, 0, 2), atol=3e-5
    )
    # TSA weights: reference (b, t, t)
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=3e-5)
    # cross weights: reference (b*t, 1, s) -> (b, t, s)
    np.testing.assert_allclose(
        np.asarray(cw_j), cw_t.numpy().reshape(b, t, s), atol=3e-5
    )
