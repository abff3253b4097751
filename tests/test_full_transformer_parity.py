"""Golden glue parity: our complete TubeDETRTransformer (encoder + fast
branch + temporal replication + aggregation + time queries + decoder) vs the
reference's full ``Transformer`` module run end-to-end in torch — for every
fast-branch variant.

This covers the composition logic the per-layer golden tests cannot: caption
repetition per clip, visual|text concat order, zero pos-embed on text,
clip->frame replication, fast/slow aggregation per variant, query time-embed
and query padding masks (/root/reference/models/transformer.py:178-491).

The reference module wants HF ``from_pretrained`` downloads; we monkeypatch
them with a tiny randomly-initialised torch RobertaModel and feed the text
pre-encoded (the reference supports that input form directly).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_layer_parity import REF, _stub  # noqa: E402
from tubedetr_tpu.interop import torch_convert as tc  # noqa: E402

D, HEADS, FFN = 32, 4, 64
T, STRIDE, H, W = 6, 2, 2, 3  # feature-map dims; n_clips = 3
HW = H * W
L = 5  # text tokens
TEXT_DIM = 48  # tiny-roberta hidden size (resizer input)
ENC_L, DEC_L = 2, 2


class FakeTokenized(dict):
    """Minimal stand-in for a HF BatchEncoding (the reference only touches
    _encodings and the input_ids/attention_mask entries)."""

    _encodings = None


def _ensure_stubs():
    if "hostlist" not in sys.modules:
        _stub("hostlist")
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv_ops = _stub("torchvision.ops")
        tv_boxes = _stub("torchvision.ops.boxes")
        tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops
        tv_models = _stub("torchvision.models")
        tv_models_utils = _stub("torchvision.models._utils")
        tv_models_utils.IntermediateLayerGetter = object
        tv_models._utils = tv_models_utils
        tv.models = tv_models
    if "timm" not in sys.modules:
        timm = _stub("timm")
        timm_models = _stub("timm.models")
        timm_models.create_model = lambda *a, **k: None
        timm.models = timm_models
    if REF not in sys.path:
        sys.path.insert(0, REF)


def build_reference_transformer(fast_mode: str):
    _ensure_stubs()
    import models.transformer as ref_tr
    from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

    tiny = HFConfig(
        vocab_size=64,
        hidden_size=TEXT_DIM,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=20,
        type_vocab_size=1,
        pad_token_id=1,
    )

    class FakeTok:
        @staticmethod
        def from_pretrained(*a, **k):
            return object()

    orig_tok = ref_tr.RobertaTokenizerFast
    orig_model = ref_tr.RobertaModel
    ref_tr.RobertaTokenizerFast = FakeTok
    ref_tr.RobertaModel = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: HFModel(tiny, add_pooling_layer=False)
    )
    try:
        torch.manual_seed(0)
        module = ref_tr.Transformer(
            d_model=D,
            nhead=HEADS,
            num_encoder_layers=ENC_L,
            num_decoder_layers=DEC_L,
            dim_feedforward=FFN,
            dropout=0.0,
            return_intermediate_dec=True,
            pass_pos_and_query=True,
            text_encoder_type="fake",
            freeze_text_encoder=True,
            video_max_len=T,
            stride=STRIDE,
            no_tsa=False,
            return_weights=True,
            fast=True,
            fast_mode=fast_mode,
            learn_time_embed=False,
            rd_init_tsa=False,
            no_time_embed=False,
        ).eval()
        # the reference zero-inits fast_residual / gating weights; randomise
        # them so the aggregation paths are non-trivially exercised
        with torch.no_grad():
            for n, p in module.named_parameters():
                if "fast" in n:
                    p.uniform_(-0.3, 0.3)
    finally:
        ref_tr.RobertaTokenizerFast = orig_tok
        ref_tr.RobertaModel = orig_model
    return module


def convert_params(ref, fast_mode: str):
    sd = ref.state_dict()
    params = {
        "resizer": {
            "fc": tc.linear(sd, "resizer.fc"),
            "layer_norm": tc.layernorm(sd, "resizer.layer_norm"),
        },
        "decoder": {
            **{
                f"layer_{i}": tc._decoder_layer(sd, f"decoder.layers.{i}")
                for i in range(DEC_L)
            },
            "norm": tc.layernorm(sd, "decoder.norm"),
        },
    }
    if fast_mode != "noslow":
        params["encoder"] = {
            f"layer_{i}": tc._encoder_layer(sd, f"encoder.layers.{i}")
            for i in range(ENC_L)
        }
    if fast_mode == "transformer":
        params["fast_encoder"] = {
            "layer_0": tc._encoder_layer(sd, "fast_encoder.layers.0"),
            "norm": tc.layernorm(sd, "fast_encoder.norm"),
        }
    else:
        params["fast_encoder"] = tc.linear(sd, "fast_encoder")
    if "fast_residual.weight" in sd:
        params["fast_residual"] = tc.linear(sd, "fast_residual")
    return params


@pytest.mark.parametrize("fast_mode", ["", "gating", "pool", "noslow", "transformer"])
def test_full_transformer_parity(fast_mode):
    ref = build_reference_transformer(fast_mode)
    torch.manual_seed(1)
    n_clips = T // STRIDE
    b = 1

    src = torch.randn(n_clips, D, H, W)
    pos = torch.randn(n_clips, D, H, W)
    mask = torch.zeros(n_clips, H, W, dtype=torch.bool)
    mask[1, :, -1] = True  # some spatial padding in clip 1
    mask[:, 0, 0] = False  # reference guard
    fast_src = torch.randn(b * T, D, H, W)
    tpad_mask_t = torch.zeros(b * T, H, W, dtype=torch.bool)
    tpad_mask_t[3, -1, :] = True
    tpad_mask_t[:, 0, 0] = False
    query_embed = torch.randn(1, D)
    text_attn_mask = torch.zeros(b, L, dtype=torch.bool)
    text_attn_mask[0, -1] = True
    raw_text = torch.randn(b, L, TEXT_DIM)
    with torch.no_grad():
        resized = ref.resizer(raw_text.transpose(0, 1))  # (L, b, D)

    tokenized = FakeTokenized()
    tokenized._encodings = [None]
    tokenized["input_ids"] = torch.zeros(b, L, dtype=torch.long)
    tokenized["attention_mask"] = (~text_attn_mask).long()

    with torch.no_grad():
        cache = ref(
            src,
            mask.clone(),
            query_embed,
            pos,
            text=(text_attn_mask, resized, tokenized),
            encode_and_save=True,
            durations=[T],
            tpad_mask_t=tpad_mask_t.clone(),
            fast_src=fast_src,
        )
        hs, tsa_w, cross_w = ref(
            img_memory=cache["img_memory"],
            mask=cache["mask"],
            pos_embed=cache["pos_embed"],
            query_embed=cache["query_embed"],
            query_mask=cache["query_mask"],
            encode_and_save=False,
            text_memory=cache["text_memory"],
            text_mask=cache["text_attention_mask"],
        )
    hs_ref = hs.numpy()  # (dec_layers, b, t, D)

    # ---- ours -----------------------------------------------------------
    from tubedetr_tpu.models.transformer import TubeDETRTransformer

    model = TubeDETRTransformer(
        d_model=D,
        nheads=HEADS,
        enc_layers=ENC_L,
        dec_layers=DEC_L,
        dim_feedforward=FFN,
        dropout=0.0,
        video_max_len=T,
        stride=STRIDE,
        fast=True,
        fast_mode=fast_mode,
        text_dim=TEXT_DIM,
    )
    params = convert_params(ref, fast_mode)

    out = model.apply(
        {"params": params},
        src=jnp.asarray(
            src.numpy().reshape(b, n_clips, D, HW).transpose(0, 1, 3, 2)
        ),
        src_pad_mask=jnp.asarray(mask.numpy().reshape(b, n_clips, HW)),
        pos_embed=jnp.asarray(
            pos.numpy().reshape(b, n_clips, D, HW).transpose(0, 1, 3, 2)
        ),
        text_memory=jnp.asarray(raw_text.numpy()),
        text_pad_mask=jnp.asarray(text_attn_mask.numpy()),
        query_embed=jnp.asarray(query_embed.numpy()),
        durations=jnp.asarray(np.array([T])),
        frame_pad_mask=jnp.asarray(tpad_mask_t.numpy().reshape(b, T, HW)),
        fast_src=jnp.asarray(
            fast_src.numpy().reshape(b, T, D, HW).transpose(0, 1, 3, 2)
        ),
        deterministic=True,
    )
    hs_ours = np.asarray(out["hs"])  # (dec_layers, B, T, D)
    np.testing.assert_allclose(hs_ours, hs_ref, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["tsa_weights"])[-1], tsa_w[-1].numpy(), atol=1e-4
    )
