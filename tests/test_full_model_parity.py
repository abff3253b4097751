"""FULL-model golden parity through ``--load``: the ENTIRE reference
``TubeDETR.forward`` (backbone -> input_proj -> transformer -> heads,
/root/reference/models/tubedetr.py:93-254) run in torch with random weights,
saved as a reference-format ``.pth`` (/root/reference/main.py:677-686), loaded
through ``load_torch_checkpoint_into`` — asserting fp32 logit parity of
``pred_boxes`` / ``pred_sted`` / attention ``weights`` / aux outputs.

This is the composition test the per-component golden tests cannot provide:
if ANY converter name/layout rule, stride/padding bookkeeping step or glue
detail drifts, this fails. Covered: fast branch on/off, ragged duration with
a ``dur % stride != 0`` tail clip, spatial padding masks.

The reference backbone builds ``getattr(torchvision.models, name)``; this
image has no torchvision, so the stub is upgraded with a REAL (minimal)
IntermediateLayerGetter and a ``resnet14`` factory following torchvision's
Bottleneck/_make_layer semantics exactly (incl. the previous-dilation rule).
The tokenizer is our deterministic HashTokenizer on both sides.
"""

import sys
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402

from tests.test_layer_parity import REF, _stub  # noqa: E402
from tubedetr_tpu.config import TubeDETRConfig  # noqa: E402
from tubedetr_tpu.models.tokenizer import HashTokenizer  # noqa: E402
from tubedetr_tpu.models.tubedetr import build_model  # noqa: E402

D, HEADS, FFN = 32, 4, 64
T, STRIDE = 6, 2
TEXT_DIM = 48
ENC_L, DEC_L = 2, 2
VOCAB = 64
RES = 64  # input pixels; feature map 2x2 at stride 32


# ---------------------------------------------------------------------------
# torch-side minimal torchvision-compatible ResNet (exact naming + semantics)
# ---------------------------------------------------------------------------


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=stride, padding=dilation,
            dilation=dilation, bias=False,
        )
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TinyResNet(nn.Module):
    """resnet14: one Bottleneck per stage, torchvision naming/semantics."""

    def __init__(self, replace_stride_with_dilation=None, norm_layer=None,
                 **_ignored):
        super().__init__()
        rswd = replace_stride_with_dilation or [False, False, False]
        self.inplanes, self.dilation = 64, 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, stride=1, norm_layer=norm_layer)
        self.layer2 = self._make_layer(128, 2, rswd[0], norm_layer)
        self.layer3 = self._make_layer(256, 2, rswd[1], norm_layer)
        self.layer4 = self._make_layer(512, 2, rswd[2], norm_layer)

    def _make_layer(self, planes, stride=1, dilate=False, norm_layer=None):
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            norm_layer(planes * 4),
        )
        block = _Bottleneck(
            self.inplanes, planes, stride, downsample,
            dilation=previous_dilation, norm_layer=norm_layer,
        )
        self.inplanes = planes * 4
        return nn.Sequential(block)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _ILG(nn.ModuleDict):
    """Working IntermediateLayerGetter (torchvision.models._utils semantics)."""

    def __init__(self, model, return_layers):
        remaining = dict(return_layers)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            remaining.pop(name, None)
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = dict(return_layers)

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


class _FakeBatchEncoding(dict):
    _encodings = None

    def to(self, *a, **k):
        return self

    @property
    def attention_mask(self):
        return self["attention_mask"]


class _FakeHFTokenizer:
    """Deterministic tokenizer shared with our pipeline (HashTokenizer)."""

    def __init__(self, vocab=VOCAB):
        self.tok = HashTokenizer(vocab)

    def batch_encode_plus(self, texts, padding=None, return_tensors=None):
        ids_list = [self.tok.encode(t) for t in texts]
        n = max(len(i) for i in ids_list)
        input_ids = torch.ones(len(texts), n, dtype=torch.long)  # pad id 1
        attn = torch.zeros(len(texts), n, dtype=torch.long)
        for i, ids in enumerate(ids_list):
            input_ids[i, : len(ids)] = torch.tensor(ids)
            attn[i, : len(ids)] = 1
        be = _FakeBatchEncoding()
        be._encodings = [None] * len(texts)
        be["input_ids"] = input_ids
        be["attention_mask"] = attn
        return be


def _install_reference_stubs():
    from tests.test_full_transformer_parity import _ensure_stubs

    _ensure_stubs()
    tv = sys.modules["torchvision"]
    tv.models._utils.IntermediateLayerGetter = _ILG
    tv.models.resnet14 = lambda **kw: _TinyResNet(**kw)
    # earlier test modules may have imported the reference models.backbone
    # already, binding the placeholder ILG via from-import — patch it there
    if "models.backbone" in sys.modules:
        sys.modules["models.backbone"].IntermediateLayerGetter = _ILG
    if REF not in sys.path:
        sys.path.insert(0, REF)


def build_reference_model(fast: bool, dilation: bool = False):
    _install_reference_stubs()
    import types

    import models.transformer as ref_tr
    from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

    tiny = HFConfig(
        vocab_size=VOCAB,
        hidden_size=TEXT_DIM,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=20,
        type_vocab_size=1,
        pad_token_id=1,
    )
    orig_tok, orig_model = ref_tr.RobertaTokenizerFast, ref_tr.RobertaModel
    ref_tr.RobertaTokenizerFast = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: _FakeHFTokenizer()
    )
    ref_tr.RobertaModel = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: HFModel(tiny, add_pooling_layer=False)
    )
    try:
        from models.backbone import Backbone, Joiner
        from models.position_encoding import PositionEmbeddingSine
        from models.tubedetr import TubeDETR

        torch.manual_seed(0)
        backbone = Backbone("resnet14", train_backbone=True,
                            return_interm_layers=False, dilation=dilation)
        joiner = Joiner(backbone, PositionEmbeddingSine(D // 2, normalize=True))
        joiner.num_channels = backbone.num_channels
        transformer = ref_tr.Transformer(
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
            fast=fast,
            fast_mode="",
            learn_time_embed=False,
            rd_init_tsa=False,
            no_time_embed=False,
        )
        model = TubeDETR(
            joiner,
            transformer,
            num_queries=1,
            aux_loss=True,
            video_max_len=T,
            stride=STRIDE,
            guided_attn=True,
            fast=fast,
            fast_mode="",
            sted=True,
        ).eval()
        # randomize the zero-init fast/residual weights so the aggregation
        # path is non-trivially exercised
        with torch.no_grad():
            g = torch.Generator().manual_seed(7)
            for n_, p in model.named_parameters():
                if "fast" in n_:
                    p.uniform_(-0.3, 0.3, generator=g)
    finally:
        ref_tr.RobertaTokenizerFast = orig_tok
        ref_tr.RobertaModel = orig_model
    return model


def tiny_cfg(fast: bool, dilation: bool = False) -> TubeDETRConfig:
    return TubeDETRConfig(
        backbone="resnet14",
        dilation=dilation,
        hidden_dim=D,
        nheads=HEADS,
        enc_layers=ENC_L,
        dec_layers=DEC_L,
        dim_feedforward=FFN,
        video_max_len=T,
        video_max_len_train=T,
        stride=STRIDE,
        resolution=128,
        max_text_len=12,
        text_vocab_size=VOCAB,
        text_hidden_size=TEXT_DIM,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=20,
        fast=fast,
        guided_attn=True,
        sted=True,
        aux_loss=True,
        dropout=0.0,
        compute_dtype="float32",
    )


def _reference_forward(model, frames_np, durations, captions, fast: bool):
    """Run the two-phase reference forward on per-video pixel clips.

    frames_np: list of (dur, H, W, 3) float32 arrays (one per video).
    Returns dict of numpy outputs.
    """
    sys.path.insert(0, REF) if REF not in sys.path else None
    from util.misc import NestedTensor

    clips = [
        torch.from_numpy(f.transpose(3, 0, 1, 2)).float() for f in frames_np
    ]  # CTHW per video
    slow = [c[:, ::STRIDE] for c in clips]
    samples = NestedTensor.from_tensor_list(slow)
    samples_fast = NestedTensor.from_tensor_list(clips) if fast else None
    with torch.no_grad():
        cache = model(
            samples, durations, captions, encode_and_save=True,
            samples_fast=samples_fast,
        )
        out = model(
            samples, durations, captions, encode_and_save=False,
            memory_cache=cache,
        )
    b, t = len(durations), max(durations)
    return {
        "pred_boxes": out["pred_boxes"].numpy().reshape(b, t, 4),
        "pred_sted": out["pred_sted"].numpy(),
        "weights": out["weights"].numpy(),
        "ca_weights": out["ca_weights"].numpy(),
        "aux_pred_boxes": np.stack(
            [a["pred_boxes"].numpy().reshape(b, t, 4) for a in out["aux_outputs"]]
        ),
        "aux_pred_sted": np.stack(
            [a["pred_sted"].numpy() for a in out["aux_outputs"]]
        ),
    }


def _our_batch(cfg, frames_np, durations, captions):
    """Static-shaped batch equivalent of the reference collate."""
    b = len(durations)
    t = cfg.video_max_len_train
    tc = cfg.n_clips
    h, w = frames_np[0].shape[1:3]
    tok = HashTokenizer(VOCAB)
    frames_fast = np.zeros((b, t, h, w, 3), np.float32)
    fast_pad = np.ones((b, t, h, w), bool)
    frames_slow = np.zeros((b, tc, h, w, 3), np.float32)
    slow_pad = np.ones((b, tc, h, w), bool)
    tokens = np.ones((b, cfg.max_text_len), np.int64)
    text_pad = np.ones((b, cfg.max_text_len), bool)
    for i, (f, dur) in enumerate(zip(frames_np, durations)):
        frames_fast[i, :dur] = f
        fast_pad[i, :dur] = False
        s = f[::STRIDE]
        frames_slow[i, : len(s)] = s
        slow_pad[i, : len(s)] = False
        ids = tok.encode(captions[i])
        tokens[i, : len(ids)] = ids
        text_pad[i, : len(ids)] = False
    batch = dict(
        frames_slow=frames_slow,
        slow_pad_mask=slow_pad,
        tokens=tokens.astype(np.int32),
        text_pad_mask=text_pad,
        durations=np.asarray(durations, np.int32),
    )
    if cfg.fast:
        batch["frames_fast"] = frames_fast
        batch["fast_pad_mask"] = fast_pad
    return batch


@pytest.mark.parametrize(
    "fast,durations,dilation",
    [
        (True, [5], False),
        (False, [5], False),
        (True, [T], False),
        (True, [T], True),
    ],
    ids=["fast-ragged-tailclip", "noslow-ragged", "fast-full", "fast-dc5"],
)
def test_full_model_logit_parity_through_load(tmp_path, fast, durations,
                                              dilation):
    ref = build_reference_model(fast, dilation)
    rng = np.random.RandomState(3)
    frames_np = [
        rng.randn(dur, RES, RES, 3).astype(np.float32) * 0.5
        for dur in durations
    ]
    captions = ["a man riding a horse"][: len(durations)]

    ref_out = _reference_forward(ref, frames_np, durations, captions, fast)

    # ---- save the reference-format .pth (main.py:677-686 payload); the
    # 'model' dict is perturbed so the test proves the EMA dict is preferred
    sd = ref.state_dict()
    perturbed = {k: v + 1.0 for k, v in sd.items()}
    ckpt_path = str(tmp_path / "checkpoint.pth")
    torch.save(
        {"model": perturbed, "model_ema": sd, "epoch": 3, "args": {}},
        ckpt_path,
    )

    # ---- ours through --load -------------------------------------------
    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into

    cfg = tiny_cfg(fast, dilation)
    model = build_model(cfg)
    batch = _our_batch(cfg, frames_np, durations, captions)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    variables, report = load_torch_checkpoint_into(variables, ckpt_path, cfg)
    assert not report.get("missing"), report

    out = model.apply(variables, **batch)
    out = {k: np.asarray(v) for k, v in out.items()}

    b, t = len(durations), max(durations)
    atol = 2e-4  # fp32; accumulated over a 14-layer conv trunk + transformer
    np.testing.assert_allclose(
        out["pred_boxes"][:, :t], ref_out["pred_boxes"], atol=atol
    )
    np.testing.assert_allclose(
        out["pred_sted"][:, :t], ref_out["pred_sted"], atol=atol
    )
    np.testing.assert_allclose(
        out["aux_pred_boxes"][:, :, :t], ref_out["aux_pred_boxes"], atol=atol
    )
    np.testing.assert_allclose(
        out["aux_pred_sted"][:, :, :t], ref_out["aux_pred_sted"], atol=atol
    )
    # decoder TSA weights over the valid (t x t) block
    np.testing.assert_allclose(
        out["weights"][:, :t, :t], ref_out["weights"][:, :t, :t], atol=atol
    )
    # time-aligned cross-attn weights for the valid frames: ours is
    # statically padded on the text axis (HW + max_text_len); the reference
    # is ragged (HW + n_real_tokens) — compare the real token span, and the
    # padded tail must carry zero attention
    n = ref_out["ca_weights"].shape[-1]
    ref_ca = ref_out["ca_weights"].reshape(b, t, n)
    np.testing.assert_allclose(out["ca_weights"][:, :t, :n], ref_ca, atol=atol)
    np.testing.assert_allclose(
        out["ca_weights"][:, :t, n:], 0.0, atol=1e-7
    )


def test_full_model_int8_close_to_reference(tmp_path):
    """The int8_static path on converted reference weights stays close to
    the torch reference forward — the quantization-error budget for the
    vIoU-parity north star (BASELINE.md), validated at the logit level:
    boxes are sigmoid outputs in [0,1], so the bound is absolute."""
    fast = True
    durations = [T]
    ref = build_reference_model(fast, False)
    rng = np.random.RandomState(7)
    frames_np = [rng.randn(T, RES, RES, 3).astype(np.float32) * 0.5]
    captions = ["a man riding a horse"]
    ref_out = _reference_forward(ref, frames_np, durations, captions, fast)

    ckpt_path = str(tmp_path / "checkpoint.pth")
    torch.save({"model_ema": ref.state_dict(), "epoch": 0, "args": {}},
               ckpt_path)

    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into

    cfg = tiny_cfg(fast, False).replace(backbone_quant="int8_static")
    model = build_model(cfg)
    batch = _our_batch(cfg, frames_np, durations, captions)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    variables, report = load_torch_checkpoint_into(variables, ckpt_path, cfg)
    assert not report.get("missing"), report

    # PTQ calibration on the same input (the serving flow)
    calib = build_model(cfg.replace(backbone_quant="int8"))
    _, upd = calib.apply(variables, **batch, mutable=["qscales"])
    variables = {**variables, "qscales": upd["qscales"]}

    out = model.apply(variables, **batch)
    boxes = np.asarray(out["pred_boxes"])[:, :T]
    diff = np.abs(boxes - ref_out["pred_boxes"])
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 0.01, diff.mean()
