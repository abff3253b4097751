"""Full-scale reference-checkpoint conversion rehearsal (VERDICT r2 #2).

The north-star accuracy check (BASELINE.md: vIoU within 0.3 pts loading
converted reference weights) needs a released 3.0 GB ``.pth`` this
zero-egress environment cannot download. Everything else is rehearsable —
and scale-dependent failures (memory, host staging time, name-map misses on
the full ResNet-101/RoBERTa tree) only show at real size. This script:

1. fabricates a REAL-SIZE reference checkpoint: the actual reference model
   code (/root/reference/models/*.py, imported with torchvision stubs whose
   resnet101 follows torchvision's Bottleneck/_make_layer semantics
   exactly) at full dims — ResNet-101 + RoBERTa-base (12L/768) + 6+6 d256
   transformer, ~185M params — saved in the reference payload format
   {model, model_ema, optimizer, epoch, args} (/root/reference/main.py:677-686),
   ~3 GB on disk like the released checkpoints (README.md:88-94);
2. audits the conversion: every checkpoint key must be consumed by
   ``convert_tubedetr`` (except the documented surgery deletions) and every
   one of our param/buffer leaves must be filled (zero missing);
3. asserts logit parity of the full torch reference forward vs our
   converted one-program forward at one real shape;
4. optionally (--cli) runs the actual ``--load`` + ``--eval`` CLI on the
   synthetic dataset — the exact command a user would run;
5. prints wall-time + peak-RSS so host costs at 3 GB scale are known.

With ``--ckpt PATH`` it validates a real checkpoint instead of fabricating
(step 3 then compares against the stub-torchvision forward, which is
semantics-identical to torchvision's). The day a real checkpoint is
reachable, the vIoU north-star check is:

    python scripts/validate_reference_ckpt.py --ckpt checkpoint.pth --cli

Run under the CPU env:
    env -u PALLAS_AXON_POOL_IPS _TUBEDETR_TEST_REEXEC=1 JAX_PLATFORMS=cpu \\
        python scripts/validate_reference_ckpt.py
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-scale dims (the published configuration, /root/reference/main.py:32-337)
D, HEADS, FFN = 256, 8, 2048
ENC_L, DEC_L = 6, 6
VOCAB = 50265
TEXT_DIM, TEXT_L, TEXT_HEADS, TEXT_FFN = 768, 12, 12, 3072
# one real shape for the parity forward: model at FULL scale, short clip so
# the CPU forward stays minutes not hours
T, STRIDE, RES = 8, 4, 224


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def build_reference_model_fullscale():
    """The reference TubeDETR at published scale, via the reference code."""
    import types

    import torch

    from tests.test_full_model_parity import (
        _Bottleneck,
        _FakeHFTokenizer,
        _ILG,
        _install_reference_stubs,
    )

    _install_reference_stubs()
    from torch import nn

    class _ResNet(nn.Module):
        """torchvision-semantics ResNet with arbitrary stage depths
        (generalizes the test's resnet14; naming and the previous-dilation
        rule match torchvision so checkpoint keys are layout-identical)."""

        def __init__(self, layers, replace_stride_with_dilation=None,
                     norm_layer=None, **_ignored):
            super().__init__()
            rswd = replace_stride_with_dilation or [False, False, False]
            self.inplanes, self.dilation = 64, 1
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0], 1, False, norm_layer)
            self.layer2 = self._make_layer(128, layers[1], 2, rswd[0], norm_layer)
            self.layer3 = self._make_layer(256, layers[2], 2, rswd[1], norm_layer)
            self.layer4 = self._make_layer(512, layers[3], 2, rswd[2], norm_layer)

        def _make_layer(self, planes, blocks, stride, dilate, norm_layer):
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    norm_layer(planes * 4),
                )
            out = [
                _Bottleneck(self.inplanes, planes, stride, downsample,
                            dilation=previous_dilation, norm_layer=norm_layer)
            ]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                out.append(
                    _Bottleneck(self.inplanes, planes,
                                dilation=self.dilation, norm_layer=norm_layer)
                )
            return nn.Sequential(*out)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    tv = sys.modules["torchvision"]
    tv.models.resnet101 = lambda **kw: _ResNet([3, 4, 23, 3], **kw)
    tv.models._utils.IntermediateLayerGetter = _ILG

    import models.transformer as ref_tr
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel as HFModel

    base = HFConfig(
        vocab_size=VOCAB,
        hidden_size=TEXT_DIM,
        num_hidden_layers=TEXT_L,
        num_attention_heads=TEXT_HEADS,
        intermediate_size=TEXT_FFN,
        max_position_embeddings=514,
        type_vocab_size=1,
        pad_token_id=1,
    )
    orig_tok, orig_model = ref_tr.RobertaTokenizerFast, ref_tr.RobertaModel
    ref_tr.RobertaTokenizerFast = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: _FakeHFTokenizer(VOCAB)
    )
    ref_tr.RobertaModel = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: HFModel(base, add_pooling_layer=False)
    )
    try:
        from models.backbone import Backbone, Joiner
        from models.position_encoding import PositionEmbeddingSine
        from models.tubedetr import TubeDETR

        torch.manual_seed(0)
        backbone = Backbone("resnet101", train_backbone=True,
                            return_interm_layers=False, dilation=False)
        joiner = Joiner(backbone, PositionEmbeddingSine(D // 2, normalize=True))
        joiner.num_channels = backbone.num_channels
        transformer = ref_tr.Transformer(
            d_model=D, nhead=HEADS,
            num_encoder_layers=ENC_L, num_decoder_layers=DEC_L,
            dim_feedforward=FFN, dropout=0.0,
            return_intermediate_dec=True, pass_pos_and_query=True,
            text_encoder_type="fake", freeze_text_encoder=True,
            video_max_len=T, stride=STRIDE, no_tsa=False,
            return_weights=True, fast=True, fast_mode="",
            learn_time_embed=False, rd_init_tsa=False, no_time_embed=False,
        )
        model = TubeDETR(
            joiner, transformer, num_queries=1, aux_loss=True,
            video_max_len=T, stride=STRIDE, guided_attn=True,
            fast=True, fast_mode="", sted=True,
        ).eval()
        with torch.no_grad():
            g = torch.Generator().manual_seed(7)
            for n_, p in model.named_parameters():
                if "fast" in n_:
                    p.uniform_(-0.3, 0.3, generator=g)
    finally:
        ref_tr.RobertaTokenizerFast = orig_tok
        ref_tr.RobertaModel = orig_model
    return model


def our_cfg():
    from tubedetr_tpu.config import TubeDETRConfig

    return TubeDETRConfig(
        backbone="resnet101",
        hidden_dim=D, nheads=HEADS,
        enc_layers=ENC_L, dec_layers=DEC_L, dim_feedforward=FFN,
        video_max_len=T, video_max_len_train=T, stride=STRIDE,
        resolution=RES, max_text_len=12,
        text_vocab_size=VOCAB, text_hidden_size=TEXT_DIM,
        text_layers=TEXT_L, text_heads=TEXT_HEADS, text_ffn=TEXT_FFN,
        text_max_positions=514,
        fast=True, guided_attn=True, sted=True, aux_loss=True,
        dropout=0.0, compute_dtype="float32",
    )


def fabricate_checkpoint(model, path: str, with_optimizer: bool = True):
    """Reference payload (/root/reference/main.py:677-686) at release size:
    perturbed 'model' + true 'model_ema' (proves EMA preference), AdamW
    moment tensors sized like the real optimizer state."""
    import torch

    sd = model.state_dict()
    payload = {
        "model": {k: v + 1.0 for k, v in sd.items()},  # must NOT be used
        "model_ema": sd,
        "epoch": 9,
        "args": {"note": "fabricated full-scale rehearsal checkpoint"},
    }
    if with_optimizer:
        state = {}
        for i, (k, v) in enumerate(sd.items()):
            if v.dtype.is_floating_point:
                state[i] = {
                    "step": 1000,
                    "exp_avg": torch.zeros_like(v),
                    "exp_avg_sq": torch.zeros_like(v),
                }
        payload["optimizer"] = {"state": state, "param_groups": []}
    torch.save(payload, path)
    return os.path.getsize(path) / 2**30  # GiB


# keys the load surgery deletes or that carry no model state by design
EXPECTED_UNCONSUMED = (
    "transformer.time_embed.te",  # sine buffer regenerated at target length
    # (/root/reference/main.py:538-541 deletes it on load)
    "num_batches_tracked",  # torch BN bookkeeping, meaningless frozen
    "position_ids",  # HF RoBERTa registered index buffer (arange constant)
)


def audit_convert(ckpt_path: str, cfg):
    """(a) of VERDICT r2 #2: leaf-complete conversion, zero unmatched keys.

    "No checkpoint key silently dropped" is checked by element-count
    conservation: the total numel of all (non-exempt) checkpoint tensors
    must equal the total numel of the converted params+buffers trees, AND
    every leaf of our full-size variable tree must be filled by the merge.
    Together these are leaf-complete in both directions (an element-exact
    swap of two same-size tensors would still fail the per-leaf shape check
    in merge_params)."""
    import jax

    from tubedetr_tpu.interop.torch_convert import convert_tubedetr
    from tubedetr_tpu.train.checkpoint import (
        load_torch_state_dict,
        merge_params,
        warm_start_surgery,
    )

    sd = warm_start_surgery(load_torch_state_dict(ckpt_path),
                            cfg.num_queries)
    exempt = [
        k for k in sd if any(tag in k for tag in EXPECTED_UNCONSUMED)
    ]
    src_numel = sum(
        int(np.prod(tuple(v.shape)) if hasattr(v, "shape") else 0)
        for k, v in sd.items()
        if k not in exempt
    )
    params_l, buffers_l = convert_tubedetr(sd, cfg)
    conv_numel = sum(
        int(np.prod(x.shape))
        for tree in (params_l, buffers_l)
        for x in jax.tree_util.tree_leaves(tree)
    )
    unconsumed = []
    if conv_numel != src_numel:
        # locate the loss: per-top-prefix numel comparison of the source
        by_prefix = {}
        for k, v in sd.items():
            if k in exempt:
                continue
            p = k.split(".")[0]
            by_prefix[p] = by_prefix.get(p, 0) + int(np.prod(tuple(v.shape)))
        unconsumed = [
            f"element-count mismatch: ckpt {src_numel} vs converted "
            f"{conv_numel}; per-prefix src numel: {by_prefix}"
        ]

    # full-size variable tree WITHOUT running the model: eval_shape + zeros
    from tubedetr_tpu.models.tubedetr import build_model

    model = build_model(cfg)
    example = _example_batch(cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), **example)
    zeros = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    _, missing_p, used_p = merge_params(zeros["params"], params_l)
    _, missing_b, used_b = merge_params(zeros.get("buffers", {}), buffers_l)
    n_leaves = len(jax.tree_util.tree_leaves(zeros["params"])) + len(
        jax.tree_util.tree_leaves(zeros.get("buffers", {}))
    )
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(shapes["params"])
    )
    return {
        "unconsumed_ckpt_keys": unconsumed,
        "missing_param_leaves": missing_p,
        "missing_buffer_leaves": missing_b,
        "filled_leaves": len(used_p) + len(used_b),
        "total_leaves": n_leaves,
        "n_params": n_params,
    }


def _example_batch(cfg, hw: int = 64):
    t, tc = cfg.video_max_len, cfg.n_clips
    return dict(
        frames_slow=np.zeros((1, tc, hw, hw, 3), np.float32),
        slow_pad_mask=np.zeros((1, tc, hw, hw), bool),
        tokens=np.zeros((1, cfg.max_text_len), np.int32),
        text_pad_mask=np.zeros((1, cfg.max_text_len), bool),
        durations=np.full((1,), t, np.int32),
        frames_fast=np.zeros((1, t, hw, hw, 3), np.float32),
        fast_pad_mask=np.zeros((1, t, hw, hw), bool),
    )


def logit_parity(ref_model, ckpt_path: str, cfg):
    """(b): full torch forward vs our converted forward at one real shape."""
    import jax

    from tests.test_full_model_parity import _our_batch, _reference_forward
    from tubedetr_tpu.models.tokenizer import HashTokenizer
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into

    rng = np.random.RandomState(3)
    frames_np = [rng.randn(T, RES, RES, 3).astype(np.float32) * 0.5]
    durations, captions = [T], ["a man riding a horse down the street"]

    # the test helpers read their module-level tiny constants; re-point the
    # stride/vocab at the full-scale values for the duration of this run
    import tests.test_full_model_parity as fmp

    orig_tok, orig_stride = fmp.HashTokenizer, fmp.STRIDE
    fmp.HashTokenizer = lambda *_a, **_k: HashTokenizer(VOCAB)
    fmp.STRIDE = STRIDE
    try:
        t0 = time.time()
        ref_out = _reference_forward(ref_model, frames_np, durations,
                                     captions, fast=True)
        torch_s = time.time() - t0

        model = build_model(cfg)
        batch = _our_batch(cfg, frames_np, durations, captions)
    finally:
        fmp.HashTokenizer = orig_tok
        fmp.STRIDE = orig_stride

    from tubedetr_tpu.apps.pipeline import fabricate_variables

    variables = fabricate_variables(model, batch)
    t0 = time.time()
    variables, report = load_torch_checkpoint_into(variables, ckpt_path, cfg)
    load_s = time.time() - t0
    assert not report.get("missing"), report["missing"][:10]

    t0 = time.time()
    out = jax.jit(lambda v, b: model.apply(v, **b))(variables, batch)
    out = {k: np.asarray(v) for k, v in out.items()}
    ours_s = time.time() - t0

    diffs = {
        "pred_boxes": float(
            np.abs(out["pred_boxes"][:, :T] - ref_out["pred_boxes"]).max()
        ),
        "pred_sted": float(
            np.abs(out["pred_sted"][:, :T] - ref_out["pred_sted"]).max()
        ),
        "weights": float(
            np.abs(out["weights"][:, :T, :T]
                   - ref_out["weights"][:, :T, :T]).max()
        ),
    }
    return diffs, {"torch_fwd_s": torch_s, "load_convert_s": load_s,
                   "our_fwd_s": ours_s}


def run_cli_eval(ckpt_path: str, workdir: str):
    """(CLI leg): the actual --load + --eval command on synthetic data."""
    import subprocess

    cmd = [
        sys.executable, "-m", "tubedetr_tpu.apps.train",
        "--eval",
        "--combine_datasets_val", "synthetic",
        "--load", ckpt_path,
        "--backbone", "resnet101",
        "--hidden_dim", str(D), "--nheads", str(HEADS),
        "--enc_layers", str(ENC_L), "--dec_layers", str(DEC_L),
        "--dim_feedforward", str(FFN),
        "--video_max_len", str(T), "--video_max_len_train", str(T),
        "--stride", str(STRIDE), "--resolution", "96",
        "--max_text_len", "12",
        "--text_vocab_size", str(VOCAB),
        "--text_hidden_size", str(TEXT_DIM), "--text_layers", str(TEXT_L),
        "--text_heads", str(TEXT_HEADS), "--text_ffn", str(TEXT_FFN),
        "--no_guided_attn",
        "--output-dir", workdir,
        "--num_workers", "0",
    ]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_TUBEDETR_TEST_REEXEC"] = "1"
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
        raise SystemExit(f"CLI eval failed rc={proc.returncode}")
    stats_path = os.path.join(workdir, "log_stats.json")
    return {"cli_s": wall, "log_stats_exists": os.path.exists(stats_path)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="validate a real checkpoint "
                    "instead of fabricating one")
    ap.add_argument("--out", default="/tmp/ref_ckpt_rehearsal")
    ap.add_argument("--cli", action="store_true",
                    help="also run the --load/--eval CLI leg")
    ap.add_argument("--no-optimizer", action="store_true",
                    help="fabricate without optimizer state (smaller file)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    cfg = our_cfg()
    report = {}

    t0 = time.time()
    ref_model = build_reference_model_fullscale()
    n_ref = sum(p.numel() for p in ref_model.parameters())
    print(f"[rehearsal] reference model built: {n_ref/1e6:.1f}M params "
          f"({time.time()-t0:.1f}s, rss {rss_gb():.1f}G)")
    report["ref_params_m"] = round(n_ref / 1e6, 1)

    ckpt_path = args.ckpt
    if not ckpt_path:
        ckpt_path = os.path.join(args.out, "checkpoint_fullscale.pth")
        t0 = time.time()
        gib = fabricate_checkpoint(ref_model, ckpt_path,
                                   with_optimizer=not args.no_optimizer)
        print(f"[rehearsal] fabricated {gib:.2f} GiB checkpoint in "
              f"{time.time()-t0:.1f}s -> {ckpt_path}")
        report["ckpt_gib"] = round(gib, 2)

    t0 = time.time()
    audit = audit_convert(ckpt_path, cfg)
    print(f"[rehearsal] conversion audit in {time.time()-t0:.1f}s "
          f"(rss {rss_gb():.1f}G): filled {audit['filled_leaves']}/"
          f"{audit['total_leaves']} leaves, {audit['n_params']/1e6:.1f}M "
          f"params")
    if audit["unconsumed_ckpt_keys"]:
        print(f"  UNCONSUMED ckpt keys: {audit['unconsumed_ckpt_keys'][:20]}")
    if audit["missing_param_leaves"] or audit["missing_buffer_leaves"]:
        print(f"  MISSING leaves: "
              f"{(audit['missing_param_leaves']+audit['missing_buffer_leaves'])[:20]}")
    ok_audit = (
        not audit["unconsumed_ckpt_keys"]
        and not audit["missing_param_leaves"]
        and not audit["missing_buffer_leaves"]
    )
    report["audit_ok"] = ok_audit
    report["n_params_m"] = round(audit["n_params"] / 1e6, 1)

    diffs, times = logit_parity(ref_model, ckpt_path, cfg)
    print(f"[rehearsal] logit parity (T={T} res={RES}): {diffs} "
          f"(torch {times['torch_fwd_s']:.1f}s, load+convert "
          f"{times['load_convert_s']:.1f}s, ours {times['our_fwd_s']:.1f}s, "
          f"rss {rss_gb():.1f}G)")
    ok_parity = diffs["pred_boxes"] < 2e-3 and diffs["pred_sted"] < 2e-2
    report["parity_ok"] = ok_parity
    report["max_box_diff"] = diffs["pred_boxes"]
    report.update(times)

    if args.cli:
        cli = run_cli_eval(ckpt_path, os.path.join(args.out, "cli"))
        print(f"[rehearsal] CLI --load/--eval leg: {cli}")
        report["cli_ok"] = cli["log_stats_exists"]
        report["cli_s"] = round(cli["cli_s"], 1)

    report["peak_rss_gb"] = round(rss_gb(), 2)
    report["ok"] = ok_audit and ok_parity and report.get("cli_ok", True)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
