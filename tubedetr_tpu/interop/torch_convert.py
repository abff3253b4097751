"""PyTorch -> JAX checkpoint conversion.

Maps a reference TubeDETR ``state_dict`` (torch tensor names, OIHW convs,
packed MHA projections) onto this framework's Flax variable tree, so released
reference checkpoints load and reproduce published numbers
(SURVEY.md §5.4; load-surgery semantics of /root/reference/main.py:520-547).

Key layout rules:
* ``nn.Linear.weight`` (out, in)            -> Dense kernel (in, out): transpose
* ``nn.Conv2d.weight`` (O, I, kH, kW)       -> Conv kernel (kH, kW, I, O)
* ``nn.MultiheadAttention.in_proj_weight``  (3D, D) packed q|k|v -> split into
  three Dense kernels (+ matching bias split)
* FrozenBatchNorm buffers map 1:1 into the ``buffers`` collection
* ``nn.Embedding.weight``                   -> Embed ``embedding`` (no transpose)

The warm-start surgery (``--load``) is implemented in
``tubedetr_tpu/train/checkpoint.py``: query-embed truncation, time-embed
buffer deletion, EMA-dict preference, non-strict load.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (works on CPU tensors and numpy arrays)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def split_in_proj(sd: Dict[str, np.ndarray], prefix: str):
    """Split a torch MHA's packed in_proj into q/k/v kernels+biases."""
    prefix = f"{prefix}." if prefix else ""
    w = _t(sd[f"{prefix}in_proj_weight"])  # (3D, D)
    b = _t(sd[f"{prefix}in_proj_bias"])  # (3D,)
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * d : (i + 1) * d].T,  # (D, D) in->out
            "bias": b[i * d : (i + 1) * d],
        }
    out["out_proj"] = {
        "kernel": _t(sd[f"{prefix}out_proj.weight"]).T,
        "bias": _t(sd[f"{prefix}out_proj.bias"]),
    }
    return out


def linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T, "bias": _t(sd[f"{name}.bias"])}


def layernorm(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def conv(sd, name, bias=False):
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def frozen_bn(sd, name):
    return {
        "weight": _t(sd[f"{name}.weight"]),
        "bias": _t(sd[f"{name}.bias"]),
        "running_mean": _t(sd[f"{name}.running_mean"]),
        "running_var": _t(sd[f"{name}.running_var"]),
    }


def embedding(sd, name):
    return {"embedding": _t(sd[f"{name}.weight"])}


# ---------------------------------------------------------------------------
# component converters
# ---------------------------------------------------------------------------


def _stack_trees(trees):
    """Stack a list of identical-structure numpy trees along a new axis 0."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_resnet(
    sd: Dict, prefix: str = "", scan_blocks: bool = True
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params, buffers) trees for
    ``tubedetr_tpu.models.resnet.ResNet``.

    ``prefix`` strips e.g. ``backbone.0.body.`` from reference checkpoints.
    With ``scan_blocks`` (the model default) the stride-1 tail blocks of each
    stage stack along a leading axis under ``layer{i}_rest/block`` to match
    the lax.scan layout.

    Handles both norm flavours: FrozenBatchNorm checkpoints (running stats
    present; the four raw buffers land in the ``buffers`` collection) and
    ``resnet*-gn`` GroupNorm checkpoints
    (/root/reference/models/backbone.py:132-161: same module names, but
    ``bn*`` are GroupNorm32 layers whose weight/bias are TRAINABLE params —
    mapped into the params collection as GroupNorm scale/bias).
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    is_gn = "bn1.running_mean" not in sd

    def norm_tree(name):
        if is_gn:
            return {"scale": _t(sd[f"{name}.weight"]),
                    "bias": _t(sd[f"{name}.bias"])}
        return frozen_bn(sd, name)

    params: Dict = {"conv1": conv(sd, "conv1")}
    buffers: Dict = {}
    if is_gn:
        params["bn1"] = norm_tree("bn1")
    else:
        buffers["bn1"] = norm_tree("bn1")
    n_blocks_per_layer: Dict[int, int] = {}
    for k in sd:
        m = re.match(r"layer(\d+)\.(\d+)\.", k)
        if m:
            li, bi = int(m.group(1)), int(m.group(2))
            n_blocks_per_layer[li] = max(n_blocks_per_layer.get(li, 0), bi + 1)

    def block_trees(src):
        p = {
            "conv1": conv(sd, f"{src}.conv1"),
            "conv2": conv(sd, f"{src}.conv2"),
            "conv3": conv(sd, f"{src}.conv3"),
        }
        b = {
            "bn1": norm_tree(f"{src}.bn1"),
            "bn2": norm_tree(f"{src}.bn2"),
            "bn3": norm_tree(f"{src}.bn3"),
        }
        if f"{src}.downsample.0.weight" in sd:
            p["downsample_conv"] = conv(sd, f"{src}.downsample.0")
            b["downsample_bn"] = norm_tree(f"{src}.downsample.1")
        if is_gn:  # GroupNorm scale/bias are params, not buffers
            p.update(b)
            b = {}
        return p, b

    for li, nb in sorted(n_blocks_per_layer.items()):
        p0, b0 = block_trees(f"layer{li}.0")
        params[f"layer{li}_0"] = p0
        if b0:
            buffers[f"layer{li}_0"] = b0
        if nb <= 1:
            continue
        tails = [block_trees(f"layer{li}.{bi}") for bi in range(1, nb)]
        if scan_blocks:
            params[f"layer{li}_rest"] = {
                "block": _stack_trees([t[0] for t in tails])
            }
            if tails[0][1]:
                buffers[f"layer{li}_rest"] = {
                    "block": _stack_trees([t[1] for t in tails])
                }
        else:
            for bi, (tp, tb) in enumerate(tails, start=1):
                params[f"layer{li}_{bi}"] = tp
                if tb:
                    buffers[f"layer{li}_{bi}"] = tb
    return params, buffers


def convert_timm_efficientnet(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """timm EfficientNet state_dict (conv_stem/bn1/blocks.{s}.{b}.*) ->
    (params, buffers) for ``tubedetr_tpu.models.efficientnet.EfficientNet``.

    BatchNorms land in the buffers collection (the reference freezes them
    via replace_bn, /root/reference/models/backbone.py:163-175,199-200).
    Depthwise conv weights (C,1,k,k) transpose to HWIO (k,k,1,C) like any
    other conv. classifier/conv_head keys (absent in features_only trunks)
    are ignored.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {"conv_stem": conv(sd, "conv_stem")}
    buffers: Dict = {"bn1": frozen_bn(sd, "bn1")}
    blocks = set()
    for k in sd:
        m = re.match(r"blocks\.(\d+)\.(\d+)\.", k)
        if m:
            blocks.add((int(m.group(1)), int(m.group(2))))
    for si, bi in sorted(blocks):
        src = f"blocks.{si}.{bi}"
        name = f"blocks_{si}_{bi}"
        p: Dict = {
            "conv_dw": conv(sd, f"{src}.conv_dw"),
            "se": {
                "conv_reduce": {
                    "kernel": _t(sd[f"{src}.se.conv_reduce.weight"]).transpose(2, 3, 1, 0),
                    "bias": _t(sd[f"{src}.se.conv_reduce.bias"]),
                },
                "conv_expand": {
                    "kernel": _t(sd[f"{src}.se.conv_expand.weight"]).transpose(2, 3, 1, 0),
                    "bias": _t(sd[f"{src}.se.conv_expand.bias"]),
                },
            },
        }
        b: Dict = {
            "bn1": frozen_bn(sd, f"{src}.bn1"),
            "bn2": frozen_bn(sd, f"{src}.bn2"),
        }
        if f"{src}.conv_pwl.weight" in sd:  # InvertedResidual
            p["conv_pw"] = conv(sd, f"{src}.conv_pw")
            p["conv_pwl"] = conv(sd, f"{src}.conv_pwl")
            b["bn3"] = frozen_bn(sd, f"{src}.bn3")
        else:  # DepthwiseSeparable
            p["conv_pw"] = conv(sd, f"{src}.conv_pw")
        params[name] = p
        buffers[name] = b
    return params, buffers


def convert_timm_regnet(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """timm RegNetX/Y state_dict (stem.conv/s{i}.b{j}.conv{1,2,3}.{conv,bn},
    se.fc{1,2}, downsample.{conv,bn}; timm==0.4.12 layout) -> (params,
    buffers) for ``tubedetr_tpu.models.regnet.RegNet``. BatchNorms land in
    the buffers collection (reference replace_bn,
    /root/reference/models/backbone.py:163-175,199-200); head/classifier
    keys (absent in features_only trunks) are ignored."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {"stem_conv": conv(sd, "stem.conv")}
    buffers: Dict = {"stem_bn": frozen_bn(sd, "stem.bn")}
    blocks = set()
    for k in sd:
        m = re.match(r"s(\d+)\.b(\d+)\.", k)
        if m:
            blocks.add((int(m.group(1)), int(m.group(2))))
    for si, bi in sorted(blocks):
        src = f"s{si}.b{bi}"
        name = f"s{si}_b{bi}"
        p: Dict = {
            "conv1_conv": conv(sd, f"{src}.conv1.conv"),
            "conv2_conv": conv(sd, f"{src}.conv2.conv"),
            "conv3_conv": conv(sd, f"{src}.conv3.conv"),
        }
        b: Dict = {
            "conv1_bn": frozen_bn(sd, f"{src}.conv1.bn"),
            "conv2_bn": frozen_bn(sd, f"{src}.conv2.bn"),
            "conv3_bn": frozen_bn(sd, f"{src}.conv3.bn"),
        }
        if f"{src}.se.fc1.weight" in sd:  # RegNetY
            p["se"] = {
                "fc1": conv(sd, f"{src}.se.fc1", bias=True),
                "fc2": conv(sd, f"{src}.se.fc2", bias=True),
            }
        if f"{src}.downsample.conv.weight" in sd:
            p["downsample_conv"] = conv(sd, f"{src}.downsample.conv")
            b["downsample_bn"] = frozen_bn(sd, f"{src}.downsample.bn")
        params[name] = p
        buffers[name] = b
    return params, buffers


def convert_timm_convnext(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """timm ConvNeXt state_dict (stem.{0,1}, stages.{i}.downsample.{0,1},
    stages.{i}.blocks.{j}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}; timm >= 0.5
    layout) -> (params, buffers) for ``tubedetr_tpu.models.convnext.
    ConvNeXt``. ConvNeXt has no BatchNorm, so the buffers collection is
    EMPTY — every LayerNorm is a trainable param (the reference's
    ``replace_bn`` freezes only BN, /root/reference/models/backbone.py:
    163-175, so ConvNeXt norms train under lr_backbone there too).
    Head/classifier keys (absent in features_only trunks) are ignored."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {
        "stem_conv": conv(sd, "stem.0", bias=True),
        "stem_norm": layernorm(sd, "stem.1"),
    }
    blocks = set()
    for k in sd:
        m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.", k)
        if m:
            blocks.add((int(m.group(1)), int(m.group(2))))
    for si in sorted({s for s, _ in blocks}):
        if f"stages.{si}.downsample.1.weight" in sd:
            params[f"s{si}_downsample_norm"] = layernorm(
                sd, f"stages.{si}.downsample.0"
            )
            params[f"s{si}_downsample_conv"] = conv(
                sd, f"stages.{si}.downsample.1", bias=True
            )
    for si, bi in sorted(blocks):
        src = f"stages.{si}.blocks.{bi}"
        fc1 = linear(sd, f"{src}.mlp.fc1")
        fc2 = linear(sd, f"{src}.mlp.fc2")
        params[f"s{si}_b{bi}"] = {
            "conv_dw": conv(sd, f"{src}.conv_dw", bias=True),
            "norm": layernorm(sd, f"{src}.norm"),
            # torch Linear (out, in) -> our 1x1-conv kernel (1, 1, in, out)
            "mlp_fc1": {"kernel": fc1["kernel"][None, None],
                        "bias": fc1["bias"]},
            "mlp_fc2": {"kernel": fc2["kernel"][None, None],
                        "bias": fc2["bias"]},
            "gamma": _t(sd[f"{src}.gamma"]),
        }
    return params, {}


def convert_roberta(sd: Dict, prefix: str = "") -> Dict:
    """HF torch RobertaModel state_dict -> params for our ``RobertaModel``."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    p: Dict = {
        "word_embeddings": embedding(sd, "embeddings.word_embeddings"),
        "position_embeddings": embedding(sd, "embeddings.position_embeddings"),
        "token_type_embeddings": embedding(sd, "embeddings.token_type_embeddings"),
        "embeddings_norm": layernorm(sd, "embeddings.LayerNorm"),
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        base = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "q_proj": linear(sd, f"{base}.attention.self.query"),
                "k_proj": linear(sd, f"{base}.attention.self.key"),
                "v_proj": linear(sd, f"{base}.attention.self.value"),
                "out_proj": linear(sd, f"{base}.attention.output.dense"),
            },
            "attention_norm": layernorm(sd, f"{base}.attention.output.LayerNorm"),
            "intermediate": linear(sd, f"{base}.intermediate.dense"),
            "output": linear(sd, f"{base}.output.dense"),
            "output_norm": layernorm(sd, f"{base}.output.LayerNorm"),
        }
        i += 1
    return p


def _mlp(sd, name, n_layers):
    return {
        f"layers_{i}": linear(sd, f"{name}.layers.{i}") for i in range(n_layers)
    }


def _encoder_layer(sd, name):
    return {
        "self_attn": split_in_proj(sd, f"{name}.self_attn"),
        "linear1": linear(sd, f"{name}.linear1"),
        "linear2": linear(sd, f"{name}.linear2"),
        "norm1": layernorm(sd, f"{name}.norm1"),
        "norm2": layernorm(sd, f"{name}.norm2"),
    }


def _decoder_layer(sd, name):
    return {
        "self_attn": split_in_proj(sd, f"{name}.self_attn"),
        "cross_attn_image": split_in_proj(sd, f"{name}.cross_attn_image"),
        "linear1": linear(sd, f"{name}.linear1"),
        "linear2": linear(sd, f"{name}.linear2"),
        "norm1": layernorm(sd, f"{name}.norm1"),
        "norm3": layernorm(sd, f"{name}.norm3"),
        "norm4": layernorm(sd, f"{name}.norm4"),
    }


def convert_tubedetr(state_dict: Dict, cfg) -> Tuple[Dict, Dict]:
    """Full reference TubeDETR state_dict -> (params, buffers) variable trees.

    Accepts the raw reference checkpoint dict names
    (/root/reference/models/*.py module paths). Unknown extra keys are
    ignored (non-strict semantics of /root/reference/main.py:543).
    """
    sd = {k: v for k, v in state_dict.items()}

    if "backbone.0.body.conv_stem.weight" in sd:  # timm EfficientNet trunk
        backbone_params, backbone_buffers = convert_timm_efficientnet(
            sd, "backbone.0.body."
        )
    elif "backbone.0.body.stem.conv.weight" in sd:  # timm RegNet trunk
        backbone_params, backbone_buffers = convert_timm_regnet(
            sd, "backbone.0.body."
        )
    elif "backbone.0.body.stem.0.weight" in sd:  # timm ConvNeXt trunk
        backbone_params, backbone_buffers = convert_timm_convnext(
            sd, "backbone.0.body."
        )
    else:
        backbone_params, backbone_buffers = convert_resnet(
            sd, "backbone.0.body."
        )
    roberta = convert_roberta(sd, "transformer.text_encoder.")

    tr: Dict = {"resizer": {
        "fc": linear(sd, "transformer.resizer.fc"),
        "layer_norm": layernorm(sd, "transformer.resizer.layer_norm"),
    }}
    # encoder
    enc = {}
    i = 0
    while f"transformer.encoder.layers.{i}.self_attn.in_proj_weight" in sd:
        enc[f"layer_{i}"] = _encoder_layer(sd, f"transformer.encoder.layers.{i}")
        i += 1
    if enc:
        tr["encoder"] = enc
    # decoder
    dec = {}
    i = 0
    while f"transformer.decoder.layers.{i}.self_attn.in_proj_weight" in sd:
        dec[f"layer_{i}"] = _decoder_layer(sd, f"transformer.decoder.layers.{i}")
        i += 1
    dec["norm"] = layernorm(sd, "transformer.decoder.norm")
    tr["decoder"] = dec
    # learned time embed (sine buffer is regenerated, never loaded — the
    # reference deletes it on load, /root/reference/main.py:538-541)
    if "transformer.time_embed.time_embed.weight" in sd:
        tr["time_embed"] = _t(sd["transformer.time_embed.time_embed.weight"])
    # fast branch
    if "transformer.fast_encoder.weight" in sd:  # linear variants
        tr["fast_encoder"] = linear(sd, "transformer.fast_encoder")
    elif "transformer.fast_encoder.layers.0.self_attn.in_proj_weight" in sd:
        tr["fast_encoder"] = {
            "layer_0": _encoder_layer(sd, "transformer.fast_encoder.layers.0"),
            "norm": layernorm(sd, "transformer.fast_encoder.norm"),
        }
    if "transformer.fast_residual.weight" in sd:
        tr["fast_residual"] = linear(sd, "transformer.fast_residual")

    params: Dict = {
        "backbone": backbone_params,
        "text_encoder": roberta,
        "transformer": tr,
        "input_proj": {
            # 1x1 Conv2d (D, 2048, 1, 1) -> Dense kernel (2048, D)
            "kernel": _t(sd["input_proj.weight"])[:, :, 0, 0].T,
            "bias": _t(sd["input_proj.bias"]),
        },
        "query_embed": _t(sd["query_embed.weight"]),
        "bbox_embed": _mlp(sd, "bbox_embed", 3),
    }
    if "sted_embed.layers.0.weight" in sd:
        params["sted_embed"] = _mlp(sd, "sted_embed", 2)
    buffers = {"backbone": backbone_buffers}
    return params, buffers
