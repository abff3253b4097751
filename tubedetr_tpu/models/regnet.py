"""Timm-style RegNetX/Y feature backbone (second TimmBackbone family).

The reference's TimmBackbone accepts any timm ``features_only`` model
(/root/reference/models/backbone.py:188-217, timm==0.4.12) and freezes every
BatchNorm via ``replace_bn`` (:163-175). Like the EfficientNet family
(models/efficientnet.py), the trunk is re-implemented in Flax with timm's
exact module naming so released timm checkpoints convert 1:1
(``interop/torch_convert.convert_timm_regnet``):

* stem: ``stem.conv`` 3x3/s2 (32 ch) -> ``stem.bn`` -> ReLU;
* stages ``s1..s4`` of blocks ``b1..bN`` (timm RegNet ``Bottleneck``):
  ``conv1`` 1x1 -> BN -> ReLU, ``conv2`` 3x3 group conv (stride 2 on the
  first block of each stage) -> BN -> ReLU, optional ``se`` (RegNetY:
  fc1 -> ReLU -> fc2 -> sigmoid gate, reduction from the BLOCK INPUT
  channels), ``conv3`` 1x1 -> BN, plus a ``downsample`` conv+BN projection
  when stride/channels change; ReLU after the residual add. Each ConvBnAct
  flattens to ``convN.conv`` / ``convN.bn`` keys, exactly timm's layout.

Architectures come from the quantized linear width rule of the RegNet paper
("Designing Network Design Spaces"): ``u_j = w0 + wa * j`` snapped to the
geometric grid ``w0 * wm**s`` and rounded to multiples of 8, grouped into
stages of equal width, each width then rounded to a multiple of its group
width (bottle_ratio = 1 for every published X/Y model). ``stage_plan`` is
pinned against the paper's tables in tests/test_regnet.py.

``features_only`` trunk: TubeDETR consumes only the stride-32 (stage-4)
output (main_layer=-1), like the other backbones.
"""

from __future__ import annotations

import itertools
import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.models.efficientnet import _conv
from tubedetr_tpu.models.resnet import FrozenBatchNorm

# name -> (wa, w0, wm, depth, group_width, se_ratio)
_REGNET_CFGS = {
    "regnetx_002": (36.44, 24, 2.49, 13, 8, 0.0),
    "regnetx_004": (24.48, 24, 2.54, 22, 16, 0.0),
    "regnetx_006": (36.97, 48, 2.24, 16, 24, 0.0),
    "regnetx_008": (35.73, 56, 2.28, 16, 16, 0.0),
    "regnetx_016": (34.01, 80, 2.25, 18, 24, 0.0),
    "regnetx_032": (26.31, 88, 2.25, 25, 48, 0.0),
    "regnety_002": (36.44, 24, 2.49, 13, 8, 0.25),
    "regnety_004": (27.89, 48, 2.09, 16, 8, 0.25),
    "regnety_006": (32.54, 48, 2.32, 15, 16, 0.25),
    "regnety_008": (38.84, 56, 2.4, 14, 16, 0.25),
    "regnety_016": (20.71, 48, 2.65, 27, 24, 0.25),
    "regnety_032": (42.63, 80, 2.66, 21, 24, 0.25),
}

_STEM_CH = 32


def _generate_widths(wa: float, w0: int, wm: float, depth: int,
                     q: int = 8) -> List[int]:
    """Per-block widths from the paper's quantized linear rule."""
    widths = []
    for j in range(depth):
        u = w0 + wa * j
        e = round(math.log(u / w0) / math.log(wm))
        widths.append(int(round(w0 * wm ** e / q) * q))
    return widths


def stage_plan(name: str) -> List[Tuple[int, int, int, float]]:
    """Per-stage (width, depth, group_width, se_ratio) after group
    adjustment (bottle_ratio = 1: bottleneck width == block width)."""
    wa, w0, wm, depth, group, se = _REGNET_CFGS[name]
    widths = _generate_widths(wa, w0, wm, depth)
    plan = []
    for w, grp in itertools.groupby(widths):
        d = len(list(grp))
        gw = min(group, w)
        plan.append((int(round(w / gw) * gw), d, gw, se))
    assert len(plan) == 4, (name, plan)  # every published X/Y model: 4 stages
    return plan


def feature_channels(name: str) -> int:
    """Channels of the last (stride-32) feature level."""
    return stage_plan(name)[-1][0]


class SEModule(nn.Module):
    """timm SEModule (RegNetY): mean-pool -> fc1 -> ReLU -> fc2 -> sigmoid
    gate; fc1/fc2 are 1x1 convs with bias."""

    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = x.mean(axis=(1, 2), keepdims=True)  # (N,1,1,C)
        se = nn.Conv(self.reduced, (1, 1), use_bias=True,
                     param_dtype=jnp.float32, name="fc1")(se)
        se = nn.relu(se)
        se = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                     param_dtype=jnp.float32, name="fc2")(se)
        return x * jax.nn.sigmoid(se)


class RegNetBottleneck(nn.Module):
    """timm RegNet Bottleneck (bottle_ratio 1): 1x1 -> 3x3 group -> [SE] ->
    1x1, conv+BN shortcut projection when stride/channels change, ReLU after
    the add. ``quant``: the three block convs (and the projection) run
    through the shared ``BottleneckConv`` int8 machinery; the tiny SE fcs
    stay float, like EfficientNet's."""

    out_ch: int
    stride: int
    group_width: int
    se_reduced: int  # 0 = no SE (RegNetX)
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        groups = self.out_ch // self.group_width
        h = _conv(self.out_ch, 1, 1, name="conv1_conv", quant=self.quant,
                  dtype=self.dtype)(x)
        h = FrozenBatchNorm(self.out_ch, self.dtype, name="conv1_bn")(h)
        h = nn.relu(h)
        h = _conv(self.out_ch, 3, self.stride, groups=groups,
                  name="conv2_conv", quant=self.quant, dtype=self.dtype)(h)
        h = FrozenBatchNorm(self.out_ch, self.dtype, name="conv2_bn")(h)
        h = nn.relu(h)
        if self.se_reduced:
            h = SEModule(self.se_reduced, self.dtype, name="se")(h)
        h = _conv(self.out_ch, 1, 1, name="conv3_conv", quant=self.quant,
                  dtype=self.dtype)(h)
        h = FrozenBatchNorm(self.out_ch, self.dtype, name="conv3_bn")(h)
        shortcut = x
        if self.stride != 1 or c_in != self.out_ch:
            shortcut = _conv(self.out_ch, 1, self.stride,
                             name="downsample_conv", quant=self.quant,
                             dtype=self.dtype)(x)
            shortcut = FrozenBatchNorm(
                self.out_ch, self.dtype, name="downsample_bn"
            )(shortcut)
        return nn.relu(h + shortcut)


class RegNet(nn.Module):
    """features_only trunk returning the stride-32 (stage-4) feature map;
    module names mirror timm for checkpoint conversion.

    Interface-compatible with ``ResNet.__call__`` / ``EfficientNet.__call__``
    (quant_override for the training fast pass; no always-frozen prefix, so
    ``frozen_prefix_quant`` must stay unset; ``unroll_tail`` is a no-op —
    stages are short and heterogeneous, nothing is scanned)."""

    arch: str = "regnety_008"
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    stages: int = 4  # run only the first N stages (profiling aid, same
    #   semantics as ResNet.stages: 0 returns the stem output)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        quant_override: str | None = None,
        frozen_prefix_quant: str | None = None,
        unroll_tail: bool = False,
    ) -> jnp.ndarray:
        if frozen_prefix_quant not in (None, "none"):
            raise NotImplementedError(
                "RegNet has no always-frozen prefix; "
                "backbone_quant_frozen applies to the resnet family only"
            )
        quant = self.quant if quant_override is None else quant_override
        x = x.astype(self.dtype)
        x = _conv(_STEM_CH, 3, 2, name="stem_conv")(x)
        x = FrozenBatchNorm(_STEM_CH, self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        c_prev = _STEM_CH
        for si, (width, depth, gw, se) in enumerate(
            stage_plan(self.arch), start=1
        ):
            if si > self.stages:
                break
            for bi in range(1, depth + 1):
                # timm: SE reduction from the BLOCK INPUT channels
                se_reduced = int(round(c_prev * se)) if se else 0
                x = RegNetBottleneck(
                    width,
                    2 if bi == 1 else 1,
                    gw,
                    se_reduced,
                    self.dtype,
                    quant,
                    name=f"s{si}_b{bi}",
                )(x)
                c_prev = width
        return x
