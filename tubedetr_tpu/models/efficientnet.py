"""Timm-style EfficientNet feature backbone (the reference's TimmBackbone).

The reference wraps ``timm.create_model(name, features_only=True,
out_indices=(1,2,3,4))`` and freezes every BatchNorm
(/root/reference/models/backbone.py:188-217 + replace_bn at :163-175), then
feeds the LAST feature level to input_proj. No timm-for-JAX exists in this
image, so the trunk is re-implemented in Flax with timm's exact module
naming (conv_stem / bn1 / blocks.{stage}.{block}.conv_pw|conv_dw|se|conv_pwl)
so released timm checkpoints convert 1:1
(``interop/torch_convert.convert_timm_efficientnet``).

Architecture notes (public EfficientNet definition, non-tf timm variants —
symmetric k//2 conv padding):

* stem: 3x3/s2 conv -> BN -> SiLU;
* stage 0: DepthwiseSeparable blocks (conv_dw -> bn1 -> SiLU -> SE ->
  conv_pw -> bn2, residual when stride 1 and channels match);
* stages 1..6: InvertedResidual blocks (conv_pw expand -> bn1 -> SiLU ->
  conv_dw -> bn2 -> SiLU -> SE -> conv_pwl project -> bn3, residual when
  stride 1 and in==out);
* SE: squeeze to ``se_ratio * block input channels``, SiLU, expand, sigmoid
  gate. BatchNorms are FrozenBN buffers (reference replace_bn semantics).

``features_only`` trunk: the TubeDETR backbone needs only the stride-32
feature map (main_layer=-1), i.e. the stage-6 output (320 ch for b0).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.models.resnet import FrozenBatchNorm

# (expand_ratio, channels, repeats, stride, kernel) — the B0 baseline
_B0_STAGES: List[Tuple[int, int, int, int, int]] = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# (width_mult, depth_mult) per variant
_VARIANTS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
}


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    """timm round_channels: scale then round to the nearest multiple of 8
    (never dropping below 90%)."""
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(mult * r))


def arch_config(name: str):
    """Per-stage (expand, channels, repeats, stride, kernel) after scaling,
    plus the stem width."""
    wm, dm = _VARIANTS[name]
    stages = [
        (e, _round_channels(c, wm), _round_repeats(r, dm), s, k)
        for (e, c, r, s, k) in _B0_STAGES
    ]
    return _round_channels(32, wm), stages


def feature_channels(name: str) -> int:
    """Channels of the last (stride-32) feature level."""
    return arch_config(name)[1][-1][1]


def _conv(feats, k, s, groups=1, name=None, quant="none",
          dtype=jnp.float32, bias=False):
    """Conv (bias-free by default — the BN families fold biases into BN);
    with a quant mode it becomes the shared ``BottleneckConv`` (identical
    ``kernel``/``bias`` parameter paths and inits, so checkpoints are
    interchangeable between float and quantized runs — the same contract
    the ResNet family has). ``bias=True`` is the ConvNeXt family's convs
    (no BN anywhere, every conv carries its torch bias)."""
    if quant != "none":
        from tubedetr_tpu.models.resnet import BottleneckConv

        return BottleneckConv(
            feats,
            kernel_size=k,
            stride=s,
            groups=groups,
            quant=quant,
            use_bias=bias,
            dtype=dtype,
            name=name,
        )
    return nn.Conv(
        feats,
        (k, k),
        strides=(s, s),
        padding=[(k // 2,) * 2] * 2,
        feature_group_count=groups,
        use_bias=bias,
        param_dtype=jnp.float32,
        name=name,
    )


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: mean-pool -> conv_reduce -> SiLU -> conv_expand
    -> sigmoid gate."""

    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = x.mean(axis=(1, 2), keepdims=True)  # (N,1,1,C)
        se = nn.Conv(self.reduced, (1, 1), use_bias=True,
                     param_dtype=jnp.float32, name="conv_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                     param_dtype=jnp.float32, name="conv_expand")(se)
        return x * jax.nn.sigmoid(se)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (stage 0; expand ratio 1)."""

    out_ch: int
    stride: int
    kernel: int
    se_reduced: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = _conv(c_in, self.kernel, self.stride, groups=c_in,
                  name="conv_dw", quant=self.quant, dtype=self.dtype)(x)
        h = FrozenBatchNorm(c_in, self.dtype, name="bn1")(h)
        h = nn.silu(h)
        h = SqueezeExcite(self.se_reduced, self.dtype, name="se")(h)
        h = _conv(self.out_ch, 1, 1, name="conv_pw", quant=self.quant,
                  dtype=self.dtype)(h)
        h = FrozenBatchNorm(self.out_ch, self.dtype, name="bn2")(h)
        if self.stride == 1 and c_in == self.out_ch:
            h = h + x
        return h


class InvertedResidual(nn.Module):
    """timm InvertedResidual (MBConv)."""

    out_ch: int
    stride: int
    kernel: int
    expand: int
    se_reduced: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = c_in * self.expand
        h = _conv(mid, 1, 1, name="conv_pw", quant=self.quant,
                  dtype=self.dtype)(x)
        h = FrozenBatchNorm(mid, self.dtype, name="bn1")(h)
        h = nn.silu(h)
        h = _conv(mid, self.kernel, self.stride, groups=mid, name="conv_dw",
                  quant=self.quant, dtype=self.dtype)(h)
        h = FrozenBatchNorm(mid, self.dtype, name="bn2")(h)
        h = nn.silu(h)
        h = SqueezeExcite(self.se_reduced, self.dtype, name="se")(h)
        h = _conv(self.out_ch, 1, 1, name="conv_pwl", quant=self.quant,
                  dtype=self.dtype)(h)
        h = FrozenBatchNorm(self.out_ch, self.dtype, name="bn3")(h)
        if self.stride == 1 and c_in == self.out_ch:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """features_only trunk returning the stride-32 (last-stage) feature map;
    module names mirror timm for checkpoint conversion.

    ``quant``: int8 modes for the block convs (conv_pw / conv_dw /
    conv_pwl) via the shared ``BottleneckConv`` — dynamic ("int8"),
    calibrated static ("int8_static"), or fake-quant QAT ("int8_qat").
    The stem (3-channel conv) and the tiny SE projections stay float, like
    the ResNet stem. No residual carrier here: EfficientNet's inter-block
    maps are small (<=320 ch at stride 32), the per-conv quantize fuses
    into the producer epilogues the same way."""

    arch: str = "efficientnet_b0"
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    stages: int = 7  # run only the first N block stages (profiling aid,
    #   same semantics as ResNet.stages: 0 returns the stem output)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        quant_override: str | None = None,
        frozen_prefix_quant: str | None = None,
        unroll_tail: bool = False,
    ) -> jnp.ndarray:
        """Interface-compatible with ``ResNet.__call__``: the training fast
        pass may override the quant mode per call (parameters are shared by
        module name). EfficientNet has no always-frozen prefix (the timm
        reference freezes only BN, which is buffers here), so
        ``frozen_prefix_quant`` must stay unset; ``unroll_tail`` is a no-op
        (blocks are heterogeneous — nothing is scanned)."""
        if frozen_prefix_quant not in (None, "none"):
            raise NotImplementedError(
                "EfficientNet has no always-frozen prefix; "
                "backbone_quant_frozen applies to the resnet family only"
            )
        quant = self.quant if quant_override is None else quant_override
        stem_ch, stages = arch_config(self.arch)
        x = x.astype(self.dtype)
        x = _conv(stem_ch, 3, 2, name="conv_stem")(x)
        x = FrozenBatchNorm(stem_ch, self.dtype, name="bn1")(x)
        x = nn.silu(x)
        c_prev = stem_ch
        for si, (expand, ch, repeats, stride, kernel) in enumerate(stages):
            if si >= self.stages:
                break
            for bi in range(repeats):
                s = stride if bi == 0 else 1
                # timm se_ratio 0.25 of the BLOCK INPUT channels
                se_reduced = max(1, int(c_prev * 0.25))
                name = f"blocks_{si}_{bi}"
                if expand == 1:
                    x = DepthwiseSeparable(
                        ch, s, kernel, se_reduced, self.dtype, quant,
                        name=name,
                    )(x)
                else:
                    x = InvertedResidual(
                        ch, s, kernel, expand, se_reduced, self.dtype,
                        quant, name=name,
                    )(x)
                c_prev = ch
        return x
