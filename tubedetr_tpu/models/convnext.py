"""Timm-style ConvNeXt feature backbone (third TimmBackbone family).

The reference's TimmBackbone accepts any timm ``features_only`` model
(/root/reference/models/backbone.py:188-217) and freezes every BatchNorm via
``replace_bn`` (:163-175). ConvNeXt ("A ConvNet for the 2020s", Liu et al.
2022) exercises the adapter features the BN families cannot: it has NO
BatchNorm anywhere — ``replace_bn`` is a no-op on it, every norm is a
trainable LayerNorm that (matching the reference's semantics, which freeze
only BN) lands in the *params* collection and trains under ``lr_backbone`` —
plus biased convs, channels-last LayerNorm blocks, exact-erf GELU, a
patchify (4x4/s4, padding 0) stem, and per-block layer-scale ``gamma``.

Module naming mirrors timm's ``convnext.py`` (timm >= 0.5 layout) so
released timm checkpoints convert 1:1
(``interop/torch_convert.convert_timm_convnext``):

* ``stem.0`` 4x4/s4 conv (bias) -> ``stem.1`` LayerNorm;
* stages ``stages.{i}`` (0-based, like timm): for i >= 1 a ``downsample``
  of LayerNorm (``downsample.0``) + 2x2/s2 conv (``downsample.1``, bias,
  padding 0); then blocks ``blocks.{j}``:
  ``conv_dw`` 7x7 depthwise (bias) -> ``norm`` LayerNorm (channels-last,
  eps 1e-6) -> ``mlp.fc1`` 1x1 expand (4x) -> GELU (exact erf, torch
  nn.GELU default) -> ``mlp.fc2`` 1x1 project -> ``gamma`` layer scale ->
  residual add. Flax names flatten to ``s{i}_b{j}/{conv_dw,norm,mlp_fc1,
  mlp_fc2,gamma}`` and ``s{i}_downsample_{norm,conv}``.

Quantization: only the MLP pointwise convs route through the shared
``BottleneckConv`` int8 machinery — they are the FLOP-dominant matmuls and
the only ConvNeXt convs above the measured >=256-channel int8 win threshold
(docs/NOTES.md round 4: int8 loses on depthwise and sub-256-ch convs across
the EfficientNet/RegNet families; ConvNeXt's 7x7 depthwise and the tiny
2x2 downsamples sit squarely in that territory and stay float). Stochastic
depth is not implemented: timm's ``create_model`` default is
``drop_path_rate=0`` and the reference never sets it.

``features_only`` trunk: TubeDETR consumes only the stride-32 (stage-3)
output (main_layer=-1), like the other backbone families.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.models.efficientnet import _conv

# name -> (depths, dims) — the paper's tiny/small/base variants
_CONVNEXT_CFGS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}

_LN_EPS = 1e-6  # ConvNeXt LayerNorm eps (timm/paper)


def arch_config(name: str) -> Tuple[List[int], List[int]]:
    depths, dims = _CONVNEXT_CFGS[name]
    return list(depths), list(dims)


def feature_channels(name: str) -> int:
    """Channels of the last (stride-32) feature level."""
    return _CONVNEXT_CFGS[name][1][-1]


def _valid_conv(feats, k, s, name):
    """Bias-ful conv with padding 0 (timm's patchify stem 4x4/s4 and the
    2x2/s2 stage downsamples — torch default padding=0, NOT k//2)."""
    return nn.Conv(
        feats,
        (k, k),
        strides=(s, s),
        padding="VALID",
        use_bias=True,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvNeXtBlock(nn.Module):
    """timm ConvNeXtBlock: 7x7 depthwise (bias) -> LN -> 1x1 expand -> GELU
    -> 1x1 project -> layer-scale gamma -> residual. All shapes NHWC; the
    "permute to channels-last" dance of the torch code is a no-op here."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        h = _conv(self.dim, 7, 1, groups=self.dim, name="conv_dw",
                  dtype=self.dtype, bias=True)(x)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(h)
        h = _conv(4 * self.dim, 1, 1, name="mlp_fc1", quant=self.quant,
                  dtype=self.dtype, bias=True)(h)
        # torch nn.GELU default = exact erf (NOT jax.nn.gelu's tanh default)
        h = jax.nn.gelu(h, approximate=False)
        h = _conv(self.dim, 1, 1, name="mlp_fc2", quant=self.quant,
                  dtype=self.dtype, bias=True)(h)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(1e-6),  # timm ls_init_value
            (self.dim,),
            jnp.float32,
        )
        return x + gamma.astype(h.dtype) * h


class ConvNeXt(nn.Module):
    """features_only trunk returning the stride-32 (stage-3) feature map;
    module names mirror timm for checkpoint conversion.

    Interface-compatible with ``ResNet.__call__`` / the other timm families
    (``quant_override`` for the training fast pass; no always-frozen prefix,
    so ``frozen_prefix_quant`` must stay unset; ``unroll_tail`` is a no-op —
    blocks are unrolled)."""

    arch: str = "convnext_tiny"
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
                "ConvNeXt has no always-frozen prefix; "
                "backbone_quant_frozen applies to the resnet family only"
            )
        quant = self.quant if quant_override is None else quant_override
        depths, dims = arch_config(self.arch)
        x = x.astype(self.dtype)
        x = _valid_conv(dims[0], 4, 4, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                         param_dtype=jnp.float32, name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            if si >= self.stages:
                break
            if si > 0:
                x = nn.LayerNorm(
                    epsilon=_LN_EPS, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"s{si}_downsample_norm",
                )(x)
                x = _valid_conv(dim, 2, 2, name=f"s{si}_downsample_conv")(x)
            for bi in range(depth):
                x = ConvNeXtBlock(
                    dim, self.dtype, quant, name=f"s{si}_b{bi}"
                )(x)
        return x
