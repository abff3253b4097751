"""ResNet visual backbone with frozen batch norm, NHWC, TPU-first.

Re-implements the torchvision ResNet v1.5 bottleneck architecture used by the
reference (/root/reference/models/backbone.py:108-124) in Flax:

* FrozenBatchNorm (/root/reference/models/backbone.py:20-70): batch stats and
  affine parameters are fixed buffers; at runtime this is a per-channel
  ``x * scale + bias`` with ``scale = gamma * rsqrt(var + 1e-5)``. We keep the
  four raw buffers (weight/bias/mean/var) in a ``buffers`` collection so
  converted torch checkpoints map 1:1, and fold them into scale/bias inside
  the forward — XLA fuses this into the preceding conv.
* GroupNorm(32) variant for the ``resnet*-gn`` backbones
  (/root/reference/models/backbone.py:127-161): trainable scale/bias params.
* Stride sits on the 3x3 conv of each bottleneck (torchvision v1.5).
* ``dilation=True`` gives the DC5 variant: layer4 keeps stride 1 and dilates
  its 3x3 convs by 2 (first block keeps the pre-existing dilation of 1).
* Layout is NHWC throughout; weights convert from torch's OIHW with a
  transpose to HWIO.

Which parameters train is an optimizer-mask concern (see
``tubedetr_tpu/train/optim.py``): stem + layer1 are always frozen, layer2-4
train iff ``lr_backbone > 0`` (/root/reference/models/backbone.py:82-89).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

BN_EPS = 1e-5


def _block_cls(remat: bool, policy: str = "full"):
    """Bottleneck class under the requested remat regime.

    ``full`` (default): plain ``nn.remat`` — nothing inside the block is
    saved; the backward recomputes conv1+conv2+conv3. ``save_mid``: save the
    named ``bneck_a2`` residual (conv3's input, planes-channel) — the
    backward skips recomputing conv2 (the 3x3) and conv3 at +1/4 block-IO
    activation memory. ``save_acts``: save ``bneck_a1`` too (conv2's input)
    — no conv recompute at all, +1/2 block-IO memory. Numerics are identical
    across policies (remat only changes what is stored vs recomputed)."""
    if not remat:
        return Bottleneck
    if policy in ("", "full"):
        return nn.remat(Bottleneck)
    if policy == "save_mid":
        names = ("bneck_a2",)
    elif policy == "save_acts":
        names = ("bneck_a1", "bneck_a2")
    else:
        raise NotImplementedError(
            f"remat_policy {policy!r}; expected full|save_mid|save_acts"
        )
    return nn.remat(
        Bottleneck,
        policy=jax.checkpoint_policies.save_only_these_names(*names),
    )

STAGE_BLOCKS = {
    "resnet14": (1, 1, 1, 1),  # tiny test arch (not in torchvision)
    "resnet26": (2, 2, 2, 2),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def parse_backbone_name(name: str):
    """'resnet101' -> ('resnet101', 'frozen_bn'); 'resnet101-gn' -> (..., 'gn')."""
    if name.endswith("-gn"):
        return name[:-3], "gn"
    return name, "frozen_bn"


class FrozenBatchNorm(nn.Module):
    """Fixed-statistics batch norm: y = x * scale + bias (channels-last)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        weight = self.variable("buffers", "weight", ones, None, (self.features,))
        bias = self.variable("buffers", "bias", zeros, None, (self.features,))
        mean = self.variable("buffers", "running_mean", zeros, None, (self.features,))
        var = self.variable("buffers", "running_var", ones, None, (self.features,))
        scale = weight.value * jax.lax.rsqrt(var.value + BN_EPS)
        shift = bias.value - mean.value * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def make_norm(norm: str, features: int, dtype, name: str):
    if norm == "gn":
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dtype, name=name
        )
    return FrozenBatchNorm(features, dtype, name=name)


class BottleneckConv(nn.Module):
    """A bottleneck conv with an optional int8 inference path.

    Parameter layout is IDENTICAL to ``nn.Conv`` (one ``kernel`` leaf, HWIO,
    float32) so checkpoints are interchangeable between quantized and
    full-precision runs — quantization happens inside the forward:

    * weights: symmetric per-output-channel int8 (max-abs/127), quantized
      from the float kernel on the fly (tiny vs activation traffic);
    * activations: symmetric per-tensor int8 with a dynamic max-abs scale
      (one extra reduction pass per conv; no calibration data needed);
    * the s8 x s8 -> s32 convolution runs on the v5e int8 MXU path
      (measured 1.5-1.9x over bf16 on the 3x3 convs, RTT-corrected —
      scripts/bench_int8_conv.py), then folds (sx * sw) back in float.

    ReLU inputs are non-negative so the symmetric scheme spends one bit on
    the sign; accuracy is validated against the f32 path in
    tests/test_resnet_quant.py.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    quant: str = "none"  # "none" | "int8" (dynamic+observe) | "int8_static"
    #   | "int8_qat" (fake-quant with a straight-through estimator: the
    #   TRAINING twin of int8_static — same scales, same round/clip grid,
    #   but a float conv whose backward passes gradients through the
    #   quantizer, so the backbone learns under quantization noise and
    #   deploys on the true int8 path afterwards)
    groups: int = 1  # feature_group_count (depthwise EfficientNet convs);
    #   the per-out-channel weight scale is correct for any grouping
    use_bias: bool = False  # ConvNeXt-family convs carry biases (no BN to
    #   fold them into); the bias adds in float AFTER the int8 scale fold,
    #   so it never enters the quantization grid. Param layout matches
    #   nn.Conv(use_bias=True): {kernel, bias}.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_scale=None, prequantized: bool = False
    ) -> jnp.ndarray:
        """``x_scale``: when given, ``x`` is ALREADY int8 with that scale
        (the int8 residual-stream path) — no quantize pass at all.

        ``prequantized`` (int8_qat only): ``x`` already sits on the int8
        grid — the fake-quant analog of ``x_scale`` — so no input observer
        is declared and no fake-quant pass runs (keeps the qscales tree
        identical to the int8 carrier path's, which calibration produces)."""
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch // self.groups, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        def _add_bias(y):
            return y if bias is None else y + bias.astype(y.dtype)

        pad = self.dilation * (k // 2)
        dims = ("NHWC", "HWIO", "NHWC")
        if self.quant == "none":
            return _add_bias(jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=dims,
                feature_group_count=self.groups,
            ))

        if self.quant == "int8_qat":
            xf = x.astype(jnp.float32)
            if not prequantized:
                act_max = self.variable(
                    "qscales", "act_max", lambda: jnp.zeros((), jnp.float32)
                )
                sx = jnp.maximum(act_max.value, 1e-6) / 127.0
                xq = jnp.clip(jnp.round(xf / sx), -127, 127) * sx
                xf = xf + jax.lax.stop_gradient(xq - xf)  # STE
            sw = jax.lax.stop_gradient(
                jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
                / 127.0
            )  # per out-channel, like the deploy path; scale not learned
            wq = jnp.clip(jnp.round(kernel / sw), -127, 127) * sw
            wf = kernel + jax.lax.stop_gradient(wq - kernel)  # STE
            return _add_bias(jax.lax.conv_general_dilated(
                xf.astype(self.dtype),
                wf.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=dims,
                feature_group_count=self.groups,
            ))

        if x_scale is not None:
            xq, sx = x, x_scale
        else:
            # activation-max observer state (PTQ): "int8" computes the max
            # dynamically (and records it when the collection is mutable —
            # calibration mode); "int8_static" reads the calibrated value,
            # so the quantize is a pure elementwise op XLA fuses into the
            # PRODUCER epilogue — no extra reduction pass over the
            # activations (the dynamic max pass made naive int8 a net LOSS
            # on the HBM-bound stages: 10.1 vs 12.5 clips/s, round-2).
            act_max = self.variable(
                "qscales", "act_max", lambda: jnp.zeros((), jnp.float32)
            )
            if self.quant == "int8_static":
                sx = jnp.maximum(act_max.value, 1e-6) / 127.0
            else:  # "int8": dynamic + observe
                ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                if self.is_mutable_collection("qscales"):
                    act_max.value = jnp.maximum(act_max.value, ax)
                sx = jnp.maximum(ax, 1e-8) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / sx), -127, 127
            ).astype(jnp.int8)
        sw = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12
        ) / 127.0  # per out-channel
        wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=dims,
            preferred_element_type=jnp.int32,
            feature_group_count=self.groups,
        )
        return _add_bias(
            (y.astype(jnp.float32) * (sx * sw)).astype(self.dtype)
        )


class _ConvKernel(nn.Module):
    """Declares exactly the variables BottleneckConv would (param ``kernel``
    and, when ``observer``, the ``qscales/act_max`` state) without running a
    conv — used by the fused-kernel path so its variable tree (paths, shapes,
    init RNG folds) is bit-identical to the unfused block's."""

    shape: tuple
    observer: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        act_max = None
        if self.observer:
            act_max = self.variable(
                "qscales", "act_max", lambda: jnp.zeros((), jnp.float32)
            ).value
        return kernel, act_max


class _NormFold(nn.Module):
    """FrozenBatchNorm's buffers, returned folded as (scale, shift) instead
    of applied — same variable tree as ``FrozenBatchNorm``."""

    features: int

    @nn.compact
    def __call__(self):
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        weight = self.variable("buffers", "weight", ones, None, (self.features,))
        bias = self.variable("buffers", "bias", zeros, None, (self.features,))
        mean = self.variable("buffers", "running_mean", zeros, None, (self.features,))
        var = self.variable("buffers", "running_var", ones, None, (self.features,))
        scale = weight.value * jax.lax.rsqrt(var.value + BN_EPS)
        shift = bias.value - mean.value * scale
        return scale, shift


class Bottleneck(nn.Module):
    """Residual bottleneck. With ``qin``/``qout`` (int8 modes only) the
    residual STREAM between blocks is carried as ``(int8 tensor, f32
    scale)`` — every inter-block read/write of the big (..., 4*planes)
    activations costs 1 byte/elem instead of 2, and block-input convs
    consume the int8 directly (no quantize pass). Each block owns an
    ``out_max`` observer for its output scale (PTQ calibration records it;
    the static path reads it).

    ``fused`` (int8_static stride-1 tail blocks only) computes the whole
    block in one Pallas kernel (ops/fused_bottleneck.py): all intermediate
    activations stay in VMEM, HBM traffic drops to stream-in + stream-out +
    int8 weights. The variable tree is identical to the unfused block, so
    checkpoints and calibration (which runs the unfused dynamic "int8"
    model) are interchangeable."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    quant: str = "none"
    qin: bool = False  # input is (int8, scale)
    qout: bool = False  # emit (int8, scale)
    fused: bool = False  # one-Pallas-kernel block (int8_static tails)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        if (
            self.fused
            and self.quant == "int8_static"
            and self.qin
            and self.qout
            and not self.downsample
            and self.stride == 1
            and self.norm == "frozen_bn"
        ):
            return self._fused(x)
        qat = self.quant == "int8_qat"
        conv = lambda feats, k, s, d, name: BottleneckConv(
            feats,
            kernel_size=k,
            stride=s,
            dilation=d,
            quant=self.quant,
            dtype=self.dtype,
            name=name,
        )
        if self.qin and not qat:
            xq, sx = x
            x_in, in_scale = xq, sx
        else:
            # QAT carrier: a plain float tensor already on the int8 grid
            # (the producer fake-quantized it) — consumed directly
            x_in, in_scale = x, None
        prequant = qat and self.qin
        out = conv(self.planes, 1, 1, 1, "conv1")(
            x_in, in_scale, prequantized=prequant
        )
        out = make_norm(self.norm, self.planes, self.dtype, "bn1")(out)
        out = nn.relu(out)
        # named residuals for the selective remat policies (_block_cls):
        # a1/a2 are the NARROW (planes-channel) conv inputs — saving them
        # lets the backward skip recomputing the expensive convs while the
        # extra storage is only 1/4 of the block-IO activation per name
        out = checkpoint_name(out, "bneck_a1")
        out = conv(self.planes, 3, self.stride, self.dilation, "conv2")(out)
        out = make_norm(self.norm, self.planes, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = checkpoint_name(out, "bneck_a2")
        out = conv(self.planes * 4, 1, 1, 1, "conv3")(out)
        out = make_norm(self.norm, self.planes * 4, self.dtype, "bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1,
                            "downsample_conv")(
                x_in, in_scale, prequantized=prequant
            )
            identity = make_norm(
                self.norm, self.planes * 4, self.dtype, "downsample_bn"
            )(identity)
        elif self.qin and not qat:
            identity = (xq.astype(jnp.float32) * sx).astype(self.dtype)
        else:
            identity = x
        out = nn.relu(out + identity)
        if not self.qout:
            return out
        out_max = self.variable(
            "qscales", "out_max", lambda: jnp.zeros((), jnp.float32)
        )
        if qat:
            # fake-quant the residual stream with the calibrated scale and
            # an STE — same grid the int8 carrier writes at deploy time
            so = jnp.maximum(out_max.value, 1e-6) / 127.0
            of = out.astype(jnp.float32)
            oq = jnp.clip(jnp.round(of / so), -127, 127) * so
            return (of + jax.lax.stop_gradient(oq - of)).astype(self.dtype)
        if self.quant == "int8_static":
            so = jnp.maximum(out_max.value, 1e-6) / 127.0
        else:
            ax = jnp.max(jnp.abs(out.astype(jnp.float32)))
            if self.is_mutable_collection("qscales"):
                out_max.value = jnp.maximum(out_max.value, ax)
            so = jnp.maximum(ax, 1e-8) / 127.0
        oq = jnp.clip(
            jnp.round(out.astype(jnp.float32) / so), -127, 127
        ).astype(jnp.int8)
        return (oq, so)

    def _fused(self, x):
        from tubedetr_tpu.ops.fused_bottleneck import fused_bottleneck_block

        xq, sx = x
        in_ch = xq.shape[-1]
        p = self.planes
        kernels, scales = {}, {}
        for name, shape, observer in (
            ("conv1", (1, 1, in_ch, p), False),  # qin: no input observer
            ("conv2", (3, 3, p, p), True),
            ("conv3", (1, 1, p, p * 4), True),
        ):
            kernels[name], scales[name] = _ConvKernel(
                shape, observer=observer, name=name
            )()
        norms = {
            "bn1": _NormFold(p, name="bn1")(),
            "bn2": _NormFold(p, name="bn2")(),
            "bn3": _NormFold(p * 4, name="bn3")(),
        }
        out_max = self.variable(
            "qscales", "out_max", lambda: jnp.zeros((), jnp.float32)
        )
        return fused_bottleneck_block(
            xq,
            sx,
            kernels,
            norms,
            scales["conv2"],
            scales["conv3"],
            out_max.value,
            dilation=self.dilation,
        )


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, optionally computed via space-to-depth.

    The parameter is always the torchvision-layout (7, 7, 3, 64) HWIO kernel
    (path ``conv1/kernel``, checkpoint-compatible). With ``space_to_depth``
    the input packs 2x2 pixel blocks into channels (H, W, 3) ->
    (H/2, W/2, 12) and the kernel is rearranged on the fly into the exactly
    equivalent (4, 4, 12, 64) stride-1 conv:

        out[i,j] = sum_a,b W[a,b] x[2i+a-3, 2j+b-3]
                 = sum_p,u W'[p,u] y[i+p-2, u]   with a+1 = 2p+u

    i.e. pad the 7-tap axis to 8 with a leading zero, fold (p, u). The 3->12
    channel repack turns a >95%-idle MXU matmul into a 12-lane one.
    """

    space_to_depth: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64), jnp.float32
        ).astype(self.dtype)
        if not self.space_to_depth:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel,
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        n, h, w, c = x.shape
        y = (
            x.astype(self.dtype)
            .reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )  # channel = u*2c + v*c + ch
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, 3, 64)
        w2 = (
            wp.reshape(4, 2, 4, 2, c, 64)  # (p, u, q, v, c, o)
            .transpose(0, 2, 1, 3, 4, 5)  # (p, q, u, v, c, o)
            .reshape(4, 4, 4 * c, 64)
        )
        return jax.lax.conv_general_dilated(
            y,
            w2,
            window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _StageTail(nn.Module):
    """Scan body: one stride-1, no-downsample bottleneck (carry = feature
    map). Parameters stack along the scan axis under the name ``block``."""

    planes: int
    dilation: int
    norm: str
    remat: bool
    quant: str
    qio: bool
    dtype: jnp.dtype
    fused: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, carry, _):
        cls = _block_cls(self.remat, self.remat_policy)
        out = cls(
            planes=self.planes,
            stride=1,
            dilation=self.dilation,
            downsample=False,
            norm=self.norm,
            quant=self.quant,
            qin=self.qio,
            qout=self.qio,
            fused=self.fused,
            dtype=self.dtype,
            name="block",
        )(carry)
        return out, None


class ResNet(nn.Module):
    """ResNet-50/101/152 trunk returning the layer4 feature map (stride 32,
    2048 channels; stride 16 with ``dilation``)."""

    arch: str = "resnet101"
    dilation: bool = False  # DC5
    remat: bool = False  # rematerialise each bottleneck in the backward pass
    remat_policy: str = "full"  # what each remat'd block saves (see
    #   _block_cls): "full" recomputes everything, "save_mid" keeps conv3's
    #   narrow input (backward skips the 3x3 + conv3 recompute), "save_acts"
    #   keeps both conv inputs (no conv recompute). Identical numerics.
    scan_blocks: bool = True  # lax.scan over a stage's identical tail blocks:
    #   compiles ONE bottleneck body per stage instead of 23 for layer3 —
    #   a large XLA compile-time cut with identical numerics; params of the
    #   tail blocks stack along a leading axis under "layer{i}_rest/block"
    stages: int = 4  # run only the first N stage groups (profiling aid:
    #   stages=0 returns the post-maxpool stem output, 1 adds layer1, ...).
    #   Default 4 = the full trunk; apply() with a full parameter tree works
    #   for any truncation because Flax ignores unused sub-trees.
    space_to_depth: bool = False  # MXU-friendly stem: pack 2x2 pixel blocks
    #   into channels (3 -> 12) and run the exactly-equivalent 4x4/s1 conv
    #   instead of 7x7/s2 on 3 channels (which wastes >95% of MXU lanes).
    #   Parameter layout is unchanged (still the 7x7 conv1 kernel); the
    #   rearrangement happens inside the forward, so checkpoints are
    #   interchangeable between the two modes.
    quant: str = "none"  # "int8": dynamic-quantized bottleneck convs on the
    #   v5e int8 MXU path (inference; see BottleneckConv). "int8_qat":
    #   fake-quant training twin — same calibrated scales and observer tree,
    #   float convs with straight-through gradients (train under quant noise,
    #   deploy int8_static). The stem stays bf16/f32 (3-channel conv,
    #   negligible work). Parameter layout is the float checkpoint layout
    #   either way.
    fused_blocks: bool = False  # int8_static only: run each stride-1 tail
    #   bottleneck as ONE fused Pallas kernel (ops/fused_bottleneck.py) —
    #   all intermediates stay in VMEM; HBM traffic per block drops to
    #   stream-in + stream-out + int8 weights. Stage heads (downsample) and
    #   the stem stay on the XLA path.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        quant_override: str | None = None,
        frozen_prefix_quant: str | None = None,
        unroll_tail: bool = False,
    ) -> jnp.ndarray:
        """``quant_override``: run this call with a different quant mode than
        the module default, reusing the same parameters (submodule sharing is
        by name in flax compact modules). Used by the training fast pass:
        the float backbone carries gradients on the slow stream while the
        gradient-free T-frame fast pass runs int8 on the identical weights.

        ``frozen_prefix_quant``: quant mode for the ALWAYS-FROZEN prefix
        only — stem + layer1 (/root/reference/models/backbone.py:82-89
        freezes exactly those) — with layers 2-4 left on the default mode.
        Used by the training slow pass: the prefix carries no parameter
        gradients (they are masked before the optimizer and DCE'd), so it
        can run on the int8 MXU path while the trainable layers keep bf16;
        the carrier dequantizes once at the layer2 boundary.

        ``unroll_tail``: fully unroll the scanned stage-tail loop for THIS
        call (``nn.scan(..., unroll=n)``) while keeping the stacked scan
        parameter layout. Scan iteration boundaries block the int8
        quantize's producer-epilogue fusion (docs/NOTES.md: unrolled int8
        inference beat scanned by ~1.2x); the training fast pass is
        gradient-free, so it can afford the inlined program where the
        trainable slow pass keeps the compile-light scan."""
        quant = self.quant if quant_override is None else quant_override
        prefix_q = quant if frozen_prefix_quant is None else frozen_prefix_quant
        base, norm = parse_backbone_name(self.arch)
        blocks: Sequence[int] = STAGE_BLOCKS[base]
        block_cls = _block_cls(self.remat, self.remat_policy)
        use_s2d = (
            self.space_to_depth
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        x = StemConv(space_to_depth=use_s2d, dtype=self.dtype, name="conv1")(x)
        x = make_norm(norm, 64, self.dtype, "bn1")(x)
        x = nn.relu(x)

        # int8 modes carry the residual stream between blocks as
        # (int8, scale): inter-block HBM traffic halves and block-input
        # convs consume the int8 directly (no quantize pass). int8_qat
        # mirrors the same structure with a FLOAT carrier that is already
        # fake-quantized onto the int8 grid (same observers, STE backward).
        quant_io = prefix_q in ("int8", "int8_static")
        qat_io = prefix_q == "int8_qat"
        carried_q = False  # (int8, scale) carrier in flight
        carried_fake = False  # fake-quantized float carrier in flight (QAT)
        if qat_io:
            stem_max = self.variable(
                "qscales", "stem_act_max", lambda: jnp.zeros((), jnp.float32)
            )
            sx = jnp.maximum(stem_max.value, 1e-6) / 127.0
            xf = x.astype(jnp.float32)
            xq = jnp.clip(jnp.round(xf / sx), -127, 127) * sx
            x = (xf + jax.lax.stop_gradient(xq - xf)).astype(self.dtype)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
            carried_fake = True
        elif quant_io:
            # quantize BEFORE the maxpool — exact: round() is monotonic so
            # max commutes with quantize, and the 3x3/s2 pad-1 windows
            # cover every element so the post-pool activation max equals
            # the pre-pool max (same observer either side). The quantize
            # fuses into the stem conv's epilogue, the stem output is
            # written int8 (half the HBM traffic of the biggest spatial
            # map), and the pool itself runs on int8.
            stem_max = self.variable(
                "qscales", "stem_act_max", lambda: jnp.zeros((), jnp.float32)
            )
            if prefix_q == "int8_static":
                sx = jnp.maximum(stem_max.value, 1e-6) / 127.0
            else:  # dynamic + observe (calibration records the max)
                ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                if self.is_mutable_collection("qscales"):
                    stem_max.value = jnp.maximum(stem_max.value, ax)
                sx = jnp.maximum(ax, 1e-8) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / sx), -127, 127
            ).astype(jnp.int8)
            xq = jax.lax.reduce_window(
                xq,
                jnp.int8(-128),  # post-ReLU values are >= 0, pad never wins
                jax.lax.max,
                window_dimensions=(1, 3, 3, 1),
                window_strides=(1, 2, 2, 1),
                padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
            )
            x = (xq, sx)
            carried_q = True
        else:
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
        dilation = 1
        for i_layer, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), blocks)
        ):
            if i_layer >= self.stages:
                break
            # layer1 belongs to the always-frozen prefix; layers 2-4 run
            # the default mode (differs only under frozen_prefix_quant)
            stage_quant = prefix_q if i_layer == 0 else quant
            stage_io = stage_quant in ("int8", "int8_static")
            stage_fake = stage_quant == "int8_qat"
            if carried_q and not stage_io:
                # prefix -> trainable boundary: dequantize the carrier once.
                # The dequantized values sit exactly on the int8 grid, so a
                # QAT stage consumes them as its fake-quant carrier directly
                # (e.g. --backbone_quant_frozen int8_static with a QAT rest).
                xq, sx = x
                x = (xq.astype(jnp.float32) * sx).astype(self.dtype)
                carried_q = False
                carried_fake = stage_fake
            if carried_fake and stage_io:
                raise NotImplementedError(
                    "an int8 stage cannot follow a QAT (fake-quant) prefix: "
                    "the fake carrier has no int8 scale to hand over"
                )
            stride = 1 if i_layer == 0 else 2
            prev_dilation = dilation
            if i_layer == 3 and self.dilation:
                dilation *= stride
                stride = 1
            x = block_cls(
                planes=planes,
                stride=stride,
                dilation=prev_dilation,
                downsample=True,
                norm=norm,
                quant=stage_quant,
                qin=carried_q or carried_fake,
                qout=stage_io or stage_fake,
                dtype=self.dtype,
                name=f"layer{i_layer + 1}_0",
            )(x)
            carried_q = stage_io
            carried_fake = stage_fake
            if n_blocks > 1:
                if self.scan_blocks:
                    rest = nn.scan(
                        _StageTail,
                        variable_axes={"params": 0, "buffers": 0, "qscales": 0},
                        split_rngs={"params": True},
                        length=n_blocks - 1,
                        unroll=n_blocks - 1 if unroll_tail else 1,
                    )(
                        planes=planes,
                        dilation=dilation,
                        norm=norm,
                        remat=self.remat,
                        quant=stage_quant,
                        qio=stage_io or stage_fake,
                        fused=self.fused_blocks,
                        dtype=self.dtype,
                        remat_policy=self.remat_policy,
                        name=f"layer{i_layer + 1}_rest",
                    )
                    x, _ = rest(x, None)
                else:
                    for i_block in range(1, n_blocks):
                        x = block_cls(
                            planes=planes,
                            stride=1,
                            dilation=dilation,
                            downsample=False,
                            norm=norm,
                            quant=stage_quant,
                            qin=stage_io or stage_fake,
                            qout=stage_io or stage_fake,
                            fused=self.fused_blocks,
                            dtype=self.dtype,
                            name=f"layer{i_layer + 1}_{i_block}",
                        )(x)
        if carried_q:  # dequantize the final feature map for the heads
            xq, sx = x
            x = (xq.astype(jnp.float32) * sx).astype(self.dtype)
        return x

    @staticmethod
    def feature_hw(h: int, w: int, dilation: bool = False):
        """Output spatial dims for an input of (h, w): five ceil-halvings
        (four with DC5: conv1, maxpool, layer2, layer3[, layer4])."""
        n_halvings = 4 if dilation else 5
        for _ in range(n_halvings):
            h = -(-h // 2)
            w = -(-w // 2)
        return h, w
