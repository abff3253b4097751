"""Pallas TPU kernel: fully-fused int8 ResNet bottleneck block.

The XLA int8_static path (models/resnet.py BottleneckConv) already carries
the residual stream between blocks as (int8, scale) and fuses each quantize
into the producer conv's epilogue, but it still materialises every
intermediate activation in HBM: per tail block the traffic is

    stream-in (conv1) + stream-in (identity) + mid1 w/r + mid2 w/r
    + stream-out  ~=  3x stream + 4x mid.

This kernel computes the WHOLE bottleneck — conv1 (1x1) -> BN -> ReLU ->
quant -> conv2 (3x3, dilated) -> BN -> ReLU -> quant -> conv3 (1x1) -> BN ->
residual add -> ReLU -> requant — per frame block in VMEM, so HBM traffic
drops to exactly stream-in + stream-out + weights (int8):

    conv math (all on the int8 MXU path, s8 x s8 -> s32):
      acc1[i,p] = sum_c  x[i,c] * w1q[c,p]
      q1        = clip(round(relu(acc1 * A1[p] + B1[p])), 0, 127)
      acc2[i,p] = sum_{t in 3x3} shift_t(q1)[i,:] @ w2q[t]       (masked taps)
      q2        = clip(round(relu(acc2 * A2[p] + B2[p])), 0, 127)
      acc3[i,c] = sum_p  q2[i,p] * w3q[p,c]
      out       = clip(round(relu(acc3 * A3[c] + B3[c] + x[i,c] * s_id)), 0, 127)

    with the per-channel fold (computed once in XLA, negligible):
      A1 = s_x * sw1 * g1 / s2      B1 = c1 / s2
      A2 = s2  * sw2 * g2 / s3      B2 = c2 / s3
      A3 = s3  * sw3 * g3 / s_out   B3 = c3 / s_out     s_id = s_x / s_out
    where g/c are the folded FrozenBN scale/shift, sw* the per-out-channel
    weight scales, s2/s3 the calibrated activation scales (act_max/127) and
    s_out the block's calibrated output scale (out_max/127).

The 3x3 conv runs as 9 shifted matmuls over the flattened (H*W) axis: the
mid activation lives in a zero-bordered VMEM scratch so row under/overflow
reads zeros, and column wrap-around across row boundaries is masked with an
iota-mod-W predicate. Layout keeps channels in the lane dimension (multiples
of 128 for every stage this kernel is used on) and H*W in the sublane
dimension.

Numerics note: the XLA path rounds through bf16 between the conv epilogue
and the next quantize (conv output -> bf16 -> BN in bf16 -> quant); this
kernel keeps f32 throughout, so outputs can differ by the bf16 rounding of
values near quantization boundaries (+-1 int8 step). Tests compare both
against the f32 reference path.

Reference provenance: the block structure mirrors torchvision Bottleneck
(/root/reference/models/backbone.py:108-124 selects the torchvision trunk);
quantization is our TPU-side addition (the reference runs bf16/f32 CUDA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(W: int, HW: int, dilation: int, n_taps_side: int = 3):
    """Build the kernel body for static (W, HW, dilation)."""
    d = dilation
    OFF = d * W + d  # zero border wide enough for the extreme tap shift

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref, a2_ref,
               b2_ref, a3_ref, b3_ref, sid_ref, out_ref, mid_ref):
        f32 = jnp.float32
        x = x_ref[:]  # (F, HW, C) int8
        F = x.shape[0]
        P = w1_ref.shape[1]

        # ---- conv1 (1x1): (F, HW, C) @ (C, P) -> int32
        acc1 = jax.lax.dot_general(
            x, w1_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y1 = acc1.astype(f32) * a1_ref[:][None] + b1_ref[:][None]
        q1 = jnp.clip(jnp.round(jnp.maximum(y1, 0.0)), 0.0, 127.0)
        # zero the scratch borders, park the mid activation in the centre
        mid_ref[:, :OFF, :] = jnp.zeros((F, OFF, P), jnp.int8)
        mid_ref[:, OFF + HW:, :] = jnp.zeros((F, OFF, P), jnp.int8)
        mid_ref[:, OFF:OFF + HW, :] = q1.astype(jnp.int32).astype(jnp.int8)

        # ---- conv2 (3x3, dilation d): 9 shifted matmuls, int32 accumulate
        col = jax.lax.broadcasted_iota(jnp.int32, (1, HW, 1), 1) % W
        acc2 = jnp.zeros((F, HW, P), jnp.int32)
        for ky in range(n_taps_side):
            for kx in range(n_taps_side):
                o = (ky - 1) * d * W + (kx - 1) * d
                e = (kx - 1) * d
                shifted = mid_ref[:, OFF + o:OFF + o + HW, :]
                if e != 0:  # mask column wrap-around across row boundaries
                    valid = jnp.logical_and(col + e >= 0, col + e < W)
                    shifted = jnp.where(valid, shifted, jnp.int8(0))
                acc2 = acc2 + jax.lax.dot_general(
                    shifted, w2_ref[ky * n_taps_side + kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        y2 = acc2.astype(f32) * a2_ref[:][None] + b2_ref[:][None]
        q2 = jnp.clip(jnp.round(jnp.maximum(y2, 0.0)), 0.0, 127.0)
        q2 = q2.astype(jnp.int32).astype(jnp.int8)

        # ---- conv3 (1x1) + folded BN + residual + ReLU + requant
        acc3 = jax.lax.dot_general(
            q2, w3_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        ident = x.astype(jnp.int32).astype(f32) * sid_ref[0]
        y3 = acc3.astype(f32) * a3_ref[:][None] + b3_ref[:][None] + ident
        oq = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0.0, 127.0)
        out_ref[:] = oq.astype(jnp.int32).astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "dilation", "frames_per_step", "interpret"),
)
def _fused_block_call(xq, w1q, w2q, w3q, a1, b1, a2, b2, a3, b3, sid,
                      h, w, dilation, frames_per_step, interpret):
    n, hw, c = xq.shape
    p = w1q.shape[1]
    F = frames_per_step
    d = dilation
    off = d * w + d
    kernel = _make_kernel(w, hw, d)
    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_conv = 2 * n * hw * (c * p + 9 * p * p + p * c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), jnp.int8),
        grid=(n // F,),
        in_specs=[
            pl.BlockSpec((F, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(),  # w1q, w2q, w3q
            vec(), vec(), vec(), vec(), vec(), vec(),  # a1..b3
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sid (1,)
        ],
        out_specs=pl.BlockSpec((F, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, hw + 2 * off, p), jnp.int8)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_conv,
            bytes_accessed=n * hw * c * 2 + (c * p + 9 * p * p + p * c),
            transcendentals=0,
        ),
    )(xq, w1q, w2q, w3q, a1, b1, a2, b2, a3, b3, sid)


def quantize_weight(kernel: jnp.ndarray):
    """Per-out-channel symmetric int8: HWIO kernel -> (int8, (O,) scales)."""
    axes = tuple(range(kernel.ndim - 1))
    sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=axes), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def fused_bottleneck_block(
    xq: jnp.ndarray,  # (N, H, W, C) int8 — the residual stream
    sx: jnp.ndarray,  # () f32 — stream scale
    kernels: dict,  # {"conv1": (1,1,C,P) f32, "conv2": (3,3,P,P), "conv3": (P? ...)}
    norms: dict,  # {"bn1"|"bn2"|"bn3": (scale (O,), shift (O,)) f32}
    act_max2: jnp.ndarray,  # () f32 calibrated |max| into conv2
    act_max3: jnp.ndarray,  # () f32 calibrated |max| into conv3
    out_max: jnp.ndarray,  # () f32 calibrated |max| of the block output
    dilation: int = 1,
    interpret: bool | None = None,
    frames_per_step: int | None = None,
):
    """One fused stride-1 bottleneck on the int8 stream -> (int8, scale).

    ``kernels`` hold the FLOAT checkpoint-layout HWIO kernels; weight
    quantization happens here (tiny vs activation traffic, and loop-invariant
    under jit so XLA hoists it out of chained/serving loops).
    """
    n, h, w, c = xq.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k1 = kernels["conv1"]  # (1,1,C,P) HWIO
    k2 = kernels["conv2"]  # (3,3,P,P)
    k3 = kernels["conv3"]  # (1,1,P,C)
    w1q, sw1 = quantize_weight(k1[0, 0])  # (C, P)
    w2q, sw2 = quantize_weight(k2)  # (3,3,P,P)
    w2q = w2q.reshape(9, k2.shape[2], k2.shape[3])
    w3q, sw3 = quantize_weight(k3[0, 0])  # (P, C)

    g1, c1 = norms["bn1"]
    g2, c2 = norms["bn2"]
    g3, c3 = norms["bn3"]
    s2 = jnp.maximum(act_max2, 1e-6) / 127.0
    s3 = jnp.maximum(act_max3, 1e-6) / 127.0
    so = jnp.maximum(out_max, 1e-6) / 127.0
    f32 = jnp.float32
    a1 = ((sx * sw1 * g1) / s2).astype(f32)[None, :]
    b1 = (c1 / s2).astype(f32)[None, :]
    a2 = ((s2 * sw2 * g2) / s3).astype(f32)[None, :]
    b2 = (c2 / s3).astype(f32)[None, :]
    a3 = ((s3 * sw3 * g3) / so).astype(f32)[None, :]
    b3 = (c3 / so).astype(f32)[None, :]
    sid = (sx / so).astype(f32)[None]

    F = frames_per_step or (2 if n % 2 == 0 else 1)
    assert n % F == 0, (n, F)
    oq = _fused_block_call(
        xq.reshape(n, h * w, c), w1q, w2q, w3q, a1, b1, a2, b2, a3, b3,
        sid, h, w, dilation, F, interpret,
    )
    return oq.reshape(n, h, w, c), so


def fused_bottleneck_reference(xq, sx, kernels, norms, act_max2, act_max3,
                               out_max, dilation=1):
    """Pure-jnp emulation of the kernel math (same f32 folding) for tests."""
    k1, k2, k3 = kernels["conv1"], kernels["conv2"], kernels["conv3"]
    w1q, sw1 = quantize_weight(k1[0, 0])
    w2q, sw2 = quantize_weight(k2)
    w3q, sw3 = quantize_weight(k3[0, 0])
    g1, c1 = norms["bn1"]
    g2, c2 = norms["bn2"]
    g3, c3 = norms["bn3"]
    s2 = jnp.maximum(act_max2, 1e-6) / 127.0
    s3 = jnp.maximum(act_max3, 1e-6) / 127.0
    so = jnp.maximum(out_max, 1e-6) / 127.0
    f32 = jnp.float32
    a1, b1 = ((sx * sw1 * g1) / s2).astype(f32), (c1 / s2).astype(f32)
    a2, b2 = ((s2 * sw2 * g2) / s3).astype(f32), (c2 / s3).astype(f32)
    a3, b3 = ((s3 * sw3 * g3) / so).astype(f32), (c3 / so).astype(f32)
    sid = (sx / so).astype(f32)

    acc1 = jax.lax.dot_general(
        xq, w1q, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    q1 = jnp.clip(
        jnp.round(jnp.maximum(acc1.astype(f32) * a1 + b1, 0.0)), 0, 127
    ).astype(jnp.int8)
    d = dilation
    acc2 = jax.lax.conv_general_dilated(
        q1, w2q, window_strides=(1, 1), padding=[(d, d), (d, d)],
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    q2 = jnp.clip(
        jnp.round(jnp.maximum(acc2.astype(f32) * a2 + b2, 0.0)), 0, 127
    ).astype(jnp.int8)
    acc3 = jax.lax.dot_general(
        q2, w3q, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y3 = (acc3.astype(f32) * a3 + b3
          + xq.astype(jnp.int32).astype(f32) * sid)
    oq = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0, 127).astype(jnp.int8)
    return oq, so
