"""Probe: which part of the fused bottleneck kernel is slow on v5e.

Variants (layer3 tail shapes, N=200, F frames/step):
  full    — the real kernel (shifted taps + masks + scratch)
  noshift — 9 center-tap dots, no scratch/masks (isolates shift/mask cost)
  dot2d   — like full but per-frame 2D dots (isolates 3D dot_general cost)
  convonly— conv1+conv3 only (isolates the 3x3 stage entirely)

Chained timing, RTT/CHAIN (~1.75 ms at CHAIN=16) subtracted.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHAIN = int(os.environ.get("CHAIN", "16"))
RTT = 28e-3 / CHAIN
N, H, W, C, P = 200, 22, 22, 1024, 256
HW = H * W
FLOPS = 2 * N * HW * (C * P + 9 * P * P + P * C)


def chain_time(fn, *args):
    def outer(*a):
        def body(i, acc):
            xi = jnp.where(acc > 1e30, -a[0], a[0])
            return acc + fn(xi, *a[1:])
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))
    f = jax.jit(outer)
    t0 = time.time(); float(f(*args)); c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(f(*args))
        best = min(best, (time.time() - t0) / CHAIN)
    return best - RTT, c


def make_kernel(variant, F):
    OFF = W + 1

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref, a2_ref,
               b2_ref, a3_ref, b3_ref, out_ref, mid_ref):
        f32 = jnp.float32

        def dot(a, b):
            if variant == "dot2d":
                parts = [
                    jax.lax.dot_general(
                        a[f], b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )[None]
                    for f in range(F)
                ]
                return jnp.concatenate(parts, 0)
            return jax.lax.dot_general(
                a, b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        x = x_ref[:]
        acc1 = dot(x, w1_ref[:])
        y1 = acc1.astype(f32) * a1_ref[:][None] + b1_ref[:][None]
        q1 = jnp.clip(jnp.round(jnp.maximum(y1, 0.0)), 0.0, 127.0)
        q1 = q1.astype(jnp.int32).astype(jnp.int8)

        if variant == "convonly":
            q2 = q1
        elif variant == "noshift":
            acc2 = dot(q1, w2_ref[0])
            for t in range(1, 9):
                acc2 = acc2 + dot(q1, w2_ref[t])
            y2 = acc2.astype(f32) * a2_ref[:][None] + b2_ref[:][None]
            q2 = jnp.clip(jnp.round(jnp.maximum(y2, 0.0)), 0.0, 127.0)
            q2 = q2.astype(jnp.int32).astype(jnp.int8)
        else:
            mid_ref[:, :OFF, :] = jnp.zeros((F, OFF, P), jnp.int8)
            mid_ref[:, OFF + HW:, :] = jnp.zeros((F, OFF, P), jnp.int8)
            mid_ref[:, OFF:OFF + HW, :] = q1
            col = jax.lax.broadcasted_iota(jnp.int32, (1, HW, 1), 1) % W
            acc2 = jnp.zeros((F, HW, P), jnp.int32)
            for ky in range(3):
                for kx in range(3):
                    o = (ky - 1) * W + (kx - 1)
                    e = kx - 1
                    sh = mid_ref[:, OFF + o:OFF + o + HW, :]
                    if e != 0:
                        ok = jnp.logical_and(col + e >= 0, col + e < W)
                        sh = jnp.where(ok, sh, jnp.int8(0))
                    acc2 = acc2 + dot(sh, w2_ref[ky * 3 + kx])
            y2 = acc2.astype(f32) * a2_ref[:][None] + b2_ref[:][None]
            q2 = jnp.clip(jnp.round(jnp.maximum(y2, 0.0)), 0.0, 127.0)
            q2 = q2.astype(jnp.int32).astype(jnp.int8)

        acc3 = dot(q2, w3_ref[:])
        y3 = (acc3.astype(f32) * a3_ref[:][None] + b3_ref[:][None]
              + x.astype(jnp.int32).astype(f32) * 0.01)
        oq = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0.0, 127.0)
        out_ref[:] = oq.astype(jnp.int32).astype(jnp.int8)

    return kernel


def run(variant, F):
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (N, HW, C)).astype(np.int8))
    w1 = jnp.asarray(rng.randint(-127, 128, (C, P)).astype(np.int8))
    w2 = jnp.asarray(rng.randint(-127, 128, (9, P, P)).astype(np.int8))
    w3 = jnp.asarray(rng.randint(-127, 128, (P, C)).astype(np.int8))
    a1 = jnp.full((1, P), 1e-4, jnp.float32); b1 = jnp.zeros((1, P), jnp.float32)
    a2 = jnp.full((1, P), 1e-4, jnp.float32); b2 = jnp.zeros((1, P), jnp.float32)
    a3 = jnp.full((1, C), 1e-4, jnp.float32); b3 = jnp.zeros((1, C), jnp.float32)
    OFF = W + 1
    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(xi, *w):
        y = pl.pallas_call(
            make_kernel(variant, F),
            out_shape=jax.ShapeDtypeStruct((N, HW, C), jnp.int8),
            grid=(N // F,),
            in_specs=[pl.BlockSpec((F, HW, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [vec()] * 9,
            out_specs=pl.BlockSpec((F, HW, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((F, HW + 2 * OFF, P), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xi, *w)
        return jnp.sum(y.astype(jnp.float32))

    t, c = chain_time(fn, xq, w1, w2, w3, a1, b1, a2, b2, a3, b3)
    print(f"{variant:9s} F={F}: {t*1e3:8.3f} ms  {FLOPS/t/1e12:6.1f} TFLOP/s "
          f"(compile {c:.0f}s)", flush=True)


# ---- padded-flat variants: HW padded to 512 HBM-side so F frames merge
# into one aligned 2D M axis; the 28 zero pad rows between frames double as
# the vertical conv border (no row masks needed; col masks still apply).

HWP = 512


def make_kernel_flat(variant, F):
    OFF = W + 1
    M = F * HWP

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref, a2_ref,
               b2_ref, a3_ref, b3_ref, out_ref, mid_ref):
        f32 = jnp.float32

        def dot2(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        x = x_ref[:].reshape(M, C)
        r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % HWP
        real = r < HW
        col = r % W

        acc1 = dot2(x, w1_ref[:])
        y1 = acc1.astype(f32) * a1_ref[:] + b1_ref[:]
        q1 = jnp.clip(jnp.round(jnp.maximum(y1, 0.0)), 0.0, 127.0)
        q1 = jnp.where(real, q1.astype(jnp.int32).astype(jnp.int8),
                       jnp.int8(0))

        mid_ref[:OFF, :] = jnp.zeros((OFF, P), jnp.int8)
        mid_ref[OFF + M:, :] = jnp.zeros((OFF, P), jnp.int8)
        mid_ref[OFF:OFF + M, :] = q1

        if variant == "im2col":
            cols = []
            for ky in range(3):
                for kx in range(3):
                    o = (ky - 1) * W + (kx - 1)
                    e = kx - 1
                    sh = mid_ref[OFF + o:OFF + o + M, :]
                    if e != 0:
                        ok = jnp.logical_and(col + e >= 0, col + e < W)
                        sh = jnp.where(ok, sh, jnp.int8(0))
                    cols.append(sh)
            patch = jnp.concatenate(cols, axis=1)  # (M, 9P)
            acc2 = dot2(patch, w2_ref[:].reshape(9 * P, P))
        else:  # "hwpad": 9 accumulated dots
            acc2 = jnp.zeros((M, P), jnp.int32)
            for ky in range(3):
                for kx in range(3):
                    o = (ky - 1) * W + (kx - 1)
                    e = kx - 1
                    sh = mid_ref[OFF + o:OFF + o + M, :]
                    if e != 0:
                        ok = jnp.logical_and(col + e >= 0, col + e < W)
                        sh = jnp.where(ok, sh, jnp.int8(0))
                    acc2 = acc2 + dot2(sh, w2_ref[ky * 3 + kx])
        y2 = acc2.astype(f32) * a2_ref[:] + b2_ref[:]
        q2 = jnp.clip(jnp.round(jnp.maximum(y2, 0.0)), 0.0, 127.0)
        q2 = q2.astype(jnp.int32).astype(jnp.int8)

        acc3 = dot2(q2, w3_ref[:])
        y3 = (acc3.astype(f32) * a3_ref[:] + b3_ref[:]
              + x.astype(jnp.int32).astype(f32) * 0.01)
        oq = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0.0, 127.0)
        oq = jnp.where(real, oq.astype(jnp.int32).astype(jnp.int8),
                       jnp.int8(0))
        out_ref[:] = oq.reshape(F, HWP, C)

    return kernel


def run_flat(variant, F):
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (N, HWP, C)).astype(np.int8))
    w1 = jnp.asarray(rng.randint(-127, 128, (C, P)).astype(np.int8))
    w2 = jnp.asarray(rng.randint(-127, 128, (9, P, P)).astype(np.int8))
    w3 = jnp.asarray(rng.randint(-127, 128, (P, C)).astype(np.int8))
    a1 = jnp.full((1, P), 1e-4, jnp.float32); b1 = jnp.zeros((1, P), jnp.float32)
    a2 = jnp.full((1, P), 1e-4, jnp.float32); b2 = jnp.zeros((1, P), jnp.float32)
    a3 = jnp.full((1, C), 1e-4, jnp.float32); b3 = jnp.zeros((1, C), jnp.float32)
    OFF = W + 1
    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(xi, *w):
        y = pl.pallas_call(
            make_kernel_flat(variant, F),
            out_shape=jax.ShapeDtypeStruct((N, HWP, C), jnp.int8),
            grid=(N // F,),
            in_specs=[pl.BlockSpec((F, HWP, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [vec()] * 9,
            out_specs=pl.BlockSpec((F, HWP, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((F * HWP + 2 * OFF, P), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xi, *w)
        return jnp.sum(y.astype(jnp.float32))

    t, c = chain_time(fn, xq, w1, w2, w3, a1, b1, a2, b2, a3, b3)
    # FLOPS accounting uses the real 484 rows; the pad rows are overhead
    print(f"{variant:9s} F={F}: {t*1e3:8.3f} ms  {FLOPS/t/1e12:6.1f} TFLOP/s "
          f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    for spec in (sys.argv[1:] or ["full:2", "noshift:2", "dot2d:2",
                                  "convonly:2", "noshift:8"]):
        v, f = spec.split(":")
        if v in ("hwpad", "im2col"):
            run_flat(v, int(f))
        else:
            run(v, int(f))
