"""Probe: int8 matmul throughput, Pallas vs XLA, at the fused-bottleneck
shapes (layer3: rows=F*484, K/N in {1024,256}) — isolates whether the fused
kernel's 7x deficit is the Mosaic int8 matmul itself, the shifted-tap reads,
or the elementwise epilogue. Chained timing, RTT/CHAIN subtracted per NOTES.
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
N_FRAMES = 200
HW = 484
RTT = 28e-3 / CHAIN


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


def report(name, t, flops):
    print(f"{name:34s} {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TFLOP/s", flush=True)


rng = np.random.RandomState(0)
for F in (2, 8):
    G = N_FRAMES // F
    M, K, Nn = F * HW, 1024, 256
    x = jnp.asarray(rng.randint(-127, 128, (N_FRAMES * HW, K)).astype(np.int8))
    w = jnp.asarray(rng.randint(-127, 128, (K, Nn)).astype(np.int8))
    flops = 2 * N_FRAMES * HW * K * Nn

    def xla_dot(xi, w):
        y = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32))

    t, _ = chain_time(xla_dot, x, w)
    report(f"XLA int8 dot ({N_FRAMES*HW}x{K}x{Nn})", t, flops)

    def k_dot(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pl_dot(xi, w):
        y = pl.pallas_call(
            k_dot,
            out_shape=jax.ShapeDtypeStruct((N_FRAMES * HW, Nn), jnp.int32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, Nn), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xi, w)
        return jnp.sum(y.astype(jnp.float32))

    t, c = chain_time(pl_dot, x, w)
    report(f"Pallas int8 dot 2D (F={F})", t, flops)

    # bf16 comparison (same shapes)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def k_dotb(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def pl_dotb(xi, w):
        y = pl.pallas_call(
            k_dotb,
            out_shape=jax.ShapeDtypeStruct((N_FRAMES * HW, Nn), jnp.float32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, Nn), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xi, w)
        return jnp.sum(y)

    t, _ = chain_time(pl_dotb, xb, wb)
    report(f"Pallas bf16 dot 2D (F={F})", t, flops)

    # 3D form as used in the fused kernel: (F, HW, K) x (K, N)
    x3 = x.reshape(N_FRAMES, HW, K)

    def k_dot3(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pl_dot3(xi, w):
        y = pl.pallas_call(
            k_dot3,
            out_shape=jax.ShapeDtypeStruct((N_FRAMES, HW, Nn), jnp.int32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((F, HW, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, HW, Nn), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xi, w)
        return jnp.sum(y.astype(jnp.float32))

    t, _ = chain_time(pl_dot3, x3, w)
    report(f"Pallas int8 dot 3D (F={F})", t, flops)
