"""Probe: device preprocess (u8 360p -> 352x352 resize+normalize) variants.

The e2e bench showed preprocessing costs ~4.7 ms per 200-frame clip on top
of pure inference — ~10x the HBM roofline (read 69 MB u8 + write 148 MB
bf16 ≈ 0.25 ms). Suspects: the pallas kernel's dots run in f32 (Mosaic
matmul is far below MXU peak), and the einsum path uses Precision.HIGHEST.

Variants (chained timing, RTT/CHAIN subtracted):
  pallas_f32   current kernel (ops/pallas_preprocess.py)
  pallas_bf16  same kernel with bf16 dot inputs (f32 accumulate)
  einsum_bf16  XLA two-einsum path in bf16 (materialises the row
               intermediate in HBM, but XLA's dot emitter is fast)
  einsum_f32   the resize_normalize HIGHEST-precision path (reference)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tubedetr_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _interp_matrix,
)
from tubedetr_tpu.ops import pallas_preprocess as pp

T = int(os.environ.get("PROBE_T", 200))
IH, IW = 360, 640
OH = OW = int(os.environ.get("PROBE_RES", 352))
CHAIN = int(os.environ.get("CHAIN", 16))
RTT = 28e-3 / CHAIN


def chain_time(fn, *args):
    def outer(*a):
        def body(i, acc):
            frames = a[0].at[0, 0, 0].set((i % 250).astype(a[0].dtype))
            y = fn(frames, *a[1:])
            return acc + y.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(outer)
    t0 = time.time(); float(f(*args)); c = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.time(); float(f(*args))
        best = min(best, (time.time() - t0) / CHAIN)
    return best - RTT, c


def main():
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (T, IH, IW, 3), dtype=np.uint8)
    )
    ah = jnp.asarray(_interp_matrix(IH, OH))
    aw = jnp.asarray(_interp_matrix(IW, OW))
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def einsum_path(frames, ah, aw, precision, dt):
        x = frames.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        x = x.astype(dt)
        x = jnp.einsum("oh,nhwc->nowc", ah.astype(dt), x, precision=precision)
        x = jnp.einsum("pw,nowc->nopc", aw.astype(dt), x, precision=precision)
        return x.astype(jnp.bfloat16)

    cases = {}
    if "pallas" in os.environ.get("PROBE_CASES", "pallas,einsum"):
        cases["pallas_f32"] = lambda f: pp.resize_normalize_pallas(
            f, OH, OW, out_dtype=jnp.bfloat16
        )
    if "einsum" in os.environ.get("PROBE_CASES", "pallas,einsum"):
        cases["einsum_bf16"] = lambda f: einsum_path(
            f, ah, aw, jax.lax.Precision.DEFAULT, jnp.bfloat16
        )
        cases["einsum_f32h"] = lambda f: einsum_path(
            f, ah, aw, jax.lax.Precision.HIGHEST, jnp.float32
        )

    for name, fn in cases.items():
        t, c = chain_time(fn, frames)
        gb = T * (IH * IW * 3 + OH * OW * 3 * 2) / 1e9
        print(
            f"{name:12s} {t*1e3:7.3f} ms/clip  ({gb/t:5.1f} GB/s IO, "
            f"compile {c:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
