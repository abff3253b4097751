"""Fused int8 bottleneck kernel vs the XLA int8_static path, per stage.

Measures one stride-1 tail bottleneck at each ResNet-101 stage's DC5 res=352
shape, N=200 frames, chained (tunnel-RTT-free, docs/NOTES.md) with a host
readback. Also reports the int8 agreement rate between the two paths on TPU.

Usage:  python scripts/bench_fused_block.py [layer3 layer4 ...]
Env:    CHAIN (default 16), F (frames per Pallas grid step, default 2)
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tubedetr_tpu.models.resnet import BN_EPS, Bottleneck  # noqa: E402
from tubedetr_tpu.ops.fused_bottleneck import fused_bottleneck_block  # noqa: E402

CHAIN = int(os.environ.get("CHAIN", "16"))
F = int(os.environ.get("F", "2"))
N = int(os.environ.get("N", "200"))

# (planes, H, W, dilation) at res=352 DC5
STAGES = {
    "layer1": (64, 88, 88, 1),
    "layer2": (128, 44, 44, 1),
    "layer3": (256, 22, 22, 1),
    "layer4": (512, 22, 22, 2),
}


def timed_chain(fn, *args):
    def outer(*a):
        def body(i, acc):
            xi = jnp.where(acc > 1e30, -a[0], a[0])  # keep iterations live
            return acc + fn(xi, *a[1:])

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(outer)
    t0 = time.time()
    float(f(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        best = min(best, (time.time() - t0) / CHAIN)
    return best, compile_s


def run_stage(name):
    planes, h, w, dil = STAGES[name]
    c = planes * 4
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (N, h, w, c)).astype(np.int8))
    sx = jnp.float32(0.02)

    block = Bottleneck(planes=planes, dilation=dil, quant="int8_static",
                       qin=True, qout=True, dtype=jnp.bfloat16)
    v = jax.jit(
        lambda: block.init(jax.random.PRNGKey(0), (xq[:1], sx))
    )()
    calib = Bottleneck(planes=planes, dilation=dil, quant="int8", qin=True,
                       qout=True, dtype=jnp.bfloat16)
    _, upd = jax.jit(
        lambda v: calib.apply(v, (xq, sx), mutable=["qscales"])
    )(v)
    v = {**v, "qscales": upd["qscales"]}

    def xla_path(xi, v):
        oq, _ = block.apply(v, (xi, sx))
        return jnp.sum(oq.astype(jnp.float32))

    p, bufs, q = v["params"], v["buffers"], v["qscales"]

    def norm(nm):
        b = bufs[nm]
        g = b["weight"] * jax.lax.rsqrt(b["running_var"] + BN_EPS)
        return g, b["bias"] - b["running_mean"] * g

    def fused_path(xi, v):
        p, q = v["params"], v["qscales"]
        oq, _ = fused_bottleneck_block(
            xi, sx,
            {k: p[k]["kernel"] for k in ("conv1", "conv2", "conv3")},
            {f"bn{i}": norm(f"bn{i}") for i in (1, 2, 3)},
            q["conv2"]["act_max"], q["conv3"]["act_max"], q["out_max"],
            dilation=dil, frames_per_step=F,
        )
        return jnp.sum(oq.astype(jnp.float32))

    # agreement spot-check on device
    oq_x, _ = jax.jit(lambda v: block.apply(v, (xq, sx)))(v)
    oq_f, _ = jax.jit(
        lambda v: fused_bottleneck_block(
            xq, sx,
            {k: v["params"][k]["kernel"] for k in ("conv1", "conv2", "conv3")},
            {f"bn{i}": norm(f"bn{i}") for i in (1, 2, 3)},
            v["qscales"]["conv2"]["act_max"], v["qscales"]["conv3"]["act_max"],
            v["qscales"]["out_max"], dilation=dil, frames_per_step=F,
        )
    )(v)
    a = np.asarray(oq_x[:4], np.int32)
    b = np.asarray(oq_f[:4], np.int32)
    agree = float((a == b).mean())
    maxd = int(np.abs(a - b).max())

    t_xla, c_xla = timed_chain(xla_path, xq, v)
    t_fused, c_fused = timed_chain(fused_path, xq, v)
    gf = 2 * N * h * w * (c * planes + 9 * planes * planes + planes * c) / 1e9
    print(
        f"{name}: XLA {t_xla*1e3:8.2f} ms  fused {t_fused*1e3:8.2f} ms  "
        f"speedup {t_xla/t_fused:5.2f}x  agree {agree*100:.2f}% (maxd {maxd})  "
        f"[{gf/t_fused:7.1f} GFLOP/s fused, {gf/t_xla:7.1f} XLA; "
        f"compiles {c_xla:.0f}s/{c_fused:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["layer3"]
    for nm in names:
        run_stage(nm)
