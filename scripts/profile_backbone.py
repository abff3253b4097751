"""Per-stage ResNet timing on the real TPU (profiling aid, not the bench).

Times the backbone truncated after the stem and after each stage group
(ResNet.stages attribute) with a host-readback barrier, then prints the
per-stage deltas next to their HBM / MXU roofline estimates so the
underperforming stage is obvious.

Run over the axon tunnel:  python scripts/profile_backbone.py
Env: PROF_T (frames, default 200), PROF_RES (default 352), PROF_DTYPE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from tubedetr_tpu.models.resnet import ResNet

T = int(os.environ.get("PROF_T", 200))
RES = int(os.environ.get("PROF_RES", 352))
DTYPE = jnp.bfloat16 if os.environ.get("PROF_DTYPE", "bf16") == "bf16" else jnp.float32
ARCH = os.environ.get("PROF_ARCH", "resnet101")
SCAN = os.environ.get("PROF_SCAN", "1") == "1"
QUANT = os.environ.get("PROF_QUANT", "none")  # none | int8 | int8_static
S2D = os.environ.get("PROF_S2D", "0") == "1"
STAGES = [int(s) for s in os.environ.get("PROF_STAGES", "0,1,2,3,4").split(",")]
ITERS = int(os.environ.get("PROF_ITERS", 3))
CHAIN = int(os.environ.get("PROF_CHAIN", 1))  # >1: fori_loop-chain the
# truncated model per timed call so the ~28 ms tunnel RTT amortises to
# RTT/CHAIN per iteration (per-call numbers under a congested tunnel are
# otherwise unusable — observed 1 s/call noise on 2026-08-16)


def fabricate(shapes, rng):
    def leaf(s):
        return jnp.asarray(rng.standard_normal(s.shape, np.float32) * 0.05, s.dtype)

    return jax.tree_util.tree_map(leaf, shapes)


def main():
    full = ResNet(arch=ARCH, dilation=True, scan_blocks=SCAN, space_to_depth=S2D, quant=QUANT, dtype=DTYPE)
    x_host = np.random.RandomState(0).standard_normal((T, RES, RES, 3)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_host, DTYPE))
    shapes = jax.eval_shape(full.init, jax.random.PRNGKey(0), x)
    variables = jax.device_put(fabricate(shapes, np.random.default_rng(0)))
    if QUANT == "int8_static":
        # PTQ calibration with the dynamic-observer model
        calib = ResNet(arch=ARCH, dilation=True, scan_blocks=SCAN, space_to_depth=S2D, quant="int8", dtype=DTYPE)
        _, upd = jax.jit(lambda v, i: calib.apply(v, i, mutable=["qscales"]))(variables, x)
        variables = {**variables, "qscales": jax.device_put(upd["qscales"])}
    print(f"[prof] arch={ARCH} T={T} res={RES} dtype={DTYPE.__name__} scan={SCAN} s2d={S2D} quant={QUANT}", flush=True)

    times = {}
    for stages in STAGES:
        model = ResNet(arch=ARCH, dilation=True, scan_blocks=SCAN, stages=stages, space_to_depth=S2D, quant=QUANT, dtype=DTYPE)

        if CHAIN > 1:

            @jax.jit
            def run(v, inp):
                def body(i, acc):
                    pert = inp + (i.astype(inp.dtype) * inp.dtype.type(1e-8))
                    return acc + jnp.sum(
                        model.apply(v, pert).astype(jnp.float32)
                    )

                return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        else:

            @jax.jit
            def run(v, inp):
                return jnp.sum(model.apply(v, inp).astype(jnp.float32))

        t0 = time.perf_counter()
        float(run(variables, x))  # compile + first run, host readback barrier
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(run(variables, x))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        times[stages] = best
        print(f"[prof] stages={stages}: {best*1e3:8.2f} ms  (compile {compile_s:.1f}s)", flush=True)

    names = ["stem+pool", "layer1", "layer2", "layer3", "layer4"]
    print(f"\n{'stage':<10} {'delta ms':>9}  {'cum ms':>8}", flush=True)
    prev = 0.0
    for s in STAGES:
        d = times[s] - prev
        print(f"{names[s]:<10} {d*1e3:9.2f}  {times[s]*1e3:8.2f}", flush=True)
        prev = times[s]


if __name__ == "__main__":
    main()
