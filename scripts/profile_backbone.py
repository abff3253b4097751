"""Per-stage backbone timing on the real TPU (profiling aid, not the bench).

Times the backbone truncated after the stem and after each stage group
(every family exposes a ``stages=N`` truncation attribute with the same
semantics) with a host-readback barrier, then prints the per-stage deltas
so the underperforming stage is obvious. Supports all three backbone
families: ResNet (``resnet101`` ...), EfficientNet
(``efficientnet_b0``..``b3``), RegNetX/Y (``regnety_008`` ...); a
``timm_`` prefix is accepted and stripped.

Run over the axon tunnel:  PROF_ARCH=efficientnet_b0 python scripts/profile_backbone.py
Env: PROF_T (frames, default 200), PROF_RES (default 352), PROF_DTYPE,
PROF_QUANT (none | int8 | int8_static), PROF_STAGES (comma list; default =
all of the family), PROF_CHAIN (fori_loop chaining to amortise tunnel RTT).
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

T = int(os.environ.get("PROF_T", 200))
RES = int(os.environ.get("PROF_RES", 352))
DTYPE = jnp.bfloat16 if os.environ.get("PROF_DTYPE", "bf16") == "bf16" else jnp.float32
ARCH = os.environ.get("PROF_ARCH", "resnet101").removeprefix("timm_")
SCAN = os.environ.get("PROF_SCAN", "1") == "1"
QUANT = os.environ.get("PROF_QUANT", "none")  # none | int8 | int8_static
S2D = os.environ.get("PROF_S2D", "0") == "1"
ITERS = int(os.environ.get("PROF_ITERS", 3))
CHAIN = int(os.environ.get("PROF_CHAIN", 1))  # >1: fori_loop-chain the
# truncated model per timed call so the ~28 ms tunnel RTT amortises to
# RTT/CHAIN per iteration (per-call numbers under a congested tunnel are
# otherwise unusable — observed 1 s/call noise on 2026-08-16)


def family():
    if ARCH.startswith("resnet"):
        return "resnet", 4, ["stem+pool", "layer1", "layer2", "layer3", "layer4"]
    if ARCH.startswith("efficientnet"):
        return "efficientnet", 7, ["stem"] + [f"s{i}" for i in range(1, 8)]
    if ARCH.startswith("regnet"):
        return "regnet", 4, ["stem"] + [f"s{i}" for i in range(1, 5)]
    if ARCH.startswith("convnext"):
        return "convnext", 4, ["stem"] + [f"s{i}" for i in range(4)]
    raise SystemExit(f"unknown backbone family for PROF_ARCH={ARCH}")


def build(stages: int, quant: str):
    fam, _, _ = family()
    if fam == "resnet":
        from tubedetr_tpu.models.resnet import ResNet

        return ResNet(arch=ARCH, dilation=True, scan_blocks=SCAN,
                      stages=stages, space_to_depth=S2D, quant=quant,
                      dtype=DTYPE)
    if fam == "efficientnet":
        from tubedetr_tpu.models.efficientnet import EfficientNet

        return EfficientNet(arch=ARCH, stages=stages, quant=quant,
                            dtype=DTYPE)
    if fam == "regnet":
        from tubedetr_tpu.models.regnet import RegNet

        return RegNet(arch=ARCH, stages=stages, quant=quant, dtype=DTYPE)
    from tubedetr_tpu.models.convnext import ConvNeXt

    return ConvNeXt(arch=ARCH, stages=stages, quant=quant, dtype=DTYPE)


def fabricate(shapes, rng):
    def leaf(s):
        return jnp.asarray(rng.standard_normal(s.shape, np.float32) * 0.05, s.dtype)

    return jax.tree_util.tree_map(leaf, shapes)


def main():
    _, n_stages, names = family()
    stage_list = [
        int(s)
        for s in os.environ.get(
            "PROF_STAGES", ",".join(str(i) for i in range(n_stages + 1))
        ).split(",")
    ]
    full = build(n_stages, QUANT)
    x_host = np.random.RandomState(0).standard_normal((T, RES, RES, 3)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_host, DTYPE))
    shapes = jax.eval_shape(full.init, jax.random.PRNGKey(0), x)
    variables = jax.device_put(fabricate(shapes, np.random.default_rng(0)))
    if QUANT == "int8_static":
        # PTQ calibration with the dynamic-observer model
        calib = build(n_stages, "int8")
        _, upd = jax.jit(lambda v, i: calib.apply(v, i, mutable=["qscales"]))(variables, x)
        variables = {**variables, "qscales": jax.device_put(upd["qscales"])}
    print(f"[prof] arch={ARCH} T={T} res={RES} dtype={DTYPE.__name__} scan={SCAN} s2d={S2D} quant={QUANT}", flush=True)

    times = {}
    for stages in stage_list:
        model = build(stages, QUANT)

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

    print(f"\n{'stage':<10} {'delta ms':>9}  {'cum ms':>8}", flush=True)
    prev = 0.0
    for s in stage_list:
        d = times[s] - prev
        print(f"{names[s]:<10} {d*1e3:9.2f}  {times[s]*1e3:8.2f}", flush=True)
        prev = times[s]


if __name__ == "__main__":
    main()
