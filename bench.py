"""Benchmark: STVG inference clip throughput on the real TPU chip.

Measures end-to-end model forward (ResNet-101 backbone over slow+fast
streams, RoBERTa text encoder, video-text encoder, space-time decoder,
heads) for the headline config — k=4, res=352, 200-frame clips — and prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
the ratio to the recorded value in BENCH_BASELINE.json when present (so
round-over-round improvements are visible), else 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def jnp_sum(x):
    import jax.numpy as jnp

    return jnp.sum(x.astype(jnp.float32))

T = int(os.environ.get("BENCH_T", 200))  # frames per clip
RES = int(os.environ.get("BENCH_RES", 352))
STRIDE = int(os.environ.get("BENCH_STRIDE", 4))
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def main():
    import jax

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.models.tubedetr import build_model

    cfg = TubeDETRConfig(
        backbone="resnet101",
        stride=STRIDE,
        resolution=RES,
        video_max_len=T,
        video_max_len_train=T,
        compute_dtype="bfloat16",
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    tc = cfg.n_clips
    batch = dict(
        frames_slow=rng.randn(1, tc, RES, RES, 3).astype(np.float32),
        slow_pad_mask=np.zeros((1, tc, RES, RES), dtype=bool),
        tokens=rng.randint(4, cfg.text_vocab_size, (1, cfg.max_text_len)).astype(
            np.int32
        ),
        text_pad_mask=(np.arange(cfg.max_text_len)[None] >= 12),
        durations=np.full((1,), T, np.int32),
        frames_fast=rng.randn(1, T, RES, RES, 3).astype(np.float32),
        fast_pad_mask=np.zeros((1, T, RES, RES), dtype=bool),
    )
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    t0 = time.time()
    # fabricate parameters on host from the init shape tree (no init program
    # to compile over the remote tunnel), then upload once
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), **batch)
    rng_host = np.random.RandomState(0)

    def fabricate(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("running_var",):
            return np.ones(leaf.shape, leaf.dtype)
        if name in ("running_mean",):
            return np.zeros(leaf.shape, leaf.dtype)
        if name in ("scale",) or (name == "weight" and len(leaf.shape) == 1):
            return np.ones(leaf.shape, leaf.dtype)
        if name == "bias":
            return np.zeros(leaf.shape, leaf.dtype)
        return (rng_host.randn(*leaf.shape) * 0.02).astype(leaf.dtype)

    host_vars = jax.tree_util.tree_map_with_path(fabricate, shapes)
    variables = jax.device_put(host_vars)
    jax.block_until_ready(variables)
    init_s = time.time() - t0
    print(f"[bench] param fabrication+upload done in {init_s:.1f}s",
          file=sys.stderr)

    # reduce to a scalar on device and read it back to host each iteration:
    # a host readback is the only reliable completion barrier over the
    # remote-execution tunnel (block_until_ready returns early there)
    fwd = jax.jit(
        lambda v, b: jnp_sum(model.apply(v, **b)["pred_boxes"])
    )
    t0 = time.time()
    float(fwd(variables, batch))
    compile_s = time.time() - t0
    print(f"[bench] compile+first-run done in {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(ITERS):
        t0 = time.time()
        float(fwd(variables, batch))  # host readback = full completion
        times.append(time.time() - t0)
        print(f"[bench] iter {i}: {times[-1]:.3f}s", file=sys.stderr)
    best = min(times)
    clips_per_sec = 1.0 / best

    vs = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            with open("BENCH_BASELINE.json") as f:
                base = json.load(f)["value"]
            vs = clips_per_sec / base
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": f"clips/sec/chip STVG inference (k={STRIDE} res={RES} T={T})",
                "value": round(clips_per_sec, 4),
                "unit": "clips/s",
                "vs_baseline": round(vs, 4),
                "detail": {
                    "best_latency_s": round(best, 4),
                    "mean_latency_s": round(float(np.mean(times)), 4),
                    "compile_s": round(compile_s, 1),
                    "init_s": round(init_s, 1),
                    "frames_per_clip": T,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
