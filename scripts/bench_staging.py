"""Host input-pipeline throughput: the C++ staging pool at real shapes.

Measures frames/s through ``resize_normalize_clip`` (the data-worker path:
uint8 decode output -> composed sparse resize -> normalized f32) for a
200-frame 360p clip resized to 352x352, native pool vs numpy fallback, and
relates it to the device's consumption rate so the overlap margin is
explicit. CPU-only; run with the scrubbed env:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/bench_staging.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tubedetr_tpu.data import native
from tubedetr_tpu.ops.preprocess import _interp_matrix

T, IH, IW, RES = 200, 360, 640, 352
ITERS = int(os.environ.get("ITERS", 3))


def run(tag, fn, clip):
    fn(clip)  # warm (builds the .so / pool on first use)
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        fn(clip)
        best = min(best, time.perf_counter() - t0)
    fps = T / best
    print(f"{tag:18s} {best*1e3:8.1f} ms/clip  {fps:7.0f} frames/s", flush=True)
    return fps


def main():
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 256, (T, IH, IW, 3), dtype=np.uint8)
    ah = _interp_matrix(IH, RES)
    aw = _interp_matrix(IW, RES)

    have_native = native.get_lib() is not None
    print(f"native staging available: {have_native} "
          f"(threads={os.cpu_count()})")
    if have_native:
        fps_n = run("native CSR pool", lambda c: native.resize_normalize_clip(c, ah, aw), clip)
    # numpy fallback (what a compiler-less host would do)
    lib_save = native._lib
    native._lib = None
    try:
        get_save = native.get_lib
        native.get_lib = lambda *a, **k: None
        fps_np = run("numpy einsum", lambda c: native.resize_normalize_clip(c, ah, aw), clip)
    finally:
        native.get_lib = get_save
        native._lib = lib_save

    # demand side (measured on the v5e chip, docs/NOTES.md):
    # train headline 123 ms / 200-frame clip -> 1626 f/s per chip
    # int8 inference 49.1 ms -> 4073 f/s per chip
    for name, ms in (("train (123 ms/step)", 123.0), ("infer (49.1 ms)", 49.1)):
        demand = T / (ms / 1e3)
        if have_native:
            print(f"cores to overlap {name}: "
                  f"{demand / (fps_n / (os.cpu_count() or 1)):.1f} "
                  f"(at {fps_n:.0f} f/s on {os.cpu_count()} core(s))")


if __name__ == "__main__":
    main()
