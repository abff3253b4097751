"""Conv/matmul strategy microbench on the real TPU (perf lever scouting).

Variants per shape: bf16 conv, int8 conv (s8xs8->s32), and for 1x1 convs the
reshaped-matmul formulation in bf16 and int8. Plus a big square matmul as the
MXU sanity ceiling. The loop body perturbs the WEIGHT each iteration (tiny
HBM traffic) so XLA cannot hoist/CSE the conv out of the chained fori_loop;
timing is chained with a host readback (docs/NOTES.md: tunnel RTT ~28 ms,
block_until_ready returns early).

Usage: python scripts/bench_int8_conv.py
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

CHAIN = int(os.environ.get("CHAIN", "16"))


def _chain(fn, x, w):
    """Time fn(x, w_perturbed) CHAIN times inside one program."""

    def outer(x, w):
        def body(i, acc):
            # carry-dependent weight select XLA cannot fold or hoist (tiny
            # traffic vs the conv, keeps every iteration live)
            wp = jnp.where(acc > 1e30, -w, w)
            y = fn(x, wp)
            return acc + y.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(outer)
    t0 = time.time()
    float(f(x, w))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(x, w))
        best = min(best, (time.time() - t0) / CHAIN)
    return best, compile_s


def conv_fn(stride, dil, pad):
    def fn(x, w):
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(
                jnp.int32 if x.dtype == jnp.int8 else None
            ),
        )
    return fn


def dot_fn(x, w):  # x (M, K), w (K, N)
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=(jnp.int32 if x.dtype == jnp.int8 else None),
    )


def report(label, t, flops, extra=""):
    print(f"{label:42s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} T/s {extra}",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    # MXU ceiling sanity: 4096^3 matmul
    a = jax.device_put(rng.randn(4096, 4096).astype(jnp.bfloat16))
    b = jax.device_put(rng.randn(4096, 4096).astype(jnp.bfloat16))
    t, _ = _chain(dot_fn, a, b)
    report("matmul 4096^3 bf16", t, 2 * 4096**3)
    ai = jax.device_put(np.clip(rng.randn(4096, 4096) * 40, -127, 127).astype(np.int8))
    bi = jax.device_put(np.clip(rng.randn(4096, 4096) * 40, -127, 127).astype(np.int8))
    t, _ = _chain(dot_fn, ai, bi)
    report("matmul 4096^3 int8", t, 2 * 4096**3)

    # (label, N, H, W, Cin, Cout, k, stride, dil)
    shapes = [
        ("layer1.conv2 3x3 88x88x64", 200, 88, 88, 64, 64, 3, 1, 1),
        ("layer3.conv2 3x3 22x22x256", 200, 22, 22, 256, 256, 3, 1, 1),
        ("layer3.conv1 1x1 1024->256", 200, 22, 22, 1024, 256, 1, 1, 1),
        ("layer3.conv3 1x1 256->1024", 200, 22, 22, 256, 1024, 1, 1, 1),
        ("layer4.conv2 3x3 22x22x512 dil2", 200, 22, 22, 512, 512, 3, 1, 2),
    ]
    for label, n, h, w_, cin, cout, k, stride, dil in shapes:
        x_f = rng.randn(n, h, w_, cin).astype(np.float32)
        w_f = (rng.randn(k, k, cin, cout) * 0.05).astype(np.float32)
        flops = 2 * n * h * w_ * cin * cout * k * k / (stride * stride)
        pad = dil * (k // 2)

        x_bf = jax.device_put(x_f.astype(jnp.bfloat16))
        w_bf = jax.device_put(w_f.astype(jnp.bfloat16))
        t_bf, _ = _chain(conv_fn(stride, dil, pad), x_bf, w_bf)
        report(f"{label} conv bf16", t_bf, flops)

        x_i8 = jax.device_put(np.clip(np.round(x_f * 10), -127, 127).astype(np.int8))
        w_i8 = jax.device_put(np.clip(np.round(w_f * 600), -127, 127).astype(np.int8))
        t_i8, _ = _chain(conv_fn(stride, dil, pad), x_i8, w_i8)
        report(f"{label} conv int8", t_i8, flops,
               f"({t_bf/t_i8:.2f}x vs bf16)")

        if k == 1:
            xm = jax.device_put(x_f.reshape(n * h * w_, cin).astype(jnp.bfloat16))
            wm = jax.device_put(w_f.reshape(cin, cout).astype(jnp.bfloat16))
            t_dm, _ = _chain(dot_fn, xm, wm)
            report(f"{label} as-dot bf16", t_dm, flops,
                   f"({t_bf/t_dm:.2f}x vs conv)")
            xmi = jax.device_put(
                np.clip(np.round(x_f.reshape(n * h * w_, cin) * 10), -127, 127
                        ).astype(np.int8))
            wmi = jax.device_put(
                np.clip(np.round(w_f.reshape(cin, cout) * 600), -127, 127
                        ).astype(np.int8))
            t_di, _ = _chain(dot_fn, xmi, wmi)
            report(f"{label} as-dot int8", t_di, flops,
                   f"({t_bf/t_di:.2f}x vs conv)")


if __name__ == "__main__":
    main()
