"""Int8 quantized backbone (PTQ): checkpoint-layout identity of the params
tree with the float model, bounded numerical deviation, and the
calibrate-then-static-scales flow (the perf lever of
scripts/bench_int8_conv.py — static scales let the quantize fuse into
producer epilogues instead of paying a dynamic max pass)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.models.resnet import BottleneckConv, ResNet


def test_param_tree_identical_between_quant_modes():
    x = jnp.zeros((1, 32, 32, 3))
    v_f = ResNet(arch="resnet14").init(jax.random.PRNGKey(0), x)
    v_q = ResNet(arch="resnet14", quant="int8").init(jax.random.PRNGKey(0), x)
    # float checkpoints load into the quantized model as-is: identical
    # params/buffers trees; the observer state is a separate collection
    assert jax.tree_util.tree_structure(
        v_f["params"]
    ) == jax.tree_util.tree_structure(v_q["params"])
    assert jax.tree_util.tree_structure(
        v_f["buffers"]
    ) == jax.tree_util.tree_structure(v_q["buffers"])
    assert "qscales" in v_q and "qscales" not in v_f
    for a, b in zip(
        jax.tree_util.tree_leaves(v_f["params"]),
        jax.tree_util.tree_leaves(v_q["params"]),
    ):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_qconv_close_to_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    m_f = BottleneckConv(24, kernel_size=3, quant="none")
    m_q = BottleneckConv(24, kernel_size=3, quant="int8")
    v = m_q.init(jax.random.PRNGKey(1), x)
    out_f = np.asarray(m_f.apply({"params": v["params"]}, x))
    out_q = np.asarray(m_q.apply(v, x))
    # symmetric per-tensor int8 on gaussian data: ~1% relative error
    denom = np.abs(out_f).max()
    assert np.abs(out_q - out_f).max() / denom < 0.03
    assert np.corrcoef(out_f.ravel(), out_q.ravel())[0, 1] > 0.999


def test_calibrate_then_static_matches_dynamic():
    """PTQ flow: a dynamic-observer pass records act maxima; the static model
    reproduces the dynamic outputs exactly on the calibration input."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 7, 7, 8).astype(np.float32))
    m_dyn = BottleneckConv(16, kernel_size=3, quant="int8")
    m_sta = BottleneckConv(16, kernel_size=3, quant="int8_static")
    v = m_dyn.init(jax.random.PRNGKey(3), x)
    # init runs with mutable collections, so it already observes its input
    assert float(v["qscales"]["act_max"]) == pytest.approx(
        float(jnp.abs(x).max())
    )
    out_dyn, updates = m_dyn.apply(v, x, mutable=["qscales"])
    observed = float(updates["qscales"]["act_max"])
    assert observed == pytest.approx(float(jnp.abs(x).max()))
    v_cal = {**v, "qscales": updates["qscales"]}
    out_sta = m_sta.apply(v_cal, x)
    np.testing.assert_allclose(
        np.asarray(out_sta), np.asarray(out_dyn), atol=1e-6
    )
    # and on a slightly different input the static path stays close to f32
    x2 = x * 0.9
    out_f = BottleneckConv(16, kernel_size=3, quant="none").apply(
        {"params": v["params"]}, x2
    )
    out_s2 = m_sta.apply(v_cal, x2)
    denom = float(jnp.abs(out_f).max())
    assert float(jnp.abs(out_s2 - out_f).max()) / denom < 0.05


def test_quantized_resnet_close_to_float_end_to_end():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5)
    model_f = ResNet(arch="resnet14")
    model_q = ResNet(arch="resnet14", quant="int8")
    model_s = ResNet(arch="resnet14", quant="int8_static")
    v = model_q.init(jax.random.PRNGKey(2), x)
    out_f = np.asarray(
        model_f.apply({"params": v["params"], "buffers": v["buffers"]}, x)
    )
    out_q, updates = model_q.apply(v, x, mutable=["qscales"])
    out_q = np.asarray(out_q)
    assert out_f.shape == out_q.shape
    # accumulated over 4 quantized bottlenecks + residuals; correlation must
    # stay near-perfect and the relative deviation bounded
    assert np.corrcoef(out_f.ravel(), out_q.ravel())[0, 1] > 0.99
    rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-9)
    assert rel < 0.15, rel
    # static path after calibration reproduces the dynamic outputs
    out_s = np.asarray(
        model_s.apply({**v, "qscales": updates["qscales"]}, x)
    )
    np.testing.assert_allclose(out_s, out_q, atol=1e-4)


def test_stem_quantize_before_maxpool_is_exact():
    """The int8 path quantizes the stem activation BEFORE the 3x3/s2 pool.
    This is exact: round/clip are monotonic so max commutes with quantize,
    and the pad-1 stride-2 windows cover every element so the pre-pool max
    equals the post-pool max (same observer value either side)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.abs(rng.randn(2, 16, 16, 4)).astype(np.float32))
    ax = float(jnp.max(jnp.abs(x)))
    sx = ax / 127.0

    def q(a):
        return jnp.clip(jnp.round(a / sx), -127, 127).astype(jnp.int8)

    pool_f = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    # max over the pooled map equals max over the raw map (window coverage)
    assert float(jnp.max(jnp.abs(pool_f))) == ax
    q_then_pool = jax.lax.reduce_window(
        q(x), jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    pool_then_q = q(pool_f)
    np.testing.assert_array_equal(
        np.asarray(q_then_pool), np.asarray(pool_then_q)
    )


def test_stem_observer_recorded_in_calibration():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    model_q = ResNet(arch="resnet14", quant="int8")
    v = model_q.init(jax.random.PRNGKey(0), x)
    _, updates = model_q.apply(v, x, mutable=["qscales"])
    assert float(updates["qscales"]["stem_act_max"]) > 0
