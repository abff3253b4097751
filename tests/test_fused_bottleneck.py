"""Fused int8 bottleneck Pallas kernel: interpret-mode equality with the
pure-jnp emulation and agreement with the XLA int8_static Bottleneck module
(same calibrated scales; the kernel keeps f32 between stages where the XLA
path rounds through bf16, so int8 grids may differ by +-1 on quantization
boundaries)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubedetr_tpu.models.resnet import BN_EPS, Bottleneck
from tubedetr_tpu.ops.fused_bottleneck import (
    fused_bottleneck_block,
    fused_bottleneck_reference,
)


def _make_block_inputs(rng, n, h, w, planes):
    c = planes * 4
    xq = rng.randint(-127, 128, (n, h, w, c)).astype(np.int8)
    sx = np.float32(0.023)
    kernels = {
        "conv1": rng.randn(1, 1, c, planes).astype(np.float32) * 0.05,
        "conv2": rng.randn(3, 3, planes, planes).astype(np.float32) * 0.05,
        "conv3": rng.randn(1, 1, planes, c).astype(np.float32) * 0.05,
    }
    norms = {
        name: (
            (0.5 + rng.rand(feats)).astype(np.float32),
            (0.1 * rng.randn(feats)).astype(np.float32),
        )
        for name, feats in (("bn1", planes), ("bn2", planes), ("bn3", c))
    }
    return xq, sx, kernels, norms


@pytest.mark.parametrize("dilation", [1, 2])
@pytest.mark.parametrize("n,h,w", [(2, 6, 6), (3, 5, 7)])
def test_kernel_matches_emulation(n, h, w, dilation):
    rng = np.random.RandomState(0)
    xq, sx, kernels, norms = _make_block_inputs(rng, n, h, w, planes=16)
    args = (
        jnp.asarray(xq),
        jnp.float32(sx),
        {k: jnp.asarray(v) for k, v in kernels.items()},
        {k: (jnp.asarray(a), jnp.asarray(b)) for k, (a, b) in norms.items()},
        jnp.float32(11.0),
        jnp.float32(9.0),
        jnp.float32(14.0),
    )
    got, so = fused_bottleneck_block(*args, dilation=dilation, interpret=True)
    want, so_ref = fused_bottleneck_reference(*args, dilation=dilation)
    assert float(so) == float(so_ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_matches_bottleneck_module():
    """Same math as the XLA int8_static Bottleneck (f32 dtype) with the
    module's own params/buffers/calibrated scales."""
    rng = np.random.RandomState(1)
    planes, n, h, w = 8, 2, 6, 6
    c = planes * 4
    xq = jnp.asarray(rng.randint(-127, 128, (n, h, w, c)).astype(np.int8))
    sx = jnp.float32(0.031)

    block = Bottleneck(
        planes=planes, quant="int8_static", qin=True, qout=True,
        dtype=jnp.float32,
    )
    variables = block.init(jax.random.PRNGKey(0), (xq, sx))
    # calibrate: run the dynamic-observer variant once to set real scales
    calib = Bottleneck(
        planes=planes, quant="int8", qin=True, qout=True, dtype=jnp.float32
    )
    _, upd = calib.apply(variables, (xq, sx), mutable=["qscales"])
    variables = {**variables, "qscales": upd["qscales"]}
    oq_mod, so_mod = block.apply(variables, (xq, sx))

    p, bufs, q = variables["params"], variables["buffers"], variables["qscales"]

    def norm(name):
        b = bufs[name]
        g = b["weight"] / np.sqrt(np.asarray(b["running_var"]) + BN_EPS)
        return jnp.asarray(g), jnp.asarray(b["bias"] - b["running_mean"] * g)

    oq_k, so_k = fused_bottleneck_block(
        xq,
        sx,
        {k: p[k]["kernel"] for k in ("conv1", "conv2", "conv3")},
        {f"bn{i}": norm(f"bn{i}") for i in (1, 2, 3)},
        q["conv2"]["act_max"],
        q["conv3"]["act_max"],
        q["out_max"],
        interpret=True,
    )
    assert float(so_k) == pytest.approx(float(so_mod), rel=1e-6)
    a, b = np.asarray(oq_k, np.int32), np.asarray(oq_mod, np.int32)
    diff = np.abs(a - b)
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() > 0.99, (diff == 0).mean()


from tubedetr_tpu.models.resnet import ResNet


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_fused_resnet_matches_unfused(scan_blocks):
    """End-to-end ResNet (resnet26: one fused tail per stage, DC5 layer4 so
    dilation=2 is exercised): identical variable trees, near-identical
    outputs (the fused kernel skips the XLA path's bf16 hop, so final
    features may differ by one quantization step of the last block)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)
    kw = dict(arch="resnet26", dilation=True, quant="int8_static",
              scan_blocks=scan_blocks)
    m_ref = ResNet(**kw)
    m_fused = ResNet(**kw, fused_blocks=True)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x)
    # variable trees are interchangeable: same structure, same values
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(
        v_fused
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_fused)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # calibrate once with the (unfused) dynamic-observer model
    m_dyn = ResNet(arch="resnet26", dilation=True, quant="int8",
                   scan_blocks=scan_blocks)
    _, upd = m_dyn.apply(v_ref, x, mutable=["qscales"])
    v = {**v_ref, "qscales": upd["qscales"]}

    out_ref = np.asarray(m_ref.apply(v, x))
    out_fused = np.asarray(m_fused.apply(v, x))
    assert out_ref.shape == out_fused.shape
    # bound: a few int8 steps of the final block's output scale (each fused
    # block may differ by +-1 step from the bf16-hop XLA path; differences
    # propagate through the remaining requantizations)
    q4 = upd["qscales"]["layer4_rest"]["block"] if scan_blocks else upd[
        "qscales"
    ]["layer4_1"]
    step = float(np.max(np.asarray(q4["out_max"]))) / 127.0
    assert np.abs(out_fused - out_ref).max() <= step * 3 + 1e-6
    assert np.corrcoef(out_ref.ravel(), out_fused.ravel())[0, 1] > 0.999
