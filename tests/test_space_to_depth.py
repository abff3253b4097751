"""Space-to-depth stem: exact numerical equivalence with the plain 7x7/s2
conv, with the SAME (checkpoint-compatible) parameter layout."""

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.models.resnet import ResNet, StemConv


def test_stem_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 36, 3).astype(np.float32))
    plain = StemConv(space_to_depth=False)
    packed = StemConv(space_to_depth=True)
    vs = plain.init(jax.random.PRNGKey(0), x)
    out_plain = plain.apply(vs, x)
    out_packed = packed.apply(vs, x)  # identical param tree
    assert out_plain.shape == out_packed.shape == (2, 16, 18, 64)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_plain), atol=2e-5
    )


def test_resnet_s2d_matches_plain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    plain = ResNet(arch="resnet14", space_to_depth=False)
    packed = ResNet(arch="resnet14", space_to_depth=True)
    vs = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(packed.apply(vs, x)),
        np.asarray(plain.apply(vs, x)),
        atol=3e-4,
    )


def test_odd_input_falls_back():
    x = jnp.zeros((1, 33, 33, 3))
    m = ResNet(arch="resnet14", space_to_depth=True)
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape[-1] == 2048
