"""Pipeline parallelism (parallel/pp.py): the scan+ppermute microbatch
pipeline must be numerically equal to the sequential layer stack — forward
AND gradients — for any (stages, microbatches) split, and its only
cross-stage communication must be collective-permutes plus the final
result broadcast."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubedetr_tpu.parallel.pp import (
    make_pipe_mesh,
    pipeline_apply,
    stack_layer_params,
)

L = 4  # layers in the stack


def _layer_fn(p, y, aux):
    """One toy layer: dense + residual, aux is an additive side input."""
    return y + jnp.tanh(y @ p["w"] + p["b"] + aux)


def _make_stack(d=8, seed=0):
    rng = np.random.RandomState(seed)
    layers = [
        {
            "w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
            "b": jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
        }
        for _ in range(L)
    ]
    return stack_layer_params(layers)


def _sequential(stacked, x, aux):
    # scan over layers with the full (N, ...) batch
    def body(y, p_i):
        return _layer_fn(p_i, y, aux), None

    y, _ = jax.lax.scan(body, x, stacked)
    return y


@pytest.mark.parametrize("stages,micro", [(2, 4), (4, 4), (4, 2), (1, 2)])
def test_pipeline_matches_sequential(stages, micro):
    d, n = 8, 8
    stacked = _make_stack(d)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, 3, d).astype(np.float32))
    aux = jnp.asarray(rng.randn(n, 3, d).astype(np.float32) * 0.2)

    ref = _sequential(stacked, x, aux)
    mesh = make_pipe_mesh(pipe=stages)
    out = pipeline_apply(
        _layer_fn, stacked, x, aux, mesh=mesh, microbatches=micro
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_composes_with_data_axis():
    """An unused ``data`` axis on the mesh must not change the numbers."""
    d, n = 8, 4
    stacked = _make_stack(d)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    aux = jnp.zeros((n, d), jnp.float32)

    ref = _sequential(stacked, x, aux)
    mesh = make_pipe_mesh(pipe=4, data=2)
    out = pipeline_apply(
        _layer_fn, stacked, x, aux, mesh=mesh, microbatches=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_gradients_match_sequential():
    """grad through the pipeline == grad through the sequential stack, for
    both the parameters and the inputs (the transpose of the forward
    ppermute chain is the backward pipeline)."""
    d, n = 6, 4
    stacked = _make_stack(d, seed=3)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    aux = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(n, d).astype(np.float32))

    def loss_seq(params, x):
        y = _sequential(params, x, aux)
        return jnp.mean((y - tgt) ** 2)

    mesh = make_pipe_mesh(pipe=2)

    def loss_pp(params, x):
        y = pipeline_apply(
            _layer_fn, params, x, aux, mesh=mesh, microbatches=2
        )
        return jnp.mean((y - tgt) ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    g_pp = jax.grad(loss_pp, argnums=(0, 1))(stacked, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        g_ref,
        g_pp,
    )


def test_pipelined_tubedetr_encoder_matches_model():
    """The pipelined encoder binding over REAL model params must equal the
    in-model sequential Encoder stack (clips as work units)."""
    from tubedetr_tpu.models.transformer import Encoder
    from tubedetr_tpu.parallel.pp import pipelined_encoder_apply

    d, heads, ffn, layers = 32, 4, 64, 4
    n, s = 8, 10  # 8 clips of 10 tokens
    enc = Encoder(layers, d, heads, ffn, dropout=0.1)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(n, s, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(n, s, d).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(n, s) > 0.8)
    mask = mask.at[:, 0].set(False)
    variables = enc.init(jax.random.PRNGKey(0), x, pos, mask)
    ref = enc.apply(variables, x, pos, mask)

    stacked = stack_layer_params(
        [variables["params"][f"layer_{i}"] for i in range(layers)]
    )
    for stages, micro in ((2, 4), (4, 2)):
        mesh = make_pipe_mesh(pipe=stages)
        out = pipelined_encoder_apply(
            stacked, x, pos, mask,
            mesh=mesh, microbatches=micro,
            d_model=d, nheads=heads, dim_feedforward=ffn,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


def test_pipelined_decoder_matches_model():
    """The pipelined DECODER binding (videos as units, per-layer aux
    outputs collected via all-gather) must equal the in-model Decoder:
    every layer's shared-norm output, TSA weights, and cross weights."""
    import flax.linen as nn

    from tubedetr_tpu.models.transformer import Decoder
    from tubedetr_tpu.parallel.pp import (
        decoder_stack_params,
        pipelined_decoder_apply,
    )

    d, heads, ffn, layers = 32, 4, 64, 4
    b, t, s = 8, 6, 10
    dec = Decoder(layers, d, heads, ffn, dropout=0.1)
    rng = np.random.RandomState(8)
    tgt = jnp.zeros((b, t, d), jnp.float32)
    qpos = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.3)
    mem = jnp.asarray(rng.randn(b, t, s, d).astype(np.float32))
    mpos = jnp.asarray(rng.randn(b, t, s, d).astype(np.float32) * 0.3)
    mmask = jnp.asarray(rng.rand(b, t, s) > 0.8)
    mmask = mmask.at[:, :, 0].set(False)
    qpad = jnp.asarray(rng.rand(b, t) > 0.8)
    qpad = qpad.at[:, 0].set(False)
    variables = dec.init(
        jax.random.PRNGKey(0), tgt, qpos, mem, mpos, mmask, qpad
    )
    hs_ref, tsa_ref, cross_ref = dec.apply(
        variables, tgt, qpos, mem, mpos, mmask, qpad
    )

    stacked = decoder_stack_params(
        {"transformer": {"decoder": variables["params"]}}
    )
    mesh = make_pipe_mesh(pipe=2)
    hs, tsa, cross = pipelined_decoder_apply(
        stacked, tgt, qpos, mem, mpos, mmask, qpad,
        mesh=mesh, microbatches=4,
        d_model=d, nheads=heads, dim_feedforward=ffn,
    )
    # the in-model Decoder passes every layer output through the SHARED
    # final norm; the pipeline returns pre-norm stacks
    hs = nn.LayerNorm().apply({"params": variables["params"]["norm"]}, hs)
    np.testing.assert_allclose(
        np.asarray(hs), np.asarray(hs_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tsa), np.asarray(tsa_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(cross), np.asarray(cross_ref), atol=2e-5
    )


def test_pipeline_accepts_preplaced_params():
    """place_stacked_params pins each stage's weights to its own device
    (HBM scaling); the pipeline must produce identical numbers from the
    pre-placed tree."""
    from tubedetr_tpu.parallel.pp import place_stacked_params

    d, n = 8, 4
    stacked = _make_stack(d, seed=6)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    aux = jnp.zeros((n, d), jnp.float32)
    mesh = make_pipe_mesh(pipe=4)

    ref = pipeline_apply(
        _layer_fn, stacked, x, aux, mesh=mesh, microbatches=2
    )
    placed = place_stacked_params(stacked, mesh, n_stages=4)
    # each leaf's leading (layer) axis is sharded over pipe
    for leaf in jax.tree_util.tree_leaves(placed):
        assert "pipe" in str(leaf.sharding.spec), leaf.sharding
    out = pipeline_apply(
        _layer_fn, placed, x, aux, mesh=mesh, microbatches=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


@pytest.mark.quick
def test_encoder_stack_params_layout():
    """encoder_stack_params must consume the checkpoint layout (the
    unstacked layer_{i} tree under params['transformer']['encoder'])."""
    from tubedetr_tpu.parallel.pp import encoder_stack_params

    leaf = np.zeros((3, 3), np.float32)
    params = {
        "transformer": {
            "encoder": {
                "layer_0": {"linear1": {"kernel": leaf}},
                "layer_1": {"linear1": {"kernel": leaf + 1}},
            }
        }
    }
    stacked = encoder_stack_params(params)
    assert stacked["linear1"]["kernel"].shape == (2, 3, 3)
    assert float(stacked["linear1"]["kernel"][1, 0, 0]) == 1.0


def test_pipeline_collectives_are_permutes_only():
    """The compiled pipelined program's cross-device traffic over ``pipe``
    must be collective-permutes (one hop per tick) plus the final result
    all-reduce; no all-gathers of weights or activations."""
    from tubedetr_tpu.parallel.collectives import collective_inventory

    d, n = 8, 8
    stacked = _make_stack(d)
    x = jnp.ones((n, d), jnp.float32)
    aux = jnp.zeros((n, d), jnp.float32)
    mesh = make_pipe_mesh(pipe=4)

    fn = jax.jit(
        lambda p, x: pipeline_apply(
            _layer_fn, p, x, aux, mesh=mesh, microbatches=4
        )
    )
    inv = collective_inventory(fn.lower(stacked, x).compile(), mesh)
    kinds = {c.kind for c in inv}
    assert "collective-permute" in kinds, inv
    allowed = {"collective-permute", "all-reduce", "all-gather"}
    assert kinds <= allowed, inv
    # the weight tensors must never be gathered: every non-permute
    # collective is the (m, mb, d) result broadcast, not a (L, d, d) gather
    for c in inv:
        if c.kind != "collective-permute":
            assert c.result_bytes <= n * d * 4 + 128, c
