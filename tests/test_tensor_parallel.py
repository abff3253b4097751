"""Tensor (model) parallelism: Megatron-style transformer sharding on the
virtual CPU mesh (parallel/tp.py).

The reference has no tensor-parallel path (DDP only,
/root/reference/util/dist.py:210-247) — this is a TPU-mesh capability on
top of parity. Pinned here:

* the TP train step matches the replicated step numerically (the column/row
  split only re-orders matmul reductions);
* the layout actually engages: attention/FFN kernels land model-sharded and
  SURVIVE donated steps (out_shardings pins them), while norms/heads/backbone
  stay replicated;
* ZeRO composition: optimizer moments carry the param's model spec plus a
  ``data`` axis on a free dim;
* TP inference placement (place_variables_tp) reproduces replicated logits.
"""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from tests.test_train_step import lrs, tiny_cfg
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tubedetr_tpu.parallel.tp import (
    count_tp_sharded,
    place_variables_tp,
    shard_train_state,
    tp_param_pspecs,
)
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    model_inputs,
)


def _setup(b=4):
    cfg = tiny_cfg()
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(b, t=cfg.video_max_len_train)
    batch, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return cfg, model, batch, variables


def _specs(tree):
    return {
        "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        ): x.sharding.spec
        for path, x in jax.tree_util.tree_flatten_with_path(tree)[0]
        if hasattr(x, "sharding") and np.ndim(x) > 0
    }


def test_tp_pspec_rules():
    cfg, model, batch, variables = _setup(b=2)
    specs = tp_param_pspecs(
        variables["params"], model=2, nheads=cfg.nheads,
        text_heads=cfg.text_heads,
    )
    flat = {
        "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path
        ): s
        for path, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    # column-parallel: q/k/v + linear1/intermediate shard the output dim
    assert any(
        "q_proj/kernel" in k and v == P(None, "model")
        for k, v in flat.items()
    ), flat
    assert any(
        "linear1/kernel" in k and v == P(None, "model")
        for k, v in flat.items()
    )
    # row-parallel: out_proj/linear2 shard the input dim, biases replicated
    assert any(
        "out_proj/kernel" in k and v == P("model", None)
        for k, v in flat.items()
    ), flat
    for k, v in flat.items():
        if "out_proj/bias" in k or "linear2/bias" in k:
            assert "model" not in str(v), (k, v)
        # norms, heads, backbone, query embed: replicated
        if any(t in k for t in ("norm", "bbox_embed", "backbone",
                                "query_embed")):
            assert "model" not in str(v), (k, v)


def test_tp_train_matches_replicated_and_keeps_layout():
    cfg, model, batch, variables = _setup()
    n_steps = 2

    def run(tp: bool, zero: bool = False):
        state, tx, labels = create_train_state(cfg, variables)
        mesh = (
            make_mesh(data=2, time=1, model=2, devices=jax.devices()[:4])
            if tp
            else make_mesh(data=2, time=1, devices=jax.devices()[:2])
        )
        with mesh:
            if tp:
                state, shardings = shard_train_state(
                    state, mesh, nheads=cfg.nheads,
                    text_heads=cfg.text_heads, zero=zero,
                )
            else:
                state, shardings = replicate(state, mesh), None
            sb = shard_batch(batch, mesh)
            step = make_train_step(
                cfg, model, tx, labels, donate=True,
                state_shardings=shardings,
            )
            for i in range(n_steps):
                state, metrics = step(state, sb, lrs(), np.int32(i))
        return state, metrics

    st_r, m_r = run(tp=False)
    st_s, m_s = run(tp=True, zero=True)

    # --- numerics: TP only re-orders matmul reductions ------------------
    np.testing.assert_allclose(
        float(m_s["loss_total"]), float(m_r["loss_total"]), rtol=1e-5
    )
    flat_r = _specs(st_r.params)
    for (k, _), a, b in zip(
        flat_r.items(),
        jax.tree_util.tree_leaves(st_r.params),
        jax.tree_util.tree_leaves(st_s.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-5, rtol=5e-4, err_msg=k,
        )

    # --- layout engaged and pinned across donated steps -----------------
    pspecs = _specs(st_s.params)
    sharded = [k for k, s in pspecs.items() if "model" in str(s)]
    assert count_tp_sharded(
        st_s.params,
        jax.tree_util.tree_leaves(st_s.params)[0].sharding.mesh,
        nheads=cfg.nheads, text_heads=cfg.text_heads,
    ) == len(sharded)
    assert any("q_proj/kernel" in k for k in sharded), sharded
    assert any("linear1/kernel" in k for k in sharded)
    assert any("text_encoder" in k for k in sharded)
    for k, s in pspecs.items():
        if "backbone" in k:
            assert "model" not in str(s), (k, s)
    # a sharded kernel's addressable shard is really half-size
    kname = next(k for k in sharded if "q_proj/kernel" in k)
    leaf = {
        k: x for k, x in zip(flat_r, jax.tree_util.tree_leaves(st_s.params))
    }[kname]
    shard_shape = leaf.addressable_shards[0].data.shape
    assert shard_shape[-1] * 2 == leaf.shape[-1], (shard_shape, leaf.shape)

    # --- ZeRO composition: moments carry model + data -------------------
    mspecs = _specs(st_s.opt_state)
    assert any("model" in str(s) for s in mspecs.values())
    assert any("data" in str(s) for s in mspecs.values())
    # EMA follows
    especs = _specs(st_s.ema_params)
    assert any("model" in str(s) for s in especs.values())


def test_tp_inference_matches_replicated():
    cfg, model, batch, variables = _setup(b=2)
    state, tx, labels = create_train_state(cfg, variables)
    eval_step = make_eval_step(cfg, model)

    mesh_r = make_mesh(data=2, time=1, devices=jax.devices()[:2])
    with mesh_r:
        out_r, _ = eval_step(replicate(state, mesh_r), shard_batch(batch, mesh_r))

    mesh_t = make_mesh(data=2, time=1, model=2, devices=jax.devices()[:4])
    with mesh_t:
        placed = place_variables_tp(
            {"params": state.params, "buffers": state.buffers},
            mesh_t, nheads=cfg.nheads, text_heads=cfg.text_heads,
        )
        state_t = state.replace(
            params=placed["params"], buffers=placed["buffers"],
            opt_state=jax.device_put(state.opt_state),
            ema_params=jax.device_put(state.ema_params),
        )
        out_t, _ = eval_step(state_t, shard_batch(batch, mesh_t))

    np.testing.assert_allclose(
        np.asarray(out_r["pred_boxes"]), np.asarray(out_t["pred_boxes"]),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["pred_sted"]), np.asarray(out_t["pred_sted"]),
        atol=2e-4, rtol=1e-3,
    )


def test_fsdp_train_matches_replicated_and_shards_params():
    """--shard_params (FSDP/ZeRO-3-style): parameters themselves shard a
    free dim over ``data``; GSPMD all-gathers each layer's weights at its
    use site. Numerics must match the replicated step (gather/scatter only
    re-orders data movement) and the param layout must survive donated
    steps."""
    cfg, model, batch, variables = _setup()
    n_steps = 2

    def run(fsdp: bool):
        state, tx, labels = create_train_state(cfg, variables)
        mesh = make_mesh(data=4, time=1, devices=jax.devices()[:4])
        with mesh:
            if fsdp:
                state, shardings = shard_train_state(
                    state, mesh, nheads=cfg.nheads,
                    text_heads=cfg.text_heads, fsdp=True,
                )
            else:
                state, shardings = replicate(state, mesh), None
            sb = shard_batch(batch, mesh)
            step = make_train_step(
                cfg, model, tx, labels, donate=True,
                state_shardings=shardings,
            )
            for i in range(n_steps):
                state, metrics = step(state, sb, lrs(), np.int32(i))
        return state, metrics

    st_r, m_r = run(fsdp=False)
    st_f, m_f = run(fsdp=True)

    np.testing.assert_allclose(
        float(m_f["loss_total"]), float(m_r["loss_total"]), rtol=1e-5
    )
    for (k, _), a, b in zip(
        _specs(st_r.params).items(),
        jax.tree_util.tree_leaves(st_r.params),
        jax.tree_util.tree_leaves(st_f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-5, rtol=5e-4, err_msg=k,
        )

    # params REALLY shard over data (post-donation layout); the conv
    # backbone is exempt (conv-grad resharding triggers SPMD full remat)
    pspecs = _specs(st_f.params)
    sharded = [k for k, s in pspecs.items() if "data" in str(s)]
    assert any("q_proj/kernel" in k for k in sharded), sharded
    assert any("text_encoder" in k for k in sharded), sharded
    assert not any("backbone" in k for k in sharded), sharded
    kname = next(k for k in sharded if "q_proj/kernel" in k)
    leaf = {
        k: x
        for k, x in zip(pspecs, jax.tree_util.tree_leaves(st_f.params))
    }[kname]
    shard_elems = np.prod(leaf.addressable_shards[0].data.shape)
    assert shard_elems * 4 == np.prod(leaf.shape), (shard_elems, leaf.shape)
    # moments are sharded too (fsdp implies zero)
    assert any("data" in str(s) for s in _specs(st_f.opt_state).values())


def test_tp_non_divisible_heads_replicate():
    """nheads % model != 0: attention projections must fall back to
    replication instead of splitting a head across shards."""
    cfg, model, batch, variables = _setup(b=2)
    specs = tp_param_pspecs(
        variables["params"], model=3, nheads=cfg.nheads,  # 4 % 3 != 0
        text_heads=cfg.text_heads,
    )
    for path, s in jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P)
    )[0]:
        k = "/".join(str(getattr(p, "key", p)) for p in path)
        if any(t in k for t in ("q_proj", "k_proj", "v_proj", "out_proj")):
            assert "model" not in str(s), (k, s)
