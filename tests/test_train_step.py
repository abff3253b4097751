"""End-to-end training-step tests on the virtual 8-device CPU mesh:
pjit sharding compiles+executes, loss decreases, EMA updates, frozen params
stay frozen (SURVEY.md §4 multi-device simulation strategy).

All assertions share ONE jitted program + mesh (compiles are the dominant
cost on the CPU test machine)."""

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=2,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=True,
        sted=True,
        aux_loss=True,
        ema=True,
        dropout=0.0,
    )
    base.update(kw)
    return TubeDETRConfig(**base)


def lrs():
    return {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }


def test_train_step_on_data_time_mesh():
    cfg = tiny_cfg()
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(4, t=cfg.video_max_len_train)
    batch, meta = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        **{
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k not in ("target_boxes", "inter_idx", "time_mask")
        },
    )
    state, tx, labels = create_train_state(cfg, variables)

    mesh = make_mesh(data=4, time=2)
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, model, tx, labels, donate=False)
        losses, grad_norms = [], []
        first_state = None
        for i in range(8):
            st, metrics = step(st, sharded, lrs(), np.int32(i))
            if first_state is None:
                first_state = st
            losses.append(float(metrics["loss_total"]))
            grad_norms.append(float(metrics["grad_norm"]))

    # --- loss decreases, metrics finite --------------------------------
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert int(st.step) == 8
    assert all(np.isfinite(grad_norms))

    # --- frozen params unchanged, trainable moved ----------------------
    before = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    after = np.asarray(st.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(before, after)  # stem always frozen
    l1b = np.asarray(state.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    l1a = np.asarray(st.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(l1b, l1a)  # layer1 always frozen
    l2b = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    l2a = np.asarray(st.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(l2a - l2b).max() > 0  # layer2 trains

    # --- EMA follows the exact update rule after step 1 ----------------
    p0 = np.asarray(
        state.params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"]
    )
    p1 = np.asarray(
        first_state.params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"]
    )
    e1 = np.asarray(
        first_state.ema_params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"]
    )
    np.testing.assert_allclose(
        e1, p0 * cfg.ema_decay + (1 - cfg.ema_decay) * p1, atol=1e-7
    )

    # --- buffers (FrozenBN stats) untouched ----------------------------
    b0 = np.asarray(state.buffers["backbone"]["bn1"]["running_var"])
    b1 = np.asarray(st.buffers["backbone"]["bn1"]["running_var"])
    np.testing.assert_array_equal(b0, b1)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_spmd_pathology_scan_trips():
    """The dry run must FAIL when GSPMD reports an involuntary full
    rematerialization (VERDICT r3 #2) — prove the fd-2 scan actually trips
    on the warning text, including when emitted below sys.stderr (XLA warns
    from C++)."""
    import os

    import pytest

    import __graft_entry__ as ge

    with pytest.raises(RuntimeError, match="Involuntary full remat"):
        with ge._scan_stderr_for_spmd_pathology():
            os.write(
                2,
                b"W0000 00:00:00 spmd_partitioner.cc:652] [SPMD] "
                b"Involuntary full rematerialization. The compiler cannot "
                b"go from sharding A to B efficiently.\n",
            )
    # and it is silent when the compile is clean
    with ge._scan_stderr_for_spmd_pathology():
        os.write(2, b"ordinary compile chatter\n")


def test_eval_step_uses_ema_params():
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        model_inputs,
    )

    cfg = tiny_cfg(dropout=0.0)
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(2, t=cfg.video_max_len_train)
    batch, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg, variables)
    # make EMA weights visibly different from the live params
    ema = jax.tree_util.tree_map(lambda p: p * 0.5, state.params)
    state = state.replace(ema_params=ema)

    out_live, _ = make_eval_step(cfg, model, ema=False)(state, batch)
    out_ema, _ = make_eval_step(cfg, model, ema=True)(state, batch)
    live = np.asarray(out_live["pred_boxes"])
    emab = np.asarray(out_ema["pred_boxes"])
    assert np.abs(live - emab).max() > 1e-4  # EMA weights actually used


def test_compact_bf16_input_path_bit_equal():
    """The transfer-optimized input path (bf16 host frames + compact
    valid-extent masks, data/collate.py) must be BIT-identical to the
    dense-f32 feed under compute_dtype=bfloat16: the model casts frames to
    the compute dtype at entry (models/tubedetr.py:153) and
    expand_pad_masks rebuilds exactly collate's dense masks."""
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        model_inputs,
    )

    cfg = tiny_cfg(dropout=0.0, compute_dtype="bfloat16", aux_loss=False,
                   guided_attn=False)
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(2, t=cfg.video_max_len_train)
    dense, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    compact, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len,
        frames_dtype="bfloat16", compact_pad_masks=True,
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(dense))
    state, _, _ = create_train_state(cfg, variables)
    step = make_eval_step(cfg, model)
    out_dense, loss_dense = step(state, dense)
    out_compact, loss_compact = step(state, compact)
    for k in out_dense:
        np.testing.assert_array_equal(
            np.asarray(out_dense[k]), np.asarray(out_compact[k]), err_msg=k
        )
    for k in loss_dense:
        np.testing.assert_array_equal(
            np.asarray(loss_dense[k]), np.asarray(loss_compact[k]),
            err_msg=k,
        )


def test_eval_step_exposes_per_query_outputs_for_sted_select():
    """Regression (round 5): make_eval_step's output filter must keep the
    per-query heads when --nq_select sted is configured — evaluate()'s
    `"pred_sted_queries" in outputs` guard (train/engine.py) otherwise
    silently falls back to query 0 and the flag is a no-op in the real CLI
    (this is exactly what the first nq study run measured). With the
    default nq_select=first the per-query tensors stay dropped to keep the
    device->host transfer lean."""
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        model_inputs,
    )

    samples = make_synthetic_batch_samples(2, t=8)
    for select, expect in (("sted", True), ("first", False)):
        cfg = tiny_cfg(dropout=0.0, num_queries=4, nq_select=select)
        model = build_model(cfg)
        batch, _ = collate(
            samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
        )
        variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
        state, _, _ = create_train_state(cfg, variables)
        out, _ = make_eval_step(cfg, model)(state, batch)
        assert ("pred_sted_queries" in out) is expect, (select, sorted(out))
        assert ("pred_boxes_queries" in out) is expect, (select, sorted(out))
        if expect:
            b, t = np.asarray(out["pred_boxes"]).shape[:2]
            assert np.asarray(out["pred_boxes_queries"]).shape == (b, t, 4, 4)
            assert np.asarray(out["pred_sted_queries"]).shape == (b, t, 4, 2)
