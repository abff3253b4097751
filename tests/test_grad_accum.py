"""Gradient accumulation (``--grad_accum``, TPU extra).

The reference scales batch size only by adding DDP GPUs
(/root/reference/main.py batch_size is per-GPU); ``--grad_accum`` gives the
same effective-batch semantics on a single chip: the train step scans one
compiled forward+backward body over equal microbatches, sums the gradients,
and clips + steps ONCE (torch accumulate-then-clip). Exactness is the whole
contract — these tests pin the accumulated step to the big-batch step:

* the num_boxes-normalized losses (boxes, objectness) share the GLOBAL
  denominator across microbatches (criterion ``num_boxes`` override),
* the batch-mean losses (sted, guided-attn) are scaled by 1/accum
  (criterion ``mean_scale``),

so a RAGGED batch — where the microbatches contain different numbers of
annotated frames and per-micro normalization would diverge — must still
reproduce the big-batch step to float-reassociation tolerance.
"""

import numpy as np
import pytest

import jax

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_sample
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    model_inputs,
)

TINY = dict(
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
    text_layers=1,
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


def lrs():
    return {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }


def ragged_batch(cfg, n=4):
    # different per-sample durations -> microbatches carry different
    # annotated-frame counts (the case that distinguishes global from
    # per-microbatch num_boxes normalization)
    samples = [
        make_synthetic_sample(i, t=cfg.video_max_len_train - (i % 3))
        for i in range(n)
    ]
    batch, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    return batch


@pytest.mark.quick
def test_config_validates_grad_accum():
    base = dict(TINY, batch_size=4)
    TubeDETRConfig(grad_accum=2, **base).validate()
    with pytest.raises(ValueError):
        TubeDETRConfig(grad_accum=0, **base).validate()
    with pytest.raises(ValueError):
        TubeDETRConfig(grad_accum=3, **base).validate()  # 4 % 3 != 0


def test_grad_accum_composes_with_data_mesh():
    """--grad_accum under a (data, time) mesh: the accumulated step
    compiles and executes with the batch sharded over ``data`` (the
    microbatch reshape keeps a leading device-divisible dim) and matches
    the same accumulated step run unsharded."""
    from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = TubeDETRConfig(batch_size=4, grad_accum=2, **TINY)
    model = build_model(cfg)
    batch = ragged_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg, variables)
    step = make_train_step(cfg, model, tx, labels, donate=False,
                           deterministic=True)

    st_plain, m_plain = step(state, batch, lrs(), np.int32(0))

    mesh = make_mesh(data=2, time=2)
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        st_mesh, m_mesh = step(st, sharded, lrs(), np.int32(0))

    np.testing.assert_allclose(
        float(m_plain["loss_total"]), float(m_mesh["loss_total"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(m_plain["grad_norm"]), float(m_mesh["grad_norm"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(st_plain.params)
    b = jax.tree_util.tree_leaves(st_mesh.params)
    for x, y in zip(a, b):
        # same AdamW atol floor as the big-batch legs below: shift-invariant
        # leaves carry pure-cancellation grads whose cross-shard psum
        # reassociation AdamW's eps amplifies to ~1e-6 update noise
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5
        )


@pytest.mark.quick
@pytest.mark.parametrize(
    "extra,param_rtol,param_atol",
    [
        # AdamW first-step updates are ~sign(g)*lr — nearly grad-scale-
        # INVARIANT — so the scale-exactness evidence for these two legs is
        # the per-key loss metrics on the ragged batch (every normalizer
        # shows in its loss value); the params check needs an absolute
        # floor because shift-invariant leaves (e.g. the sted head's final
        # bias under the softmax) carry pure-cancellation grads (~1e-11)
        # that AdamW's eps turns into ~1e-6 update noise either way
        (dict(), 2e-4, 2e-5),
        (dict(num_queries=2), 2e-4, 2e-5),
        # SGD with clipping DISABLED: update == -lr * accumulated grad,
        # LINEAR in the gradient — this leg pins gradient-level exactness
        # (any normalization error scales params directly)
        (dict(optimizer="sgd", clip_max_norm=0.0), 1e-5, 1e-7),
    ],
)
def test_grad_accum_matches_big_batch_step(extra, param_rtol, param_atol):
    """One accumulated step == one big-batch step: same new params, same
    EMA, same reported losses (incl. the aux-expanded mean-type terms) and
    the same post-mask grad_norm — on a ragged batch, with the full
    published loss surface on (and, parametrized, the nq>1 Hungarian
    + objectness path whose matching runs per-microbatch)."""
    cfg1 = TubeDETRConfig(batch_size=4, grad_accum=1, **TINY, **extra)
    model = build_model(cfg1)
    batch = ragged_batch(cfg1)
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg1, variables)

    results = {}
    for accum in (1, 2, 4):
        cfg = TubeDETRConfig(
            batch_size=4, grad_accum=accum, **TINY, **extra
        )
        # deterministic=True: dropout draws differ between the scanned and
        # unscanned programs by construction; the semantics under test are
        # the loss/grad normalization and the single clip+step
        step = make_train_step(cfg, model, tx, labels, donate=False,
                               deterministic=True)
        new_state, metrics = step(state, batch, lrs(), np.int32(0))
        results[accum] = (new_state, metrics)

    ref_state, ref_metrics = results[1]
    for accum in (2, 4):
        st, metrics = results[accum]
        # reported losses are the big-batch values (not per-micro means)
        for k, v in ref_metrics.items():
            np.testing.assert_allclose(
                float(v), float(metrics[k]), rtol=2e-4, atol=1e-6,
                err_msg=f"metric {k} accum={accum}",
            )
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
        flat_acc = dict(
            jax.tree_util.tree_leaves_with_path(st.params)
        )
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_acc[path]),
                rtol=param_rtol, atol=param_atol,
                err_msg=f"param {jax.tree_util.keystr(path)} accum={accum}",
            )
        e_ref = jax.tree_util.tree_leaves(ref_state.ema_params)
        e_acc = jax.tree_util.tree_leaves(st.ema_params)
        for a, b in zip(e_ref, e_acc):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol=param_rtol, atol=param_atol,
            )
        assert int(st.step) == 1
