"""The pjit-able training / evaluation steps.

One fused XLA program per step: forward (backbone -> text encoder ->
video-text encoder -> space-time decoder -> heads), losses, backward,
grad-clip, optimizer, EMA. Written over the *global* batch; under a Mesh the
``data``/``time`` shardings of the inputs make XLA shard the compute and
insert the psum for gradients (replacing the reference's DDP all-reduce,
SURVEY.md §2.8).

The per-step learning rates are runtime scalars (the reference adjusts LRs
every step, /root/reference/engine.py:153) so no recompilation across the
schedule.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.core.sharding import active_mesh_axis_names
from tubedetr_tpu.losses.criterion import SetCriterion
from tubedetr_tpu.train.optim import (
    build_optimizer,
    ema_update,
    mask_frozen_grads,
    scale_updates_by_lr,
)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(cfg: TubeDETRConfig, variables: Dict) -> tuple:
    """Build (state, tx, labels) from freshly-initialised model variables."""
    params = variables["params"]
    buffers = variables.get("buffers", {})
    tx, labels = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=buffers,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if cfg.ema else None,
    )
    return state, tx, labels


def expand_pad_masks(valid_hw, h: int, w: int):
    """(B, T, 2) int32 valid extents -> (B, T, h, w) bool pad mask (True =
    padded), the dense form ``data/collate.py`` builds host-side. Two iota
    compares — XLA fuses this into the mask's first consumer, so shipping
    compact extents removes ~(h*w)/2 bytes/frame of host->device traffic
    for free (collate ``compact_pad_masks``)."""
    ih = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 2)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 3)
    vh = valid_hw[..., 0][..., None, None]
    vw = valid_hw[..., 1][..., None, None]
    return ~((ih < vh) & (iw < vw))


def model_inputs(batch: Dict) -> Dict:
    keys = (
        "frames_slow",
        "slow_pad_mask",
        "tokens",
        "text_pad_mask",
        "durations",
        "frames_fast",
        "fast_pad_mask",
    )
    out = {k: batch[k] for k in keys if k in batch}
    for stream in ("slow", "fast"):
        if f"{stream}_valid_hw" in batch and f"{stream}_pad_mask" not in out:
            frames = out[f"frames_{stream}"]
            out[f"{stream}_pad_mask"] = expand_pad_masks(
                batch[f"{stream}_valid_hw"], frames.shape[2], frames.shape[3]
            )
    return out


def make_train_step(cfg: TubeDETRConfig, model, tx, labels, donate: bool = True,
                    extra_vars: Dict | None = None, state_shardings=None,
                    dynamic_extra_vars: bool = False,
                    deterministic: bool = False):
    """``extra_vars``: additional variable collections threaded into apply —
    e.g. calibrated ``{"qscales": ...}`` when ``backbone_quant_fast`` runs
    the gradient-free fast-stream backbone pass in int8_static. By default
    they close over the step (baked as XLA constants); with
    ``dynamic_extra_vars`` the step takes them as a FIFTH argument instead,
    so refreshed values (per-epoch recalibration) reuse the compiled
    executable — same shapes, no retrace.

    ``state_shardings``: a TrainState-shaped tree of NamedShardings (from
    ``parallel.mesh.shard_opt_state_along_data``) pinning the ZeRO-style
    optimizer-state layout on the output, so the sharded moments stay
    sharded across steps instead of drifting to whatever GSPMD infers.

    ``deterministic``: disable dropout in the forward (test hook: the
    gradient golden-parity test compares against a torch reference whose
    dropout masks cannot be reproduced in JAX, so both sides run the
    dropout-free graph). Production training keeps the default False."""
    criterion = SetCriterion(cfg)

    def step_fn(state: TrainState, batch: Dict, lrs: Dict[str, jnp.ndarray],
                dropout_seed: jnp.ndarray, dyn_vars: Dict | None = None):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), dropout_seed)
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params, b, mrng, num_boxes=None, mean_scale=1.0):
            apply_vars = {"params": params, "buffers": state.buffers}
            if extra_vars:
                apply_vars.update(extra_vars)
            if dyn_vars:
                apply_vars.update(dyn_vars)
            outputs = model.apply(
                apply_vars,
                **model_inputs(b),
                deterministic=deterministic,
                train=True,
                rngs=None if deterministic else {"dropout": mrng},
            )
            losses = criterion(
                outputs,
                b["target_boxes"],
                b["inter_idx"],
                b["time_mask"],
                num_boxes=num_boxes,
                mean_scale=mean_scale,
            )
            return criterion.total(losses), losses

        accum = max(int(cfg.grad_accum), 1)
        if accum == 1:
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, rng)
        else:
            # gradient accumulation (--grad_accum): ONE scan'd
            # forward+backward body over equal microbatches — XLA compiles
            # the microbatch program once and frees its activations every
            # iteration, so peak memory is one microbatch plus the grad
            # buffer. Exactness vs the big-batch step: the criterion's
            # num_boxes-normalized losses share the GLOBAL denominator
            # (computed here over the full batch) and its batch-mean losses
            # are scaled by 1/accum, so summing microbatch grads reproduces
            # the big-batch gradient bit-for-bit modulo float reassociation
            # (tests/test_grad_accum.py); the single clip + optimizer step
            # below then matches torch accumulate-then-clip semantics.
            from tubedetr_tpu.core.masking import inter_positive_map

            t = batch["time_mask"].shape[1]
            positive = (
                inter_positive_map(batch["inter_idx"], t)
                & batch["time_mask"]
            )
            num_boxes = positive.sum().astype(jnp.float32)
            micro = {
                k: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                for k, v in batch.items()
            }
            names = active_mesh_axis_names()
            if names is not None:
                # Under a mesh, pin each microbatch to the SAME per-field
                # layout shard_batch gave the full batch (scan dim
                # replicated): GSPMD's natural propagation through the
                # (B,) -> (accum, B/accum) reshape shards the scan dim
                # instead, which would park each microbatch on one data
                # shard and serialize the devices.
                from jax.sharding import PartitionSpec as P

                from tubedetr_tpu.parallel.mesh import batch_pspec

                micro = {
                    k: jax.lax.with_sharding_constraint(
                        v,
                        P(None, *(a if a in names else None
                                  for a in batch_pspec(k))),
                    )
                    for k, v in micro.items()
                }
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, xs):
                grad_sum, tot_sum = carry
                mb, i = xs
                (tot, mlosses), g = grad_fn(
                    state.params, mb, jax.random.fold_in(rng, i),
                    num_boxes, 1.0 / accum,
                )
                grad_sum = jax.tree_util.tree_map(
                    lambda a, b: a + b, grad_sum, g
                )
                return (grad_sum, tot_sum + tot), mlosses

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, total), stacked = jax.lax.scan(
                body,
                (zeros, jnp.zeros((), jnp.float32)),
                (micro, jnp.arange(accum)),
            )
            losses = jax.tree_util.tree_map(lambda x: x.sum(0), stacked)
        # reference clip semantics: frozen params carry no grad there, so
        # they must not contribute to the global clip norm (this also lets
        # XLA eliminate the frozen stem/layer1 backward subgraph)
        grads = mask_frozen_grads(grads, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates_by_lr(updates, labels, lrs)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = dict(losses)
        metrics["loss_total"] = total
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    kwargs = {}
    if state_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = jax.tree_util.tree_leaves(
            state_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
        )[0].mesh
        # metrics are scalars -> replicated
        kwargs["out_shardings"] = (
            state_shardings,
            NamedSharding(mesh, PartitionSpec()),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else (), **kwargs)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(cfg: TubeDETRConfig, model, ema: bool = False,
                   extra_vars: Dict | None = None):
    """``extra_vars``: additional variable collections threaded into apply —
    e.g. calibrated ``{"qscales": ...}`` for int8_static eval (the TrainState
    itself carries only params/buffers). Baked extra_vars are XLA
    constants; values that change across calls (per-epoch recalibrated
    scales) must instead be passed as the step's optional THIRD argument
    (same shapes -> the compiled executable is reused, no retrace)."""
    criterion = SetCriterion(cfg)

    def step_fn(state: TrainState, batch: Dict,
                dyn_vars: Dict | None = None):
        params = state.ema_params if (ema and state.ema_params is not None) else state.params
        apply_vars = {"params": params, "buffers": state.buffers}
        if extra_vars:
            apply_vars.update(extra_vars)
        if dyn_vars:
            apply_vars.update(dyn_vars)
        outputs = model.apply(
            apply_vars,
            **model_inputs(batch),
            deterministic=True,
        )
        losses = {}
        if "target_boxes" in batch:
            losses = criterion(
                outputs,
                batch["target_boxes"],
                batch["inter_idx"],
                batch["time_mask"],
            )
        keep_keys = ["pred_boxes", "pred_sted", "weights", "ca_weights"]
        if cfg.num_queries > 1 and cfg.nq_select in ("sted", "objectness"):
            # evaluate() re-selects the winning query from the per-query
            # heads (models/postprocess.py:select_query_by_sted /
            # select_query_by_objectness); without these keys its
            # `in outputs` guard silently falls back to query 0 and the
            # flag is a no-op in the real CLI
            keep_keys += [
                "pred_boxes_queries", "pred_sted_queries", "pred_obj_queries",
            ]
        keep = {k: outputs[k] for k in keep_keys if k in outputs}
        return keep, losses

    return jax.jit(step_fn)
