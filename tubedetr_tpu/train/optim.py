"""Optimizer, LR schedules and EMA for TubeDETR training.

Re-derives /root/reference/util/optim.py and the 3-param-group setup of
/root/reference/main.py:395-415 in optax:

* three LR groups — transformer/heads (``lr``), visual backbone
  (``lr_backbone``), text encoder (``text_encoder_lr``) — realised with
  ``optax.multi_transform`` over a label tree;
* frozen parameters (stem+layer1 always; layer2-4 when ``lr_backbone == 0``;
  text encoder when ``freeze_text_encoder``; everything when
  ``freeze_backbone``) get ``optax.set_to_zero``, mirroring
  ``requires_grad_(False)`` (/root/reference/models/backbone.py:82-89);
* the four per-step schedules of ``adjust_learning_rate``
  (/root/reference/util/optim.py:28-91) are implemented as pure functions of
  (epoch, step) returning multipliers, injected via ``optax.scale_by_schedule``
  -style stateless scaling (we pass the lr in the update for exactness);
* EMA: ``ema = ema * d + (1-d) * w`` tree-map over params AND buffers
  (the reference EMAs the full state_dict including FrozenBN buffers,
  /root/reference/util/optim.py:8-25 — buffers are constant here so the
  update is a no-op for them, but we keep them in the EMA tree for
  checkpoint-format parity).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tubedetr_tpu.config import TubeDETRConfig


class LRSchedule(NamedTuple):
    """Per-step multipliers for the three groups."""

    main: float
    backbone: float
    text: float


def schedule_gammas(
    cfg: TubeDETRConfig, epoch: int, curr_step: int, num_training_steps: int
) -> LRSchedule:
    """Multipliers applied to (lr, lr_backbone, text_encoder_lr) at a given
    (epoch, step). Matches /root/reference/util/optim.py:28-91."""
    num_warmup = round(cfg.fraction_warmup_steps * num_training_steps)

    def linear_warmup_decay():
        if curr_step < num_warmup:
            return float(curr_step) / float(max(1, num_warmup))
        return max(
            0.0,
            float(num_training_steps - curr_step)
            / float(max(1, num_training_steps - num_warmup)),
        )

    if cfg.schedule == "step":
        gamma = 0.1 ** (epoch // cfg.lr_drop)
        text_gamma = gamma
    elif cfg.schedule == "multistep":
        milestones = list(range(cfg.lr_drop, cfg.epochs, 50))
        gamma = 0.5 ** bisect_right(milestones, epoch)
        text_gamma = gamma
    elif cfg.schedule == "linear_with_warmup":
        gamma = 0.1 ** (epoch // cfg.lr_drop)
        text_gamma = linear_warmup_decay()
    elif cfg.schedule == "all_linear_with_warmup":
        text_gamma = linear_warmup_decay()
        gamma = text_gamma
    else:
        raise NotImplementedError(cfg.schedule)
    return LRSchedule(gamma, gamma, text_gamma)


def current_lrs(
    cfg: TubeDETRConfig, epoch: int, curr_step: int, num_training_steps: int
) -> Dict[str, float]:
    g = schedule_gammas(cfg, epoch, curr_step, num_training_steps)
    return {
        "lr": cfg.lr * g.main,
        "lr_backbone": cfg.lr_backbone * g.backbone,
        "lr_text_encoder": cfg.text_encoder_lr * g.text,
    }


# ---------------------------------------------------------------------------
# parameter grouping
# ---------------------------------------------------------------------------

ALWAYS_FROZEN_BACKBONE = ("conv1", "bn1", "layer1_")


def label_params(params: Dict, cfg: TubeDETRConfig) -> Dict:
    """Build the optax.multi_transform label tree.

    Groups: 'main', 'backbone', 'text', 'frozen'. Mirrors the param-group
    split of /root/reference/main.py:395-405 ("backbone" name match ->
    lr_backbone, "text_encoder" -> text_encoder_lr, rest -> lr) plus the
    requires_grad freezing rules.
    """

    def label(path: Tuple[str, ...]) -> str:
        top = path[0]
        if top == "backbone":
            if cfg.freeze_backbone or cfg.lr_backbone <= 0:
                return "frozen"
            if any(path[1].startswith(p) for p in ALWAYS_FROZEN_BACKBONE):
                return "frozen"
            return "backbone"
        if top == "text_encoder":
            return "frozen" if cfg.freeze_text_encoder else "text"
        return "main"

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: label(tuple(getattr(p, "key", str(p)) for p in path)),
        params,
    )
    del flat
    return labels


def build_optimizer(
    cfg: TubeDETRConfig, params: Dict
) -> Tuple[optax.GradientTransformation, Dict]:
    """AdamW (or SGD+momentum) at unit learning rate; the per-group LR is a
    runtime input to the train step (the reference adjusts LRs *per step*,
    /root/reference/engine.py:153), applied with ``scale_updates_by_lr``.

    With unit LR, ``optax.adamw`` produces ``-(adam_dir + wd * p)``; scaling
    that by the group LR reproduces torch AdamW's ``p -= lr*(adam + wd*p)``
    exactly. Frozen groups use ``set_to_zero`` which also allocates no
    optimizer state for them.

    Returns (transform, label_tree).
    """
    if cfg.optimizer == "sgd":
        active = lambda: optax.sgd(1.0, momentum=0.9)
    else:
        active = lambda: optax.adamw(
            1.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay
        )
    labels = label_params(params, cfg)
    transforms = {
        "main": active(),
        "backbone": active(),
        "text": active(),
        "frozen": optax.set_to_zero(),
    }
    # clip_max_norm == 0 means clipping DISABLED (reference engine.py guards
    # ``if max_norm > 0``); optax.clip_by_global_norm(0) would zero every
    # update instead.
    clip = (
        optax.clip_by_global_norm(cfg.clip_max_norm)
        if cfg.clip_max_norm > 0
        else optax.identity()
    )
    tx = optax.chain(clip, optax.multi_transform(transforms, labels))
    return tx, labels


def mask_frozen_grads(grads: Dict, labels: Dict) -> Dict:
    """Zero the gradients of frozen parameter groups BEFORE grad-clipping.

    The reference's frozen params have ``requires_grad=False`` so they carry
    no ``.grad`` at all — ``torch.nn.utils.clip_grad_norm_`` never sees them
    (/root/reference/engine.py:147-151 clips ``model.parameters()`` which
    skips grad-less tensors). JAX's ``value_and_grad`` computes gradients
    for EVERY param leaf, so without this mask the stem/layer1 (and other
    frozen) gradients would inflate the global norm and change the clip
    scaling of the trainable groups. Zeroing them up front restores the
    reference's clip semantics — and, because the zeroed leaves are never
    read, XLA dead-code-eliminates the frozen backward subgraph (the
    stem+layer1 VJP chain), trimming the training step.
    """
    return jax.tree_util.tree_map(
        lambda g, lab: jnp.zeros_like(g) if lab == "frozen" else g,
        grads,
        labels,
    )


def scale_updates_by_lr(updates: Dict, labels: Dict, lrs: Dict[str, jnp.ndarray]):
    """Multiply each update leaf by its group's current learning rate."""
    group_lr = {
        "main": lrs["lr"],
        "backbone": lrs["lr_backbone"],
        "text": lrs["lr_text_encoder"],
        "frozen": 0.0,
    }
    return jax.tree_util.tree_map(
        lambda u, lab: u * jnp.asarray(group_lr[lab], dtype=u.dtype),
        updates,
        labels,
    )


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------


def ema_update(ema_tree: Any, new_tree: Any, decay: float) -> Any:
    """w_ema = w_ema * decay + (1 - decay) * w  (reference util/optim.py:8-25)."""
    return jax.tree_util.tree_map(
        lambda e, w: e * decay + (1.0 - decay) * w, ema_tree, new_tree
    )
