"""Tensor (model) parallelism for the TubeDETR transformer stacks.

The reference's only distribution strategy is NCCL data parallelism
(/root/reference/util/dist.py:210-247, DDP in main.py:399-404); it has no
tensor-parallel path at all. On a TPU mesh we add a third ``model`` axis with
the classic Megatron split, expressed the XLA-native way: parameters are
*placed* with ``NamedSharding``s chosen by parameter path and GSPMD
propagates the layout through the computation, inserting the all-reduces at
exactly the row-parallel boundaries the hand-written Megatron collectives
would sit at. No model code changes — sharding is a placement concern, not
an architecture concern.

Split choices (per transformer layer):

* attention ``q/k/v_proj``: column-parallel — kernel ``(D, D)`` sharded on
  the output dim, biases likewise. The head reshape ``D -> (h, hd)`` keeps
  whole heads per shard because we only engage the rule when
  ``nheads % model == 0``, so the attention einsums partition over heads with
  zero communication.
* attention ``out_proj``: row-parallel — kernel sharded on the *input* dim,
  bias replicated; GSPMD inserts the single psum that completes the layer.
* FFN ``linear1``/``intermediate``: column-parallel; ``linear2``/``output``
  (RoBERTa naming): row-parallel. The ReLU lives entirely in the sharded
  middle dim.
* RoBERTa embedding tables: sharded on the hidden dim (a lookup gathers each
  shard's slice locally; the following LayerNorm triggers one all-gather).

Everything else — the conv backbone, norms, heads, time/query embeddings —
stays replicated: the backbone is already embarrassingly parallel over
frames (the ``time`` mesh axis shards it with zero intra-frame
communication), and the norm/head parameters are KBs.

ZeRO-1 composition: optimizer moments and EMA leaves FOLLOW the parameter's
model-axis spec (a moment of a sharded weight lives with its shard) and may
*additionally* shard a remaining free axis over ``data`` — see
``shard_train_state``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tubedetr_tpu.parallel.mesh import _place_like

# column-parallel Dense modules: kernel (in, out) shards the OUTPUT dim
_COL = {"q_proj", "k_proj", "v_proj", "linear1", "intermediate"}
# row-parallel Dense modules: kernel (in, out) shards the INPUT dim
_ROW = {"out_proj", "linear2", "output"}
_ATTN_PROJ = {"q_proj", "k_proj", "v_proj", "out_proj"}
_EMBED = {"word_embeddings", "position_embeddings", "token_type_embeddings"}


def _path_strings(path) -> tuple:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def tp_spec_for_path(
    path: tuple,
    shape: tuple,
    model: int,
    nheads: int,
    text_heads: int,
) -> P:
    """PartitionSpec over the ``model`` axis for one parameter (or optimizer
    moment — optax moment trees carry the parameter path as a suffix, so the
    same rule applies verbatim).

    Non-divisible shapes and every unmatched path replicate — the guard that
    keeps arbitrary (tiny-test) configs runnable on any mesh.
    """
    keys = _path_strings(path)
    if len(keys) < 2 or model <= 1:
        return P()
    leaf, mod = keys[-1], keys[-2]

    if leaf == "embedding" and mod in _EMBED:
        # shard the hidden dim: lookups stay local, LN gathers once
        if shape[-1] % model == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
        return P()

    if leaf not in ("kernel", "bias"):
        return P()
    if mod in _ATTN_PROJ:
        heads = text_heads if "text_encoder" in keys else nheads
        if heads % model != 0:
            return P()
    if mod in _COL:
        if shape[-1] % model == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
        return P()
    if mod in _ROW and leaf == "kernel":
        if shape[0] % model == 0:
            return P(*(["model"] + [None] * (len(shape) - 1)))
        return P()
    return P()  # row-parallel biases + everything else: replicated


def tp_param_pspecs(params: Any, model: int, nheads: int,
                    text_heads: int) -> Any:
    """Tree of PartitionSpecs (same structure as ``params``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: tp_spec_for_path(
            path, np.shape(x), model, nheads, text_heads
        ),
        params,
    )


def _with_data_axis(spec: P, shape: tuple, n_data: int) -> P:
    """Add ZeRO-style ``data`` sharding on the first still-free, divisible
    axis of an (optionally already model-sharded) leaf."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for i, (d, e) in enumerate(zip(shape, entries)):
        if e is None and d >= n_data and d % n_data == 0:
            entries[i] = "data"
            return P(*entries)
    return P(*entries) if any(e is not None for e in entries) else P()


def shard_train_state(
    state: Any,
    mesh: Mesh,
    *,
    nheads: int,
    text_heads: int,
    zero: bool = False,
    fsdp: bool = False,
    shard_ema: bool = True,
):
    """Place a TrainState for tensor parallelism (+ optional ZeRO-1/FSDP).

    * params / buffers: model-axis TP specs (buffers are backbone BN stats —
      always replicated by the path rules). With ``fsdp`` the parameters
      ADDITIONALLY shard a free dim over ``data`` (ZeRO-3-style: GSPMD
      all-gathers each layer's weights at its use site and the gather is
      overlapped/scheduled by XLA — per-chip param memory drops
      ~(1 - 1/n_data) at the cost of one all-gather per layer per step).
      The conv BACKBONE is exempt: resharding conv-kernel gradients from
      the activation layout to a data-sharded one triggers SPMD
      "involuntary full rematerialization" (measured on the dryrun mesh),
      and the backbone is <25% of parameters — the transformer + RoBERTa
      stacks are where FSDP pays;
    * opt_state moments: the owning parameter's TP spec (path-suffix match),
      plus a ``data`` axis on a free dim when ``zero`` or ``fsdp``;
    * ema_params: same as moments (they are parameter-shaped).

    Returns ``(placed_state, sharding_tree)`` — pass the sharding tree as
    ``make_train_step(..., state_shardings=...)`` to pin the layout across
    donated steps.
    """
    model = mesh.shape.get("model", 1)
    n_data = mesh.shape["data"]
    zero = zero or fsdp  # param-sharded training keeps its moments sharded

    def param_sharding(path, x):
        spec = tp_spec_for_path(path, np.shape(x), model, nheads, text_heads)
        if fsdp and n_data > 1 and "backbone" not in _path_strings(path):
            spec = _with_data_axis(spec, np.shape(x), n_data)
        return NamedSharding(mesh, spec)

    def moment_sharding(path, x):
        spec = tp_spec_for_path(path, np.shape(x), model, nheads, text_heads)
        if zero and n_data > 1:
            spec = _with_data_axis(spec, np.shape(x), n_data)
        return NamedSharding(mesh, spec)

    def buffer_sharding(path, x):
        # BN stats: KBs, forward-only — never worth an FSDP gather
        spec = tp_spec_for_path(path, np.shape(x), model, nheads, text_heads)
        return NamedSharding(mesh, spec)

    def map_with_path(tree, fn):
        return jax.tree_util.tree_map_with_path(fn, tree)

    shardings = state.replace(
        step=NamedSharding(mesh, P()),
        params=map_with_path(state.params, param_sharding),
        buffers=map_with_path(state.buffers, buffer_sharding),
        opt_state=map_with_path(state.opt_state, moment_sharding),
        ema_params=(
            map_with_path(
                state.ema_params,
                moment_sharding if shard_ema else param_sharding,
            )
            if state.ema_params is not None
            else None
        ),
    )
    return _place_like(state, shardings), shardings


def place_variables_tp(
    variables: dict, mesh: Mesh, *, nheads: int, text_heads: int
) -> dict:
    """Place an inference ``variables`` dict ({"params": ..., "buffers": ...,
    ...}) with TP shardings — extra collections (qscales etc.) replicate."""
    model = mesh.shape.get("model", 1)
    placed = {}
    for coll, tree in variables.items():
        if coll == "params":
            placed[coll] = _place_like(
                tree,
                jax.tree_util.tree_map_with_path(
                    lambda p, x: NamedSharding(
                        mesh,
                        tp_spec_for_path(
                            p, np.shape(x), model, nheads, text_heads
                        ),
                    ),
                    tree,
                ),
            )
        else:
            placed[coll] = jax.device_put(tree, NamedSharding(mesh, P()))
    return placed


def count_tp_sharded(params: Any, mesh: Mesh, *, nheads: int,
                     text_heads: int) -> int:
    """Number of leaves the TP rules actually shard (diagnostics/tests)."""
    model = mesh.shape.get("model", 1)
    specs = tp_param_pspecs(params, model, nheads, text_heads)
    return sum(
        1
        for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
        if any(e is not None for e in s)
    )
