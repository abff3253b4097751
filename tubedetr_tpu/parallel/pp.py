"""Pipeline parallelism: GPipe-style microbatch pipelining over a ``pipe``
mesh axis.

The reference's only distribution strategy is NCCL data parallelism
(/root/reference/util/dist.py:210-247); it has no pipeline path. This module
adds the textbook TPU pipeline — the scan+ppermute pattern — as a generic
runner for stacks of identical layers:

* the stacked layer parameters (leading axis ``L``) are reshaped to
  ``(P, L/P, ...)`` and the STAGE axis is sharded over ``pipe``: each device
  holds only its ``L/P`` layers' weights;
* the independent work units (clips for the TubeDETR encoder, batch elements
  for generic stacks) are grouped into ``M`` microbatches;
* inside ``shard_map`` every device runs the same ``M + P - 1``-tick scan:
  stage 0 injects microbatch ``t``, stage ``i`` processes the activation it
  received last tick (microbatch ``t - i``), and a single
  ``lax.ppermute`` over the open chain ``i -> i+1`` moves activations one
  hop per tick. Bubble ticks compute garbage that is never written to the
  output buffer; the last stage collects results and a final ``psum``
  replicates them (devices other than the last contribute zeros).

Because ``ppermute`` / ``scan`` / ``dynamic_slice`` all have transposes, the
whole pipeline is differentiable: ``jax.grad`` through ``pipeline_apply``
yields the reverse (backward) pipeline schedule automatically — XLA's
transpose of the forward chain is the backward chain.

Where it pays (and where it does not — the honest adjudication is in
docs/SCALING.md): per tick each stage computes ``cost(layer) * L/P`` and
communicates one microbatch activation over ICI; the pipeline is efficient
when that compute dwarfs the hop and ``M >> P`` shrinks the bubble
(efficiency = M / (M + P - 1)). TubeDETR's decoder/encoder layers at
d_model=256 are far below that bar on real chips — the mechanism is general
framework capability, validated for numerics and collectives, not a win for
the flagship config.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_trees: list) -> Any:
    """Stack per-layer parameter trees (identical structure) along a new
    leading ``L`` axis — e.g. ``[params['layer_0'], ..., params['layer_5']]``
    from the unstacked checkpoint layout."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_trees
    )


def _to_stage_major(stacked: Any, n_stages: int) -> Any:
    """(L, ...) -> (P, L/P, ...): contiguous layer groups per stage."""

    def reshape(a):
        l = a.shape[0]
        assert l % n_stages == 0, (l, n_stages)
        return a.reshape((n_stages, l // n_stages) + a.shape[1:])

    return jax.tree_util.tree_map(reshape, stacked)


def pipeline_apply(
    layer_fn: Callable[[Any, Any, Any], Any],
    stacked_params: Any,
    x: Any,
    aux: Any,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pipe",
    collect: bool = False,
):
    """Run ``x`` through a stack of L identical layers, pipelined over the
    ``axis`` dimension of ``mesh``.

    ``layer_fn(params_i, y, aux_m) -> y``: ONE layer. Its activation ``y``
    must have the same pytree structure/shapes in and out (the carried
    pipeline state). ``aux_m`` is the per-unit side input (positional
    embeddings, padding masks, ...) — it does not travel through the
    pipeline; each stage re-indexes it by the microbatch id it is currently
    processing.

    ``stacked_params``: leaves ``(L, ...)`` (see ``stack_layer_params``).
    ``x`` / ``aux``: leaves ``(N, ...)`` with ``N % microbatches == 0``.

    Returns leaves ``(N, ...)``, replicated over the mesh, numerically equal
    to the sequential ``for i in range(L): y = layer_fn(p[i], y, aux)``.

    ``collect=True`` (per-layer outputs, e.g. the decoder's aux-loss heads):
    ``layer_fn(params_i, y, aux_m) -> (y, extra)`` where ``extra`` is any
    pytree of per-unit outputs; each stage accumulates its own layers'
    extras locally and one tiled all-gather over ``axis`` assembles the
    stage-ordered ``(L, N, ...)`` stack — extras never travel through the
    pipeline. Returns ``(final, extras)``.
    """
    n_stages = mesh.shape[axis]
    m = microbatches
    stage_params = _to_stage_major(stacked_params, n_stages)

    n = jax.tree_util.tree_leaves(x)[0].shape[0]
    assert n % m == 0, f"units {n} not divisible by microbatches {m}"
    mb = n // m

    def to_mb(tree):
        return jax.tree_util.tree_map(
            lambda a: a.reshape((m, mb) + a.shape[1:]), tree
        )

    x_mb, aux_mb = to_mb(x), to_mb(aux)

    # every other mesh axis is unused here: replicate inputs/outputs over
    # them and shard only the stage axis of the parameters
    def spec(*names):
        return P(*names)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec(axis), spec(), spec()),
        out_specs=spec(),
        check_vma=False,
    )
    def run(local_params, x_mb, aux_mb):
        # local stage: (1, L/P, ...) -> (L/P, ...)
        local = jax.tree_util.tree_map(lambda a: a[0], local_params)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == n_stages - 1

        def stage(y, aux_m):
            # apply this stage's L/P layers in order
            def body(y, p_i):
                if collect:
                    return layer_fn(p_i, y, aux_m)
                return layer_fn(p_i, y, aux_m), None

            return jax.lax.scan(body, y, local)  # (y, extras (Lps, ...))

        def pick(tree, t):
            i = jnp.clip(t, 0, m - 1)
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, axis=0, keepdims=False
                ),
                tree,
            )

        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def masked_write(buf, v, pos, valid, ax):
            # write v at buf[.., pos, ..] only when valid (bubble ticks
            # compute garbage that must not land anywhere)
            pos = jnp.clip(pos, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(buf, pos, ax, keepdims=False)
            return jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, v, cur), pos, axis=ax
            )

        def tick(carry, t):
            state, out, ext = carry
            # stage idx processes microbatch t - idx at tick t
            m_id = t - idx
            inp = jax.tree_util.tree_map(
                lambda a, b: jnp.where(is_first, a, b),
                pick(x_mb, m_id),
                state,
            )
            y, extras = stage(inp, pick(aux_mb, m_id))
            if n_stages > 1:
                nxt = jax.lax.ppermute(y, axis, perm)
            else:
                nxt = y
            # last stage finishes microbatch t - (P-1) at tick t
            done = t - (n_stages - 1)
            out = jax.tree_util.tree_map(
                lambda buf, v: masked_write(
                    buf, v, done, is_last & (done >= 0), 0
                ),
                out,
                y,
            )
            if collect:
                # every stage records ITS layers' extras for microbatch m_id
                valid = (m_id >= 0) & (m_id < m)
                ext = jax.tree_util.tree_map(
                    lambda buf, v: masked_write(buf, v, m_id, valid, 1),
                    ext,
                    extras,
                )
            return (nxt, out, ext), None

        out0 = jax.tree_util.tree_map(jnp.zeros_like, x_mb)
        state0 = pick(out0, 0)
        if collect:
            ext_shape = jax.eval_shape(stage, state0, pick(aux_mb, 0))[1]
            ext0 = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(
                    sh.shape[:1] + (m,) + sh.shape[1:], sh.dtype
                ),
                ext_shape,
            )  # (L/P, M, mb, ...)
        else:
            ext0 = None
        (_, out, ext), _ = jax.lax.scan(
            tick, (state0, out0, ext0), jnp.arange(m + n_stages - 1)
        )
        # replicate the last stage's buffer to every device
        out = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(
                jnp.where(is_last, a, jnp.zeros_like(a)), axis
            ),
            out,
        )
        if collect:
            # stage-ordered (L/P, ...) slices -> (L, ...): stages hold
            # contiguous layer groups, so a tiled gather IS layer order
            ext = jax.tree_util.tree_map(
                lambda a: jax.lax.all_gather(a, axis, axis=0, tiled=True),
                ext,
            )
            return out, ext
        return out

    def un_mb(tree, lead):
        return jax.tree_util.tree_map(
            lambda a: a.reshape(lead + (n,) + a.shape[len(lead) + 2:]), tree
        )

    if collect:
        out_mb, ext_mb = run(stage_params, x_mb, aux_mb)
        # ext leaves: (L, M, mb, ...) -> (L, N, ...); reshape needs the
        # (M, mb) axes adjacent and leading-after-L, which they are
        ext = jax.tree_util.tree_map(
            lambda a: a.reshape((a.shape[0], n) + a.shape[3:]), ext_mb
        )
        return un_mb(out_mb, ()), ext
    out_mb = run(stage_params, x_mb, aux_mb)
    return un_mb(out_mb, ())


def encoder_stack_params(params: Any) -> Any:
    """Stack the TubeDETR transformer encoder's per-layer trees
    (``params['transformer']['encoder']['layer_{i}']`` — the unstacked
    checkpoint layout, models/transformer.py:Encoder) into the (L, ...)
    layout ``pipeline_apply`` consumes."""
    enc = params["transformer"]["encoder"]
    layers = [enc[f"layer_{i}"] for i in range(len(enc))]
    return stack_layer_params(layers)


def pipelined_encoder_apply(
    stacked: Any,
    x: jnp.ndarray,  # (N, S, D) per-clip token sequences (N = B * Tc)
    pos: jnp.ndarray,  # (N, S, D)
    key_pad_mask: jnp.ndarray,  # (N, S) True = pad
    *,
    mesh: Mesh,
    microbatches: int,
    d_model: int,
    nheads: int,
    dim_feedforward: int,
    dtype=jnp.float32,
    axis: str = "pipe",
) -> jnp.ndarray:
    """The TubeDETR space-text encoder stack, pipelined over ``axis``:
    clips are the independent work units (the encoder attends within one
    clip — SURVEY.md §5.7), so ``N = B * Tc`` clips stream through the
    layer stages in ``microbatches`` groups. Numerically equal to the
    in-model sequential stack (tests/test_pipeline.py)."""
    from tubedetr_tpu.models.transformer import EncoderLayer

    layer = EncoderLayer(
        d_model, nheads, dim_feedforward, dropout=0.0, dtype=dtype
    )

    def layer_fn(p, y, aux):
        pos_m, mask_m = aux
        out, _ = layer.apply({"params": p}, y, pos_m, mask_m)
        return out

    return pipeline_apply(
        layer_fn,
        stacked,
        x,
        (pos, key_pad_mask),
        mesh=mesh,
        microbatches=microbatches,
        axis=axis,
    )


def decoder_stack_params(params: Any) -> Any:
    """Stack the decoder's per-layer trees (the unstacked checkpoint layout
    ``params['transformer']['decoder']['layer_{i}']``; the shared final
    ``norm`` is NOT a layer — apply it to the collected stack afterwards,
    exactly as models/transformer.py:Decoder does)."""
    dec = params["transformer"]["decoder"]
    n = sum(1 for k in dec if k.startswith("layer_"))
    return stack_layer_params([dec[f"layer_{i}"] for i in range(n)])


def pipelined_decoder_apply(
    stacked: Any,
    tgt: jnp.ndarray,  # (B, T*nq, D) frame-major time queries
    query_pos: jnp.ndarray,  # (B, T*nq, D)
    memory: jnp.ndarray,  # (B, T, S, D)
    memory_pos: jnp.ndarray,  # (B, T, S, D)
    memory_pad_mask: jnp.ndarray,  # (B, T, S)
    query_pad_mask: jnp.ndarray,  # (B, T*nq)
    *,
    mesh: Mesh,
    microbatches: int,
    d_model: int,
    nheads: int,
    dim_feedforward: int,
    no_tsa: bool = False,
    dtype=jnp.float32,
    axis: str = "pipe",
):
    """The space-time decoder stack, pipelined over ``axis`` with VIDEOS as
    the work units (TSA attends across a video's own frames only, so batch
    elements are independent). Collects every layer's output + TSA/cross
    attention weights — the aux-loss surface — via the ``collect`` path:
    returns ``(hs, tsa_w, cross_w)`` stacks of leaves ``(L, B, ...)``,
    PRE-norm (apply the decoder's shared final LayerNorm to ``hs``, as the
    in-model Decoder does for every intermediate)."""
    from tubedetr_tpu.models.transformer import DecoderLayer

    layer = DecoderLayer(
        d_model, nheads, dim_feedforward, dropout=0.0, no_tsa=no_tsa,
        dtype=dtype,
    )

    def layer_fn(p, y, aux):
        qp, mem, mpos, mmask, qpad = aux
        out, w, cw = layer.apply({"params": p}, y, qp, mem, mpos, mmask, qpad)
        return out, {"h": out, "tsa": w, "cross": cw}

    _, extras = pipeline_apply(
        layer_fn,
        stacked,
        tgt,
        (query_pos, memory, memory_pos, memory_pad_mask, query_pad_mask),
        mesh=mesh,
        microbatches=microbatches,
        axis=axis,
        collect=True,
    )
    return extras["h"], extras["tsa"], extras["cross"]


def make_pipe_mesh(pipe: int, data: int = 1,
                   devices: Optional[list] = None) -> Mesh:
    """A (data, pipe) mesh for the pipeline tests/dryrun; ``pipe`` innermost
    so stage hops ride the fastest ICI links."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    need = data * pipe
    assert need <= len(devices), (data, pipe, len(devices))
    return Mesh(
        np.asarray(devices[:need]).reshape(data, pipe),
        axis_names=("data", "pipe"),
    )


def place_stacked_params(stacked: Any, mesh: Mesh, n_stages: int,
                         axis: str = "pipe") -> Any:
    """Shard stacked layer params stage-major over ``axis`` (each device
    keeps only its own stages' weights in HBM)."""
    staged = _to_stage_major(stacked, n_stages)
    sh = NamedSharding(mesh, P(axis))

    def back(a):  # keep the public (L, ...) layout; shard the L axis
        return a.reshape((-1,) + a.shape[2:])

    placed = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), staged
    )
    return jax.tree_util.tree_map(back, placed)
