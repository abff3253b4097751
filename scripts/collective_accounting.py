"""Communication accounting for the sharded programs (VERDICT r3 #4).

One real chip means multi-chip efficiency cannot be wall-clocked — so this
script produces the next-best artifact: the EXACT collective inventory of
each compiled mesh leg (what GSPMD actually inserted: kinds, mesh axes,
bytes per step), plus a v5e-8 ICI time projection. Run on the 8-virtual-
device CPU platform:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_accounting.py

ACC_SIZE=tiny (default, the dryrun config — fast compiles, used by
tests/test_collectives.py) or ACC_SIZE=mid (resnet50 trunk, T=32 res=128
D=256 — the shape the docs/SCALING.md budget table quotes).

The reference has no counterpart: its DDP gradient buckets are visible only
at runtime through NCCL (/root/reference/util/dist.py:210-247); here the
budget is a static property of the compiled program.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cfg(size: str, data: int, time: int, model: int = 1):
    import __graft_entry__ as g

    cfg = g._dryrun_cfg(data, time, model)
    if size == "mid":
        cfg = cfg.replace(
            backbone="resnet50",
            hidden_dim=256,
            nheads=8,
            enc_layers=6,
            dec_layers=6,
            dim_feedforward=2048,
            video_max_len=32,
            video_max_len_train=32,
            stride=4,
            max_text_len=32,
            text_vocab_size=2048,
            text_hidden_size=256,
            text_layers=4,
            text_heads=8,
            text_ffn=1024,
            text_max_positions=64,
        )
    return cfg


def _res(size: str) -> int:
    return 128 if size == "mid" else 64


def infer_leg(size: str, data: int, time: int):
    """Sharded inference: replicated params, (data, time)-sharded batch."""
    import jax

    import __graft_entry__ as g
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from tubedetr_tpu.parallel.train_step import model_inputs

    mesh = make_mesh(data=data, time=time)
    cfg = _cfg(size, data, time)
    model = build_model(cfg)
    r = _res(size)
    batch = g._example_batch(cfg, b=max(2, data), h=r, w=r)
    inputs = model_inputs(batch)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    with mesh:
        compiled = (
            jax.jit(lambda v, x: model.apply(v, **x))
            .lower(replicate(variables, mesh), shard_batch(inputs, mesh))
            .compile()
        )
    return compiled, mesh


def train_leg(size: str, data: int, time: int, model_axis: int = 1,
              fsdp: bool = False):
    """One full sharded training step (ZeRO-1 by default; optionally FSDP
    and/or tensor parallelism) — compile only, no execution."""
    import jax

    import __graft_entry__ as g
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_opt_state_along_data,
    )
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
        model_inputs,
    )

    mesh = make_mesh(data=data, time=time, model=model_axis)
    cfg = _cfg(size, data, time, model_axis)
    model = build_model(cfg)
    r = _res(size)
    batch = g._dryrun_train_batch(cfg, max(2, data))
    # square the spatial dims up to the leg resolution
    for k in ("frames_slow", "frames_fast", "slow_pad_mask", "fast_pad_mask"):
        if batch[k].shape[2] != r:
            reps = [1] * batch[k].ndim
            reps[2] = reps[3] = r // batch[k].shape[2]
            batch[k] = np.tile(np.asarray(batch[k]), reps)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), **model_inputs(batch)
    )
    state, tx, labels = create_train_state(cfg, variables)
    lrs = {
        "lr": np.float32(1e-4),
        "lr_backbone": np.float32(1e-5),
        "lr_text_encoder": np.float32(1e-4),
    }
    with mesh:
        if model_axis > 1 or fsdp:
            from tubedetr_tpu.parallel.tp import shard_train_state

            state, shardings = shard_train_state(
                state, mesh, nheads=cfg.nheads, text_heads=cfg.text_heads,
                zero=True, fsdp=fsdp,
            )
        else:
            state, shardings = shard_opt_state_along_data(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, model, tx, labels, donate=False,
                               state_shardings=shardings)
        compiled = step.lower(state, sharded, lrs, np.int32(0)).compile()
    return compiled, mesh


def pipeline_leg(size: str, data: int = 2, pipe: int = 4):
    """Pipelined encoder stack (parallel/pp.py) — stage hops + the final
    result broadcast are the ONLY collectives; weights never move."""
    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.models.transformer import Encoder
    from tubedetr_tpu.parallel.pp import (
        make_pipe_mesh,
        pipeline_apply,
        stack_layer_params,
    )
    from tubedetr_tpu.models.transformer import EncoderLayer

    if size == "mid":
        d, heads, ffn, layers, n, s = 256, 8, 2048, 8, 16, 48
    else:
        d, heads, ffn, layers, n, s = 32, 4, 64, 4, 8, 12
    enc = Encoder(layers, d, heads, ffn, dropout=0.1)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, s, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(n, s, d).astype(np.float32) * 0.3)
    mask = jnp.asarray(np.zeros((n, s), bool))
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), x, pos, mask)
    stacked = stack_layer_params(
        [variables["params"][f"layer_{i}"] for i in range(layers)]
    )
    mesh = make_pipe_mesh(pipe=pipe, data=data)
    layer = EncoderLayer(d, heads, ffn, dropout=0.0)

    def layer_fn(p, y, aux):
        out, _ = layer.apply({"params": p}, y, aux[0], aux[1])
        return out

    fn = jax.jit(
        lambda p, xx: pipeline_apply(
            layer_fn, p, xx, (pos, mask), mesh=mesh, microbatches=4,
        )
    )
    return fn.lower(stacked, x).compile(), mesh


LEGS = {
    # name: (builder, kwargs)
    "infer (4x2)": (infer_leg, dict(data=4, time=2)),
    "pipeline enc (2x4 pipe)": (pipeline_leg, dict(data=2, pipe=4)),
    "train zero1 (4x2)": (train_leg, dict(data=4, time=2)),
    "train fsdp (2x4)": (train_leg, dict(data=2, time=4, fsdp=True)),
    "train tp+fsdp (2x2x2)": (
        train_leg,
        dict(data=2, time=2, model_axis=2, fsdp=True),
    ),
}

# Per-axis ring bandwidth assumption for the projection: a v5e chip drives
# one ICI link pair per torus axis at ~45 GB/s each direction (public v5e
# spec: 1600 Gbps aggregate ICI per chip over 4 links). The table prints
# bytes (exact) and time under this constant; substitute your own W freely.
ICI_GBPS = float(os.environ.get("ACC_ICI_GBPS", 45.0))


def run_leg(name: str, size: str):
    from tubedetr_tpu.parallel.collectives import (
        collective_inventory,
        summarize,
    )

    builder, kw = LEGS[name]
    compiled, mesh = builder(size, **kw)
    cols = collective_inventory(compiled, mesh)
    summary = summarize(cols)
    return cols, summary


def main():
    size = os.environ.get("ACC_SIZE", "tiny")
    only = os.environ.get("ACC_LEG", "")
    report = {}
    for name in LEGS:
        if only and only not in name:
            continue
        print(f"\n=== {name}  [{size}] ===", flush=True)
        cols, summary = run_leg(name, size)
        loop = [c for c in cols if c.computation != "ENTRY"]
        total_ici = 0.0
        for (kind, axes), rec in sorted(summary.items()):
            mib = rec["ici_bytes"] / 2**20
            total_ici += rec["ici_bytes"]
            print(
                f"  {kind:<18} over {'x'.join(axes) or '-':<12} "
                f"x{rec['count']:<3} ici={mib:9.3f} MiB/step/device"
            )
        if loop:
            print(f"  (note: {len(loop)} collective(s) inside loop bodies — "
                  f"bytes count one trip)")
        us = total_ici / (ICI_GBPS * 1e9) * 1e6
        print(f"  total ICI: {total_ici/2**20:.3f} MiB/step/device "
              f"=> ~{us:.1f} us at {ICI_GBPS:.0f} GB/s/axis")
        report[name] = {
            "collectives": [
                {
                    "kind": c.kind,
                    "axes": list(c.axes),
                    "shapes": c.shapes,
                    "result_bytes": c.result_bytes,
                    "ici_bytes": c.ici_bytes,
                    "computation": c.computation,
                }
                for c in cols
            ],
            "total_ici_bytes": total_ici,
        }
    out = os.environ.get("ACC_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump({"size": size, "legs": report}, f, indent=1)
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
