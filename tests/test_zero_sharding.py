"""ZeRO-1-style optimizer-state sharding over the data mesh axis.

The reference replicates the full AdamW state per DDP rank
(/root/reference/main.py:406-415); `shard_opt_state_along_data` shards the
moment trees (and EMA) over the `data` axis instead. These tests pin:

* numeric equivalence with the replicated path (elementwise moment update
  partitions without changing math);
* the sharded layout actually lands on the mesh (specs contain "data")
  and SURVIVES the train step (out_shardings pins it under donation);
* gather_state re-replicates for host consumption.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_train_step import lrs, tiny_cfg
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import (
    gather_state,
    make_mesh,
    replicate,
    shard_batch,
    shard_opt_state_along_data,
)
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    model_inputs,
)


def _setup():
    cfg = tiny_cfg()
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(4, t=cfg.video_max_len_train)
    batch, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    # host copies: both runs donate their state, so they must not share
    # device buffers with the init tree
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return cfg, model, batch, variables


def test_zero_sharding_matches_replicated_and_keeps_layout():
    cfg, model, batch, variables = _setup()
    mesh = make_mesh(data=4, time=2)
    n_steps = 3

    def run(sharded: bool):
        state, tx, labels = create_train_state(cfg, variables)
        with mesh:
            if sharded:
                state, shardings = shard_opt_state_along_data(state, mesh)
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

    st_r, m_r = run(sharded=False)
    st_s, m_s = run(sharded=True)

    # --- numerics identical to the replicated path ----------------------
    np.testing.assert_allclose(
        float(m_s["loss_total"]), float(m_r["loss_total"]), rtol=1e-5
    )
    pr = jax.tree_util.tree_leaves(st_r.params)
    ps = jax.tree_util.tree_leaves(st_s.params)
    for a, b in zip(pr, ps):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-6, rtol=2e-5,
        )

    # --- layout: big moment leaves sharded over "data", pinned across
    # steps (we are n_steps in; donation + out_shardings must have kept it)
    def specs(tree):
        return [
            x.sharding.spec
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "sharding") and np.ndim(x) > 0
        ]

    opt_specs = specs(st_s.opt_state)
    assert any("data" in str(s) for s in opt_specs), opt_specs
    ema_specs = specs(st_s.ema_params)
    assert any("data" in str(s) for s in ema_specs), ema_specs
    for s in specs(st_s.params):  # params stay replicated
        assert "data" not in str(s), s

    # leaves with no data-divisible axis stay replicated instead of crashing
    small = [
        x
        for x in jax.tree_util.tree_leaves(st_s.opt_state)
        if np.ndim(x) > 0 and all(d % 4 != 0 or d < 4 for d in np.shape(x))
    ]
    for x in small:
        assert "data" not in str(x.sharding.spec)

    # --- gather_state re-replicates for host consumption ----------------
    with mesh:
        gathered = gather_state(st_s, mesh)
    for s in specs(gathered.opt_state):
        assert "data" not in str(s), s
    ga = jax.tree_util.tree_leaves(gathered.opt_state)
    sa = jax.tree_util.tree_leaves(st_s.opt_state)
    for a, b in zip(ga, sa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_cli_zero_sharding(tmp_path):
    """The CLI wiring: --shard_optimizer_state + --shard_params (FSDP) on a
    4x2 mesh trains an epoch, logs the shard banner, and checkpoints
    re-gathered state."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_zero_cli_jaxcache"
    )
    flags = [
        "--combine_datasets", "synthetic",
        "--combine_datasets_val", "synthetic",
        "--backbone", "resnet14",
        "--hidden_dim", "32",
        "--nheads", "4",
        "--enc_layers", "1",
        "--dec_layers", "1",
        "--dim_feedforward", "64",
        "--video_max_len", "8",
        "--video_max_len_train", "8",
        "--stride", "2",
        "--max_text_len", "8",
        "--text_vocab_size", "128",
        "--text_hidden_size", "32",
        "--text_layers", "1",
        "--text_heads", "4",
        "--text_ffn", "64",
        "--batch_size", "4",
        "--num_workers", "0",
        "--epochs", "1",
        "--eval_skip", "2",
        "--ema",
        "--mesh_data", "4",
        "--mesh_time", "2",
        "--shard_optimizer_state",
        # FSDP: parameters shard over data too (transformer + text encoder;
        # backbone exempt — parallel/tp.py:shard_train_state)
        "--shard_params",
        # compose with the int8 fast-stream + frozen-prefix passes:
        # sharded state + extra qscales collection in one train step
        "--backbone_quant_fast", "int8_static",
        "--backbone_quant_frozen", "int8_static",
        # unrolled scan tails for the gradient-free fast pass (bit-
        # identical by test_quant_fast_train; here: CLI wiring + compile)
        "--unroll_quant_fast",
        # per-epoch activation-range drift probe vs the baked step-0
        # scales (ADVICE r2 #5)
        "--log_quant_drift",
        # hermetic: keep the qscales sidecar out of the repo's cache dir
        "--qscales_dir", str(tmp_path / "qscales"),
    ]
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *flags,
         "--output-dir", str(tmp_path)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-2000:])
    assert "fsdp: params + state over data (4-way)" in r.stdout
    assert "[quant] backbone_quant_fast/frozen scales calibrated" in r.stdout
    drift = [ln for ln in r.stdout.splitlines()
             if "activation drift: worst observed/baked" in ln]
    assert drift, r.stdout[-3000:]
    ratio = float(drift[0].split("= ")[1].split(" at ")[0])
    assert 0.0 < ratio < 10.0, drift[0]
    assert (tmp_path / "checkpoint.ckpt").exists() or any(
        tmp_path.glob("checkpoint*")
    )
    line = json.loads(
        (tmp_path / "log.txt").read_text().strip().splitlines()[-1]
    )
    losses = [v for k, v in line.items()
              if k.startswith("train_") and "loss" in k]
    assert losses and all(np.isfinite(v) for v in losses), line
