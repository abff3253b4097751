"""Training / evaluation CLI (the reference's main.py equivalent, L6).

Orchestrates: config (+JSON overlay), seeding, model+optimizer build, warm
start / resume, dataset+loader build, the mesh, per-epoch train loop with
checkpointing and periodic evaluation, JSON-lines logging
(/root/reference/main.py:340-727).

Usage:
    python -m tubedetr_tpu.apps.train --dataset_config config/vidstg.json \
        --combine_datasets vidstg --combine_datasets_val vidstg --ema
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax

    from tubedetr_tpu.apps.cli import config_from_args
    from tubedetr_tpu.data.datasets import build_dataset
    from tubedetr_tpu.data.loader import ConcatDataset, DataLoader, EpochChunkView
    from tubedetr_tpu.eval.viou import VIoUEvaluator
    from tubedetr_tpu.models.tokenizer import build_tokenizer
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
        model_inputs,
    )
    from tubedetr_tpu.train.checkpoint import (
        AsyncCheckpointWriter,
        load_checkpoint,
        load_torch_checkpoint_into,
        save_checkpoint,
    )
    from tubedetr_tpu.train.engine import evaluate, train_one_epoch

    from tubedetr_tpu.parallel.dist import (
        init_distributed_mode,
        is_main_process,
        setup_print_for_distributed,
    )
    from tubedetr_tpu.utils.misc import get_sha

    cfg = config_from_args(argv)
    if cfg.backbone_quant in ("int8", "int8_static") and not cfg.evaluate_only:
        # rejected loudly for TRAINING: PTQ int8 is inference-only
        # (training through round() has zero gradients). The eval-only CLI
        # supports it: scales are calibrated on the first val batch below,
        # so `--eval --backbone_quant int8_static` measures real vIoU under
        # quantization. For TRAINING under quantization use the fake-quant
        # STE mode (--backbone_quant int8_qat), and/or int8 the
        # gradient-free passes (--backbone_quant_fast/--backbone_quant_frozen).
        raise NotImplementedError(
            "--backbone_quant int8/int8_static trains nothing (zero "
            "gradients through round()); use it with --eval, or in the "
            "demo/serve/bench inference paths. To TRAIN quantized use "
            "--backbone_quant int8_qat (fake-quant with straight-through "
            "gradients), or quantize only the gradient-free passes with "
            "--backbone_quant_fast/--backbone_quant_frozen int8_static"
        )

    # multi-process runtime BEFORE any device use (reference
    # util/dist.py:210-247); no-op without a launcher env
    distributed = init_distributed_mode(cfg)
    if distributed:
        setup_print_for_distributed(is_main_process())
        print(
            f"distributed: {jax.process_count()} processes, "
            f"{jax.device_count()} devices "
            f"({jax.local_device_count()} local)",
            force=True,
        )
    print(get_sha())
    print(f"config: {cfg}")

    # seeding: seed + process rank (reference main.py:357-363) — data
    # pipelines draw differently per process, model init below stays seeded
    # identically so replicas agree
    seed = cfg.seed + jax.process_index()
    np.random.seed(seed)

    # mesh over ALL devices (all processes); collectives ride ICI/DCN.
    # Multi-process meshes MUST span every process (a sub-mesh would leave
    # some processes without addressable devices), so the data axis widens
    # to device_count/time there regardless of the single-chip default.
    if jax.process_count() > 1:
        mesh_data = jax.device_count() // (cfg.mesh_time * cfg.mesh_model)
        if cfg.mesh_data > 1 and cfg.mesh_data != mesh_data:
            print(
                f"[mesh] widening data axis {cfg.mesh_data} -> {mesh_data} "
                f"to span all {jax.device_count()} devices"
            )
    else:
        mesh_data = cfg.mesh_data if cfg.mesh_data > 0 else -1
    mesh = make_mesh(data=mesh_data, time=cfg.mesh_time, model=cfg.mesh_model)

    tokenizer = build_tokenizer(cfg.tokenizer_path, cfg.text_vocab_size)
    model = build_model(cfg)

    # init with a minimal dummy batch to materialise parameters
    h = w = cfg.resolution
    t, tc = cfg.video_max_len_train, cfg.n_clips
    dummy = dict(
        frames_slow=np.zeros((1, tc, h, w, 3), np.float32),
        slow_pad_mask=np.zeros((1, tc, h, w), bool),
        tokens=np.zeros((1, cfg.max_text_len), np.int32),
        text_pad_mask=np.zeros((1, cfg.max_text_len), bool),
        durations=np.full((1,), t, np.int32),
        frames_fast=np.zeros((1, t, h, w, 3), np.float32),
        fast_pad_mask=np.zeros((1, t, h, w), bool),
    )
    if not cfg.fast:
        del dummy["frames_fast"], dummy["fast_pad_mask"]
    # params seeded with the GLOBAL seed (not seed+rank): replicas must init
    # identically across processes (the reference relies on DDP's param
    # broadcast for this; we rely on identical init)
    variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed), **dummy)
    n_params = sum(
        np.prod(x.shape) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"number of params: {n_params/1e6:.1f}M")

    # warm start / resume
    start_epoch = 0
    if cfg.load:
        if cfg.load.endswith(".pth"):
            variables, _ = load_torch_checkpoint_into(variables, cfg.load, cfg)
        else:
            ck = load_checkpoint(cfg.load)
            variables = {"params": ck["params"], "buffers": ck["buffers"]}
    state, tx, labels = create_train_state(cfg, variables)
    if cfg.resume:
        ck = load_checkpoint(cfg.resume)
        state = state.replace(
            params=ck["params"],
            buffers=ck["buffers"],
            opt_state=ck.get("opt_state", state.opt_state),
            ema_params=ck.get("ema_params", state.ema_params),
        )
        start_epoch = ck.get("epoch", -1) + 1

    out_dir = Path(cfg.output_dir) if cfg.output_dir else None
    ckpt_writer = AsyncCheckpointWriter() if cfg.async_checkpoint else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    # datasets
    def make_val_loaders():
        loaders = []
        for name in cfg.combine_datasets_val:
            ds = build_dataset(name, "test" if cfg.test else "val", cfg, tokenizer)
            div = (
                cfg.video_max_len_train
                if cfg.video_max_len_train != cfg.video_max_len
                else 0
            )
            bs = math.ceil(
                cfg.batch_size * cfg.video_max_len_train / cfg.video_max_len
            )
            loaders.append(
                (
                    name,
                    ds,
                    DataLoader(
                        ds,
                        batch_size=max(bs, 1),
                        t=cfg.video_max_len if not div else div,
                        stride=cfg.stride,
                        max_text_len=cfg.max_text_len,
                        seed=seed,
                        num_workers=cfg.num_workers,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        div_vid=div,
                        with_fast=cfg.fast,
                        tokenizer=tokenizer,
                        frames_dtype=cfg.frames_dtype,
                        compact_pad_masks=cfg.compact_pad_masks,
                    ),
                )
            )
        return loaders

    extra_eval_vars = None
    if cfg.backbone_quant != "none":
        # PTQ calibration for int8_static eval: one forward of the
        # dynamic-observer model on the first val batch records per-conv
        # activation maxima; the static eval model reads them as fixed
        # scales (same flow as bench.py / serving's GroundingPipeline).
        # Multi-process: scales are max-reduced across ranks inside
        # calibrate_qscales so every process bakes identical scales.
        # Persisted to the qscales sidecar cache (keyed by config+weights)
        # so a re-run of the same eval skips the observer-model compile.
        from tubedetr_tpu.models.quantize import (
            get_or_calibrate_qscales,
            weights_tag_for,
        )

        _, _, calib_loader = make_val_loaders()[0]
        calib_batch, _ = next(iter(calib_loader))
        calib_params = (
            state.ema_params
            if (cfg.ema and state.ema_params is not None)
            else state.params
        )
        qscales, source = get_or_calibrate_qscales(
            cfg,
            {"params": calib_params, "buffers": state.buffers},
            model_inputs(calib_batch),
            cache_dir=cfg.qscales_dir,
            force=cfg.calibrate,
            # no --resume/--load means model.init weights, NOT the
            # pipeline's fabricated weights — distinct tag, distinct key
            weights_tag=weights_tag_for(
                cfg, default=f"init-seed{cfg.seed}"
            ),
            # scales calibrated on one val dataset must not serve another
            data_tag="val:" + ",".join(cfg.combine_datasets_val),
        )
        extra_eval_vars = {"qscales": qscales}
        print(
            f"[quant] {cfg.backbone_quant} scales "
            + (
                "loaded from sidecar cache"
                if source == "cache"
                else f"calibrated ({cfg.combine_datasets_val[0]} val batch)"
            )
        )
    # eval-config scales live in a mutable cell so per-epoch recalibration
    # (--recalibrate_each_epoch) reaches BOTH the eval step and the
    # checkpoint payload — otherwise eval and the deployed /reload would
    # keep serving the stale startup calibration
    eval_qvars_cell = [extra_eval_vars]
    if cfg.recalibrate_each_epoch and extra_eval_vars is not None:
        _raw_eval_step = make_eval_step(cfg, model, ema=cfg.ema)
        eval_step = lambda s, b: _raw_eval_step(s, b, eval_qvars_cell[0])
    else:
        eval_step = make_eval_step(
            cfg, model, ema=cfg.ema, extra_vars=extra_eval_vars
        )

    def run_eval(state):
        all_stats = {}
        n_data = mesh.shape["data"]
        multiproc = jax.process_count() > 1

        if multiproc:
            # each process evaluates its own dataset shard on its local
            # devices (prediction merge happens on host afterwards); pull
            # the possibly-global-replicated state back to host first
            if (cfg.shard_optimizer_state or cfg.mesh_model > 1
                    or cfg.shard_params):
                # re-replicate ZeRO/TP/FSDP-sharded leaves first: np.asarray
                # needs fully-addressable arrays on every process
                from tubedetr_tpu.parallel.mesh import gather_state

                with mesh:
                    state = gather_state(state, mesh)
            state = jax.tree_util.tree_map(np.asarray, state)

        class _ShardedEval:
            """Shard eval batches over the data mesh axis. EVERY batch is
            padded to one static size (the loader's batch size, rounded up
            to the data axis) by repeating the last sample — meta keeps the
            real length, so the engine slices the padded outputs away.
            Static shapes mean the ragged tail batch reuses the cached
            eval executable instead of triggering a fresh multi-minute
            compile, and tail batches keep full multi-chip throughput."""

            def __init__(self, loader):
                self.loader = loader

            def __len__(self):
                return len(self.loader)

            def __iter__(self):
                bs = getattr(self.loader, "batch_size", 0)
                for batch, meta in self.loader:
                    b = next(iter(batch.values())).shape[0]
                    target = max(b, bs)
                    if not multiproc and n_data > 1:
                        target += -target % n_data
                    if target > b:
                        batch = {
                            k: np.concatenate(
                                [v, np.repeat(v[-1:], target - b, axis=0)],
                                axis=0,
                            )
                            for k, v in batch.items()
                        }
                    if multiproc or n_data <= 1:
                        yield batch, meta
                    else:
                        yield shard_batch(batch, mesh), meta

        for name, ds, loader in make_val_loaders():
            ev = VIoUEvaluator(
                ds.annotations, tmp_loc=cfg.tmp_loc, save_pred=cfg.test
            )
            # multi-process: each process evals its own shard on LOCAL
            # devices (host-numpy state + batches) — do NOT enter the
            # global mesh, or the model's mesh-aware sharding constraints
            # (core/sharding.py:constrain_frame_major) turn the local jit
            # into a global multi-process program whose outputs span
            # non-addressable devices and cannot be read back per process
            eval_ctx = contextlib.nullcontext() if multiproc else mesh
            eval_feed = _ShardedEval(loader)
            if cfg.device_prefetch > 0:
                # background-thread device_put: the next batch streams to
                # the device while the current eval step + host postprocess
                # run (the _ShardedEval padding already happened host-side)
                from tubedetr_tpu.data.loader import DevicePrefetcher

                eval_feed = DevicePrefetcher(eval_feed,
                                             size=cfg.device_prefetch)
            with eval_ctx:
                evaluate(
                    cfg, eval_step, state, eval_feed, ev, name,
                    test_mode=cfg.test,
                )
            if jax.process_count() > 1:
                ev.synchronize_between_processes(
                    str((out_dir or Path(".")) / "eval_sync")
                )
            res = ev.summarize()
            if res:
                all_stats.update(
                    {f"{name}_{k}": v for k, v in res.items()
                     if isinstance(v, (int, float))}
                )
                print(f"[{name}] " + json.dumps(
                    {k: round(v, 4) for k, v in res.items()
                     if isinstance(v, (int, float))}))
        return all_stats

    if cfg.evaluate_only:
        with mesh:
            if cfg.mesh_model > 1:
                # tensor-parallel eval: place params Megatron-sharded so
                # GSPMD shards the transformer matmuls over the model axis
                from tubedetr_tpu.parallel.tp import shard_train_state

                state, _ = shard_train_state(
                    state, mesh, nheads=cfg.nheads,
                    text_heads=cfg.text_heads, zero=False,
                )
            else:
                state = replicate(state, mesh)
        stats = run_eval(state)
        if out_dir and jax.process_index() == 0:
            with open(out_dir / "log_stats.json", "w") as f:
                json.dump(stats, f)
        return 0

    # train
    train_sets = [
        build_dataset(name, "train", cfg, tokenizer)
        for name in cfg.combine_datasets
    ]
    if not train_sets:
        print("no training datasets specified (--combine_datasets)")
        return 1
    train_base = ConcatDataset(train_sets)

    def make_train_loader(dataset):
        return DataLoader(
            dataset,
            batch_size=cfg.batch_size,
            t=cfg.video_max_len_train,
            stride=cfg.stride,
            max_text_len=cfg.max_text_len,
            shuffle=True,
            drop_last=True,
            seed=seed,
            num_workers=cfg.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            with_fast=cfg.fast,
            tokenizer=tokenizer,
            frames_dtype=cfg.frames_dtype,
            compact_pad_masks=cfg.compact_pad_masks,
        )

    n_chunks = cfg.epoch_chunks
    steps_per_epoch = len(make_train_loader(train_base))
    num_training_steps = steps_per_epoch * cfg.epochs

    extra_train_vars = None
    if (cfg.backbone_quant_fast != "none"
            or cfg.backbone_quant_frozen != "none"
            or cfg.backbone_quant == "int8_qat"):
        # the fast-stream pass and the always-frozen slow-pass prefix carry
        # no gradients, so they run int8 (parameter-shared with the float
        # backbone); int8_qat additionally fake-quantizes the TRAINABLE
        # slow pass (STE) and reads the same calibrated scales. The init
        # above took the shared-backbone inference path and never executed
        # the int8 trunk, so build its qscales tree here; for static
        # scales, calibrate the activation maxima on one real train batch
        # with the dynamic-observer variant.
        calib_vars = {"params": state.params, "buffers": state.buffers}
        if extra_eval_vars is not None:
            # backbone_quant != "none" already calibrated on a val batch;
            # one observer tree serves every pass (the observers live on
            # the single shared backbone module)
            qscales = extra_eval_vars["qscales"]
            print("[quant] training scales reuse the eval calibration")
        elif "int8_static" in (cfg.backbone_quant_fast,
                               cfg.backbone_quant_frozen):
            from tubedetr_tpu.models.quantize import (
                get_or_calibrate_qscales,
                weights_tag_for,
            )

            calib_batch, _ = next(iter(make_train_loader(train_base)))
            qscales, source = get_or_calibrate_qscales(
                cfg, calib_vars, model_inputs(calib_batch),
                cache_dir=cfg.qscales_dir, force=cfg.calibrate,
                weights_tag=weights_tag_for(
                    cfg, default=f"init-seed{cfg.seed}"
                ),
                data_tag="train:" + ",".join(cfg.combine_datasets),
            )
            print(
                f"[quant] backbone_quant_fast/frozen scales {source} "
                "(one train batch)"
            )
        else:  # dynamic int8: observers exist but scales are computed
            # per-forward; zeros satisfy the variable declarations
            from tubedetr_tpu.models.quantize import calibration_cfg

            calib_model = build_model(calibration_cfg(cfg))
            _, qshapes = jax.eval_shape(
                lambda v, b: calib_model.apply(
                    v, **model_inputs(b), deterministic=True,
                    mutable=["qscales"],
                ),
                calib_vars,
                dummy,
            )
            qscales = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), qshapes["qscales"]
            )
        extra_train_vars = {
            "qscales": jax.tree_util.tree_map(np.asarray, qscales)
        }

    drift_checker = None
    if (cfg.log_quant_drift or cfg.recalibrate_each_epoch) \
            and extra_train_vars is not None:
        from tubedetr_tpu.models.quantize import make_drift_checker

        drift_checker = make_drift_checker(cfg)
    with mesh:
        state_shardings = None
        if cfg.mesh_model > 1 or cfg.shard_params:
            from tubedetr_tpu.parallel.tp import (
                count_tp_sharded,
                shard_train_state,
            )

            state, state_shardings = shard_train_state(
                state, mesh,
                nheads=cfg.nheads, text_heads=cfg.text_heads,
                zero=cfg.shard_optimizer_state,
                fsdp=cfg.shard_params,
            )
            desc = []
            if cfg.mesh_model > 1:
                desc.append(
                    f"tp: {count_tp_sharded(state.params, mesh, nheads=cfg.nheads, text_heads=cfg.text_heads)} "
                    f"param leaves over model ({mesh.shape['model']}-way)"
                )
            if cfg.shard_params:
                desc.append(
                    f"fsdp: params + state over data ({mesh.shape['data']}-way)"
                )
            elif cfg.shard_optimizer_state:
                desc.append("ZeRO-1 over data")
            print("[shard] " + "; ".join(desc))
        elif cfg.shard_optimizer_state:
            from tubedetr_tpu.parallel.mesh import shard_opt_state_along_data

            state, state_shardings = shard_opt_state_along_data(state, mesh)
            print(
                f"[zero] optimizer state + EMA sharded over data axis "
                f"({mesh.shape['data']}-way)"
            )
        else:
            state = replicate(state, mesh)
    if cfg.recalibrate_each_epoch and extra_train_vars is not None:
        # scales are a runtime argument: per-epoch refreshes reuse the
        # compiled executable (same shapes -> no retrace)
        qvars_cell = [extra_train_vars]
        raw_step = make_train_step(cfg, model, tx, labels,
                                   state_shardings=state_shardings,
                                   dynamic_extra_vars=True)
        train_step = lambda s, b, lrs, seed: raw_step(
            s, b, lrs, seed, qvars_cell[0]
        )
    else:
        qvars_cell = None
        train_step = make_train_step(cfg, model, tx, labels,
                                     extra_vars=extra_train_vars,
                                     state_shardings=state_shardings)

    writer = None
    if cfg.tb_dir and jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(cfg.tb_dir)
        except Exception:
            pass

    for epoch in range(start_epoch, cfg.epochs):
        chunks = [train_base] if n_chunks <= 0 else [
            EpochChunkView(train_base, n_chunks, c, seed=seed + epoch)
            for c in range(n_chunks)
        ]
        for chunk in chunks:
            loader = make_train_loader(chunk)
            loader.set_epoch(epoch)

            from tubedetr_tpu.parallel.mesh import prefetch_to_device

            if cfg.device_prefetch > 0:
                # threaded feed: batch k+1's host->device transfer streams
                # behind batch k's step even though the engine reads the
                # loss back every step (the same-thread prefetch below only
                # overlaps while the consumer doesn't block on the device)
                from tubedetr_tpu.data.loader import DevicePrefetcher
                from tubedetr_tpu.parallel.mesh import shard_batch

                _feed = DevicePrefetcher(
                    loader, size=cfg.device_prefetch,
                    put_fn=lambda b: shard_batch(b, mesh),
                )
            else:
                class _Sized:
                    def __iter__(self):
                        return prefetch_to_device(iter(loader), mesh, size=2)

                    def __len__(self):
                        return len(loader)

                _feed = _Sized()

            with mesh:
                state, train_stats = train_one_epoch(
                    cfg,
                    train_step,
                    state,
                    _feed,
                    epoch,
                    num_training_steps,
                    writer,
                )

        if drift_checker is not None:
            # one observer forward (compiled once) on a fresh train batch:
            # how far activations have drifted past the baked scales
            drift_batch, _ = next(iter(make_train_loader(train_base)))
            # params/buffers stay replicated under ZeRO sharding; with
            # FSDP across processes they'd need a gather first
            drift_params = state.params
            if cfg.shard_params and jax.process_count() > 1:
                from tubedetr_tpu.parallel.mesh import gather_state

                with mesh:
                    drift_params = gather_state(state, mesh).params
            baked = (
                qvars_cell[0] if qvars_cell is not None else extra_train_vars
            )["qscales"]
            ratio, leaf, observed = drift_checker(
                {
                    "params": jax.tree_util.tree_map(np.asarray, drift_params),
                    "buffers": jax.tree_util.tree_map(
                        np.asarray, state.buffers
                    ),
                },
                model_inputs(drift_batch),
                baked,
            )
            print(
                f"[quant] epoch {epoch} activation drift: worst "
                f"observed/baked = {ratio:.3f} at {leaf}"
                + (" (baked scale now clips)" if ratio > 1.0 else "")
            )
            if qvars_cell is not None:
                from tubedetr_tpu.models.quantize import allreduce_max_tree

                refreshed = {"qscales": allreduce_max_tree(observed)}
                qvars_cell[0] = refreshed
                if eval_qvars_cell[0] is not None:
                    # the recalibrated scales are the ones the deployed
                    # int8 model must serve with: route them into the eval
                    # step and the checkpoint payload too (one observer
                    # tree serves every pass — see the startup reuse above)
                    eval_qvars_cell[0] = refreshed
                print(f"[quant] epoch {epoch} scales recalibrated")

        # checkpointing (reference cadence: always checkpoint.pth; numbered
        # every 2 epochs / before lr_drop / always for vidstg)
        ck_state = state
        if (
            out_dir
            and (cfg.shard_optimizer_state or cfg.mesh_model > 1
                 or cfg.shard_params)
            and jax.process_count() > 1
        ):
            # collective: every process participates in re-replicating the
            # ZeRO/TP-sharded leaves so process 0 can address them
            from tubedetr_tpu.parallel.mesh import gather_state

            with mesh:
                ck_state = gather_state(state, mesh)
        if out_dir and jax.process_index() == 0:
            payload = dict(
                params=ck_state.params,
                buffers=ck_state.buffers,
                opt_state=ck_state.opt_state,
                ema_params=ck_state.ema_params,
                epoch=epoch,
                config=cfg.__dict__,
                # inference-config calibration (if any) travels with the
                # weights so a /reload serves int8 without an observer
                # pass; the cell holds the per-epoch recalibrated scales
                # when --recalibrate_each_epoch refreshed them
                qscales=(eval_qvars_cell[0] or {}).get("qscales"),
            )
            _save = (
                ckpt_writer.save if ckpt_writer is not None else
                save_checkpoint
            )
            _save(str(out_dir / "checkpoint.ckpt"), **payload)
            if (
                (epoch + 1) % 2 == 0
                or epoch + 1 == cfg.lr_drop
                or "vidstg" in cfg.combine_datasets
            ):
                _save(
                    str(out_dir / f"checkpoint{epoch:04}.ckpt"), **payload
                )

        test_stats = {}
        if epoch % cfg.eval_skip == cfg.eval_skip - 1:
            test_stats = run_eval(state)

        log_stats = {
            **{f"train_{k}": v for k, v in train_stats.items()},
            **{f"test_{k}": v for k, v in test_stats.items()},
            "epoch": epoch,
            "n_parameters": int(n_params),
        }
        if out_dir and jax.process_index() == 0:
            with open(out_dir / "log.txt", "a") as f:
                f.write(json.dumps(log_stats) + "\n")
    if ckpt_writer is not None:
        ckpt_writer.wait()  # join the in-flight write; re-raise its error
    return 0


if __name__ == "__main__":
    sys.exit(main())
