"""Typed configuration for the TPU-native TubeDETR framework.

Covers the full flag surface of the reference CLI (see
/root/reference/main.py:32-337) as a dataclass, plus the JSON dataset-config
overlay semantics (/root/reference/main.py:344-349) and a handful of
TPU-specific knobs (static text length, compute dtype, mesh shape) that the
reference does not need because PyTorch tolerates dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List


@dataclass
class TubeDETRConfig:
    # ---- datasets ----------------------------------------------------------
    combine_datasets: List[str] = field(default_factory=list)
    combine_datasets_val: List[str] = field(default_factory=list)
    v2: bool = False  # HC-STVG2.0 annotations instead of HC-STVG1
    vidstg_ann_path: str = ""
    vidstg_vid_path: str = ""
    hcstvg_ann_path: str = ""
    hcstvg_vid_path: str = ""

    # ---- training hyper-parameters ----------------------------------------
    run_name: str = ""
    save_dir: str = ""
    lr: float = 5e-5
    lr_backbone: float = 1e-5
    text_encoder_lr: float = 5e-5
    batch_size: int = 1
    # gradient accumulation (TPU extra; the reference scales batch only via
    # DDP GPUs): the train step splits the batch into ``grad_accum`` equal
    # microbatches, runs them through ONE lax.scan'd forward+backward body
    # (activations freed per iteration — the memory headroom), sums the
    # gradients, and clips/steps ONCE — bit-matching the big-batch step
    # (torch accumulate-then-clip semantics; tests/test_grad_accum.py)
    grad_accum: int = 1
    weight_decay: float = 1e-4
    epochs: int = 10
    lr_drop: int = 10
    epoch_chunks: int = -1
    optimizer: str = "adam"
    clip_max_norm: float = 0.1
    eval_skip: int = 1
    schedule: str = "linear_with_warmup"  # step|multistep|linear_with_warmup|all_linear_with_warmup
    ema: bool = False
    ema_decay: float = 0.9998
    fraction_warmup_steps: float = 0.01

    # ---- model -------------------------------------------------------------
    freeze_text_encoder: bool = False
    text_encoder_type: str = "roberta-base"
    backbone: str = "resnet101"
    dilation: bool = False
    position_embedding: str = "sine"  # sine|learned
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 8
    num_queries: int = 1
    # num_queries > 1 inference-side query selection: "first" reads query 0
    # (canonical), "sted" ranks queries by their own temporal-grounding
    # confidence (models/postprocess.py:select_query_by_sted) — the trained
    # per-query signal TubeDETR has in place of an objectness head —
    # "objectness" reads, per FRAME, the query the learned objectness head
    # scores highest (the head trains on the Hungarian match whenever
    # num_queries > 1; models/postprocess.py:select_query_by_objectness)
    nq_select: str = "first"
    # num_queries > 1 training-side match granularity: "frame" matches the
    # min-cost query independently per frame (canonical DETR-style), "video"
    # assigns ONE query per video (cost summed over annotated frames) so a
    # single query learns the whole tube — the shape --nq_select sted needs
    # (losses/criterion.py match(); measured A/B in docs/NOTES.md round 5)
    nq_match: str = "frame"
    pass_pos_and_query: bool = True
    freeze_backbone: bool = False

    # ---- losses ------------------------------------------------------------
    aux_loss: bool = True
    sigma: int = 1
    guided_attn: bool = True
    sted: bool = True
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    sted_loss_coef: float = 10.0
    guided_attn_loss_coef: float = 1.0
    # num_queries > 1 only: BCE on the per-(frame, query) objectness head
    # against the Hungarian match (TPU extra; the reference has no
    # objectness head — the structural reason its nq>1 path is unusable)
    objectness_loss_coef: float = 1.0

    # ---- video / temporal --------------------------------------------------
    resolution: int = 224
    video_max_len: int = 200
    video_max_len_train: int = 200
    stride: int = 5
    fps: int = 5
    tmp_crop: bool = True
    tmp_loc: bool = True  # temporal localization (sted supervision from dataset)

    # ---- ablations ---------------------------------------------------------
    fast: bool = True
    fast_mode: str = ""  # ""|gating|transformer|pool|noslow
    learn_time_embed: bool = False
    no_time_embed: bool = False
    no_tsa: bool = False
    rd_init_tsa: bool = False

    # ---- run control -------------------------------------------------------
    test: bool = False
    evaluate_only: bool = False
    resume: str = ""
    load: str = ""
    output_dir: str = ""
    device: str = "tpu"
    seed: int = 42
    num_workers: int = 3
    world_size: int = 1
    tb_dir: str = ""

    # ---- synthetic dataset shape (tests / offline benchmarks) -------------
    # the procedural red-square dataset (data/synthetic.py). 0 = defaults
    # (train 32 / val 8 videos, t = min(video_max_len, 8), 64x64). Larger
    # values drive the eval/learnability benches at the published shapes
    # without the egress-blocked VidSTG downloads.
    synthetic_train_size: int = 0
    synthetic_val_size: int = 0
    synthetic_t: int = 0  # frames per synthetic video
    synthetic_res: int = 0  # square pixel size of synthetic frames

    # ---- demo / serving ----------------------------------------------------
    caption_example: str = ""
    video_example: str = ""
    start_example: float = -1.0
    end_example: float = -1.0
    port: int = 8080

    # ---- TPU-specific (no reference equivalent) ---------------------------
    max_text_len: int = 32  # static token-length bucket (reference pads to longest)
    compute_dtype: str = "float32"  # float32|bfloat16 activation dtype
    # ---- input pipeline (host->device transfer) ---------------------------
    frames_dtype: str = "float32"  # float32|bfloat16 host batch frame dtype;
    #   bf16 halves the frame transfer and is numerically identical when
    #   compute_dtype=bfloat16 (the model casts at entry either way)
    compact_pad_masks: bool = False  # ship (B,T,2) valid extents instead of
    #   dense (B,T,H,W) pixel pad masks; rebuilt on device (expand_pad_masks)
    device_prefetch: int = 0  # >0: background-thread device_put of the next
    #   N batches so host->device transfer overlaps device compute
    mesh_data: int = 1  # data-parallel mesh axis size
    mesh_time: int = 1  # time-sharding mesh axis size (frames over ICI)
    mesh_model: int = 1  # tensor-parallel mesh axis size: Megatron-style
    #   column/row sharding of the transformer + text-encoder projections
    #   (parallel/tp.py); params placed with NamedShardings, GSPMD inserts
    #   the row-parallel psums. Requires nheads % mesh_model == 0 for the
    #   attention split to engage (non-divisible leaves replicate).
    tokenizer_path: str = ""  # dir with vocab.json + merges.txt (offline assets)
    text_vocab_size: int = 50265  # roberta-base vocab
    remat_backbone: bool = True  # rematerialise backbone blocks in backward
    remat_policy: str = "full"  # what a remat'd bottleneck SAVES for the
    #   backward (models/resnet.py:_block_cls): "full" recomputes everything,
    #   "save_mid" keeps conv3's narrow input (skips the 3x3+conv3 recompute
    #   at +1/4 block-IO activation memory), "save_acts" keeps conv2's input
    #   too (no conv recompute, +1/2 block-IO). Numerics identical across
    #   policies — a memory/recompute trade only. resnet family only.
    scan_backbone_blocks: bool = True  # lax.scan over identical stage blocks:
    #   ~5% slower at runtime (measured 103.4 vs 98.3 ms/clip) but cuts XLA
    #   compile from many minutes to <2; unroll for latency-critical serving
    space_to_depth_stem: bool = False  # exact MXU-friendly stem repack (even H/W);
    #   measured neutral on v5e round 1 (XLA already handles the 3-ch conv) — kept
    #   as an option for other topologies
    share_backbone_inference: bool = True  # one backbone pass serves fast+slow at eval
    share_backbone_train: bool = True  # training: the gradient-free fast pass
    #   reuses stop_gradient(slow features) for the every-k-th frames the slow
    #   pass already computed (collate contract: slow = fast[::k]) and runs the
    #   backbone only on the other k-1 of every k frames — 1/k fewer fast-pass
    #   backbone FLOPs, exact for the float path
    backbone_quant: str = "none"  # "int8": dynamic-quantized bottleneck convs
    #   on the v5e int8 MXU path (inference-time; float checkpoint layout).
    #   "int8_qat": fake-quant QAT — the training twin of int8_static (same
    #   calibrated scales and observer tree, float convs, straight-through
    #   gradients); train with it, then deploy the checkpoint int8_static.
    fused_bottleneck: bool = False  # int8_static only: each stride-1 tail
    #   bottleneck runs as ONE fused Pallas kernel (ops/fused_bottleneck.py);
    #   intermediates never touch HBM
    serve_max_batch: int = 1  # serving: coalesce up to N concurrent /stvg
    #   requests into one B=N forward (leader-follower batching; B=2
    #   measured +6% chip throughput over serialized B=1). 1 = serialize.
    serve_batch_window_ms: float = 5.0  # coalescing: max time a request
    #   waits for batch partners before dispatching a partial batch
    qscales_dir: str = ""  # persist int8 calibration scales to this dir
    #   (sidecar .npz keyed by config+weights) so serving/bench cold start
    #   skips the ~10-min observer-model compile; "" disables persistence.
    #   The CLI apps default it to .qscales_cache; the dataclass default
    #   stays off so programmatic/test construction is hermetic.
    calibrate: bool = False  # force fresh int8 calibration (ignore any
    #   cached qscales sidecar; the fresh result overwrites it)
    unroll_quant_fast: bool = False  # training: fully unroll the scanned
    #   backbone stage tails for the gradient-free int8 fast-stream pass
    #   only (stacked scan params kept; nn.scan(unroll=n)). Scan iteration
    #   boundaries block the int8 quantize's producer-epilogue fusion —
    #   unrolled int8 inference beat scanned by ~1.2x (docs/NOTES.md). The
    #   trainable slow pass keeps the compile-light scan. Costs a one-time
    #   longer XLA compile (inlined 22-block layer3).
    log_quant_drift: bool = False  # training int8 passes: run one observer
    #   forward per epoch and log the worst observed/baked activation-max
    #   ratio — step-0 static scales can under-cover as layer2-4 weights
    #   evolve (ratio > 1 means the baked scale now clips)
    recalibrate_each_epoch: bool = False  # training int8/QAT passes: refresh
    #   the static activation scales at every epoch boundary from one
    #   observer forward on a fresh train batch (max-reduced across
    #   processes). The scales are a runtime argument of the compiled train
    #   step, so the refresh reuses the executable — no retrace. Implies
    #   the drift probe (the same forward provides both).
    async_checkpoint: bool = False  # overlap the per-epoch checkpoint's
    #   disk write with the next epoch's training: the device->host
    #   snapshot stays synchronous (donated buffers), the pickle+rename
    #   moves to a background thread (train/checkpoint.py:
    #   AsyncCheckpointWriter). The reference blocks on torch.save.
    shard_optimizer_state: bool = False  # ZeRO-1-style: shard the AdamW
    #   moment trees (and EMA params) over the data mesh axis instead of
    #   replicating — ~(1 - 1/n_data) of that state's memory back per chip
    #   (~1.9 GB on a v5e-8 for the 180M-param model); the elementwise
    #   moment update partitions for free, params stay replicated (one
    #   all-gather of the updates per step — the classic ZeRO-1 trade)
    shard_params: bool = False  # FSDP / ZeRO-3-style: ADDITIONALLY shard the
    #   parameters (and EMA) over the data mesh axis — GSPMD all-gathers each
    #   layer's weights at its use site (overlapped by XLA's scheduler), so
    #   per-chip param memory drops ~(1 - 1/n_data) at the cost of one
    #   all-gather per layer per step. Implies shard_optimizer_state.
    #   Composes with mesh_model (params shard model x data). Not needed at
    #   TubeDETR's 185M params on 16 GB chips — this is the scaling path for
    #   larger text encoders / backbones (parallel/tp.py:shard_train_state).
    backbone_quant_frozen: str = "none"  # int8 the ALWAYS-FROZEN prefix
    #   (stem + layer1) of the TRAINING slow pass: those parameters never
    #   receive gradients (reference backbone.py:82-89; our grads are
    #   masked + DCE'd), so their forward can run on the int8 MXU path
    #   while the trainable layers 2-4 keep bf16. Parameters shared with
    #   the float path (per-call override); inference/share paths ignore it.
    backbone_quant_fast: str = "none"  # int8 the TRAINING fast-stream
    #   backbone pass only. The fast branch never backpropagates into the
    #   backbone (/root/reference/models/tubedetr.py:127-131 runs it under
    #   no_grad), so the T-frame fast pass — ~80% of training backbone
    #   FLOPs at stride 4 — can run on the int8 MXU path while the slow
    #   pass keeps bf16 gradients. Parameters are SHARED with the float
    #   backbone (nn.share_scope); requires calibrated qscales
    #   (int8_static) threaded into the train step.
    # text encoder dims (roberta-base defaults; shrink for tests)
    text_hidden_size: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_ffn: int = 3072
    text_max_positions: int = 514

    # ------------------------------------------------------------------------
    @property
    def n_clips(self) -> int:
        t = self.video_max_len_train
        return -(-t // self.stride) if self.stride else t

    @property
    def n_clips_eval(self) -> int:
        t = self.video_max_len
        return -(-t // self.stride) if self.stride else t

    def replace(self, **kw) -> "TubeDETRConfig":
        return dataclasses.replace(self, **kw)

    def apply_json_overlay(self, path: str) -> "TubeDETRConfig":
        """Merge a JSON dataset config over this config.

        Mirrors /root/reference/main.py:344-349: every key in the JSON file
        overwrites the current value. Unknown keys are rejected (the reference
        silently injects them into the namespace; we validate instead).
        """
        with open(path) as f:
            cfg = json.load(f)
        known = {f.name for f in dataclasses.fields(self)}
        renames = {"eval": "evaluate_only"}
        clean = {}
        for k, v in cfg.items():
            k = renames.get(k, k)
            if k not in known:
                raise ValueError(f"Unknown config key {k!r} in {path}")
            clean[k] = v
        return self.replace(**clean)

    def validate(self) -> "TubeDETRConfig":
        assert self.schedule in (
            "step",
            "multistep",
            "linear_with_warmup",
            "all_linear_with_warmup",
        ), self.schedule
        assert self.fast_mode in ("", "gating", "transformer", "pool", "noslow")
        assert self.position_embedding in ("sine", "learned", "v2", "v3")
        assert self.optimizer in ("adam", "sgd")
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {self.grad_accum}")
        if self.batch_size % self.grad_accum != 0:
            raise ValueError(
                "batch_size must split into equal microbatches: "
                f"batch_size={self.batch_size} % grad_accum="
                f"{self.grad_accum} != 0"
            )
        assert self.backbone_quant in (
            "none", "int8", "int8_static", "int8_qat"
        ), self.backbone_quant
        assert self.backbone_quant_fast in (
            "none", "int8", "int8_static"
        ), self.backbone_quant_fast
        assert self.backbone_quant_frozen in (
            "none", "int8", "int8_static"
        ), self.backbone_quant_frozen
        if self.backbone_quant_fast != "none":
            if not self.fast:
                raise ValueError("backbone_quant_fast requires fast=True")
        if (
            self.backbone_quant_frozen != "none"
            and self.backbone.startswith("timm_")
        ):
            # the timm families (EfficientNet, RegNet) have no
            # always-frozen prefix (timm freezes only BN, which is buffers
            # here) — backbone_quant/-_fast ARE supported for them
            # (models/efficientnet.py, models/regnet.py)
            raise NotImplementedError(
                "backbone_quant_frozen applies to the resnet family only"
            )
        if self.fused_bottleneck:
            # the kernel consumes calibrated static scales; "int8" is allowed
            # so calibration models can be cfg.replace(backbone_quant="int8")
            # of a fused config (the dynamic path simply ignores the flag)
            assert self.backbone_quant in ("int8", "int8_static"), (
                "fused_bottleneck requires an int8 backbone_quant mode"
            )
        assert self.remat_policy in ("", "full", "save_mid", "save_acts"), (
            self.remat_policy
        )
        assert self.hidden_dim % self.nheads == 0
        assert self.num_queries >= 1, self.num_queries
        if self.num_queries > 1 and self.no_tsa:
            # with --no_tsa the decoder emits (B, T*nq, 1) attention
            # weights; the per-frame query-block aggregation that restores
            # the (B, T, T) output contract needs real TSA weights, so the
            # combination would leak off-contract shapes into guided_attn
            # and the eval consumers
            raise ValueError(
                "num_queries > 1 requires temporal self-attention "
                "(incompatible with --no_tsa)"
            )
        # num_queries > 1: frame-major multi-query decoding with per-frame
        # Hungarian matching in the criterion (losses/matcher.py). This goes
        # BEYOND the reference, whose nq>1 path is non-functional (layout
        # mismatch, see matcher.py docstring) and unused in any published
        # config; eval reads query 0 by default, or ranks queries by sted
        # confidence with --nq_select sted (select_query_by_sted).
        if self.nq_select not in ("first", "sted", "objectness"):
            raise ValueError(f"unknown nq_select {self.nq_select!r}")
        if self.nq_match not in ("frame", "video"):
            raise ValueError(f"unknown nq_match {self.nq_match!r}")
        if self.nq_select == "sted" and not self.sted:
            raise ValueError(
                "--nq_select sted ranks queries by the sted head's "
                "confidence and requires --sted"
            )
        if self.fast_mode and not self.fast:
            raise ValueError("fast_mode requires fast=True")
        if not self.pass_pos_and_query:
            # rejected loudly rather than silently ignored: the reference's
            # --no_pass_pos_and_query path is vestigial MDETR legacy and
            # crashes there too (transformer.py:243-247 sets pos_embed=None,
            # then :325 torch.cat's it; the decode phase references an
            # undefined `src` at :466) — there is no working behavior to
            # reproduce
            raise NotImplementedError(
                "--no_pass_pos_and_query is non-functional in the reference "
                "(crashes in both encode and decode phases) and is not "
                "supported here"
            )
        return self


def loss_weight_dict(cfg: TubeDETRConfig) -> dict:
    """Loss-name -> coefficient map, expanded for aux decoder layers.

    Mirrors /root/reference/models/tubedetr.py:482-494.
    """
    wd = {
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
    }
    if cfg.sted:
        wd["loss_sted"] = cfg.sted_loss_coef
    if cfg.guided_attn:
        wd["loss_guided_attn"] = cfg.guided_attn_loss_coef
    if cfg.num_queries > 1:
        # per-(frame, query) objectness BCE against the Hungarian match —
        # TPU extra, exists only in the multi-query configuration
        wd["loss_objectness"] = cfg.objectness_loss_coef
    if cfg.aux_loss:
        aux = {}
        for i in range(cfg.dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        wd.update(aux)
    return wd
