"""TubeDETR top-level model: backbone + text encoder + transformer + heads.

TPU-first single-program redesign of /root/reference/models/tubedetr.py.
Differences from the reference that are deliberate architecture choices (not
behavior changes):

* one jittable forward instead of the two-phase ``encode_and_save`` API — the
  whole clip (backbone over all frames, text encoder, video-text encoder,
  space-time decoder, heads) compiles as a single XLA program;
* static shapes everywhere: every video is padded to ``T`` frames /
  ``Tc = ceil(T/stride)`` clips and ragged structure is carried by masks, so
  XLA can tile the big matmuls onto the MXU without recompilation;
* NHWC layout; the 1x1 ``input_proj`` conv is a Dense over the channel axis;
* the fast branch's backbone pass runs under ``stop_gradient``
  (/root/reference/models/tubedetr.py:127-131: fast does not backprop into
  the visual backbone).

Inputs are pre-normalized frames plus masks (see ``TubeDETRBatch`` in
``tubedetr_tpu/data/collate.py``); the text is pre-tokenized to static length.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.core.embeddings import position_embedding_sine
from tubedetr_tpu.core.masking import downsample_pad_mask
from tubedetr_tpu.core.sharding import constrain_frame_major
from tubedetr_tpu.models.layers import MLP
from tubedetr_tpu.models.resnet import ResNet
from tubedetr_tpu.models.roberta import RobertaConfig, RobertaModel
from tubedetr_tpu.models.transformer import TubeDETRTransformer


def _dtype_of(cfg: TubeDETRConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class TubeDETR(nn.Module):
    cfg: TubeDETRConfig

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        if cfg.backbone.startswith("timm_"):
            # timm backbones (/root/reference/models/backbone.py:188-217):
            # Flax re-implementation with timm naming so released timm
            # checkpoints convert (interop convert_timm_efficientnet)
            from tubedetr_tpu.models.convnext import _CONVNEXT_CFGS, ConvNeXt
            from tubedetr_tpu.models.efficientnet import (
                _VARIANTS,
                EfficientNet,
            )
            from tubedetr_tpu.models.regnet import _REGNET_CFGS, RegNet

            arch = cfg.backbone[len("timm_"):]
            if arch in _VARIANTS:
                self.backbone = EfficientNet(
                    arch=arch, dtype=dtype, quant=cfg.backbone_quant
                )
            elif arch in _REGNET_CFGS:
                self.backbone = RegNet(
                    arch=arch, dtype=dtype, quant=cfg.backbone_quant
                )
            elif arch in _CONVNEXT_CFGS:
                self.backbone = ConvNeXt(
                    arch=arch, dtype=dtype, quant=cfg.backbone_quant
                )
            else:
                raise NotImplementedError(
                    f"timm backbone {arch!r} not available; supported: "
                    f"{sorted(_VARIANTS) + sorted(_REGNET_CFGS) + sorted(_CONVNEXT_CFGS)} "
                    f"or resnet50/101/152[-gn]"
                )
        else:
            self.backbone = ResNet(
                arch=cfg.backbone,
                dilation=cfg.dilation,
                remat=cfg.remat_backbone,
                remat_policy=cfg.remat_policy,
                scan_blocks=cfg.scan_backbone_blocks,
                space_to_depth=cfg.space_to_depth_stem,
                quant=cfg.backbone_quant,
                fused_blocks=cfg.fused_bottleneck,
                dtype=dtype,
            )
        self.text_encoder = RobertaModel(
            RobertaConfig(
                vocab_size=cfg.text_vocab_size,
                hidden_size=cfg.text_hidden_size,
                num_hidden_layers=cfg.text_layers,
                num_attention_heads=cfg.text_heads,
                intermediate_size=cfg.text_ffn,
                max_position_embeddings=cfg.text_max_positions,
            ),
            dtype=dtype,
        )
        self.input_proj = nn.Dense(cfg.hidden_dim, dtype=dtype, param_dtype=jnp.float32)
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(stddev=1.0),
            (cfg.num_queries, cfg.hidden_dim),
        )
        self.transformer = TubeDETRTransformer(
            d_model=cfg.hidden_dim,
            nheads=cfg.nheads,
            enc_layers=cfg.enc_layers,
            dec_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            video_max_len=cfg.video_max_len_train,
            stride=cfg.stride,
            no_tsa=cfg.no_tsa,
            fast=cfg.fast,
            fast_mode=cfg.fast_mode,
            learn_time_embed=cfg.learn_time_embed,
            no_time_embed=cfg.no_time_embed,
            dtype=dtype,
        )
        self.bbox_embed = MLP(cfg.hidden_dim, 4, 3, dtype=dtype)
        if cfg.sted:
            self.sted_embed = MLP(cfg.hidden_dim, 2, 2, dropout=0.5, dtype=dtype)
        if cfg.num_queries > 1:
            # per-(frame, query) objectness logit, trained against the
            # Hungarian match (losses/criterion.py loss_objectness) — the
            # selection signal the reference never had for nq>1 (TPU extra;
            # absent at nq=1 so reference checkpoints convert untouched)
            self.objectness_embed = MLP(cfg.hidden_dim, 1, 2, dtype=dtype)
        if cfg.position_embedding in ("learned", "v3"):
            # 50x50 learned 2D grid (/root/reference/models/position_encoding.py:97-131)
            self.row_embed = self.param(
                "row_embed",
                nn.initializers.uniform(scale=1.0),
                (50, cfg.hidden_dim // 2),
            )
            self.col_embed = self.param(
                "col_embed",
                nn.initializers.uniform(scale=1.0),
                (50, cfg.hidden_dim // 2),
            )

    def backbone_feats(
        self, frames: jnp.ndarray,
        stop_backbone_grad=False, quant_frozen_prefix=False,
    ):
        """Backbone trunk over a flat (N, H, W, 3) frame batch -> raw
        (N, h, w, C) features. With ``stop_backbone_grad`` the features are
        detached (the reference's fast-branch semantics,
        /root/reference/models/tubedetr.py:127-131); when
        ``backbone_quant_fast`` is set this gradient-free pass runs the
        parameter-shared int8 backbone variant instead.
        """
        cfg = self.cfg
        if stop_backbone_grad and cfg.backbone_quant_fast != "none":
            # the gradient-free fast pass runs the int8 MXU path; the
            # per-call quant override reuses the SAME parameters (flax
            # compact submodules share by name), adding only qscales
            feats = self.backbone(
                frames.astype(_dtype_of(cfg)),
                quant_override=cfg.backbone_quant_fast,
                # unrolling the scanned tails (stacked params kept) lets the
                # int8 quantize fuse into conv epilogues across block
                # boundaries — affordable here because this pass has no
                # backward; the trainable slow pass keeps the scan
                unroll_tail=cfg.unroll_quant_fast,
            )
        elif quant_frozen_prefix and cfg.backbone_quant_frozen != "none":
            # training slow pass: only the always-frozen prefix
            # (stem + layer1 — no parameter gradients by construction)
            # runs int8; the trainable layers keep the float path
            feats = self.backbone(
                frames.astype(_dtype_of(cfg)),
                frozen_prefix_quant=cfg.backbone_quant_frozen,
            )
        else:
            feats = self.backbone(frames.astype(_dtype_of(cfg)))
        # Anchor the backbone output to the frame-major activation layout
        # before the (possibly FSDP-sharded) input projection: without this,
        # the projection kernel's data-sharded contracting dim propagates
        # backward onto the channel axis and GSPMD resolves the collision
        # with an involuntary full rematerialization (core/sharding.py).
        # No-op without an active mesh context.
        feats = constrain_frame_major(feats)
        if stop_backbone_grad:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def project_frames(self, feats: jnp.ndarray, pad_mask: jnp.ndarray):
        """Projection + masks over raw (N, h, w, C) backbone features.

        Returns projected tokens (N, h*w, D), feature pad mask (N, h*w) and
        spatial sine pos embedding (N, h*w, D); ``pad_mask`` is the full-res
        (N, H, W) frame pad mask.
        """
        cfg = self.cfg
        n = feats.shape[0]
        h, w = feats.shape[1], feats.shape[2]
        fmask = downsample_pad_mask(pad_mask, h, w)  # (N, h, w)
        if cfg.position_embedding in ("learned", "v3"):
            # channels ordered [x | y] as in the reference learned variant
            pos = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        self.col_embed[None, :w], (h, w, cfg.hidden_dim // 2)
                    ),
                    jnp.broadcast_to(
                        self.row_embed[:h, None], (h, w, cfg.hidden_dim // 2)
                    ),
                ],
                axis=-1,
            ).astype(feats.dtype)
            pos = jnp.broadcast_to(pos[None], (n, h, w, cfg.hidden_dim))
        else:
            pos = position_embedding_sine(
                fmask, num_pos_feats=cfg.hidden_dim // 2, dtype=feats.dtype
            )
        src = self.input_proj(feats)
        return (
            src.reshape(n, h * w, cfg.hidden_dim),
            fmask.reshape(n, h * w),
            pos.reshape(n, h * w, cfg.hidden_dim),
        )

    def encode_frames(
        self, frames: jnp.ndarray, pad_mask: jnp.ndarray,
        stop_backbone_grad=False, quant_frozen_prefix=False,
    ):
        """Backbone + projection over a flat (N, H, W, 3) frame batch
        (``backbone_feats`` then ``project_frames``)."""
        return self.project_frames(
            self.backbone_feats(
                frames,
                stop_backbone_grad=stop_backbone_grad,
                quant_frozen_prefix=quant_frozen_prefix,
            ),
            pad_mask,
        )

    def __call__(
        self,
        frames_slow: jnp.ndarray,  # (B, Tc, H, W, 3) normalized
        slow_pad_mask: jnp.ndarray,  # (B, Tc, H, W) True = pad (spatial+temporal)
        tokens: jnp.ndarray,  # (B, L) int32
        text_pad_mask: jnp.ndarray,  # (B, L) True = pad
        durations: jnp.ndarray,  # (B,) int32
        frames_fast: Optional[jnp.ndarray] = None,  # (B, T, H, W, 3)
        fast_pad_mask: Optional[jnp.ndarray] = None,  # (B, T, H, W)
        deterministic: bool = True,
        train: Optional[bool] = None,
    ):
        """``train`` selects TRAINING backbone semantics (two passes: slow
        with gradients, fast stop_gradient'd — the reference's
        /root/reference/models/tubedetr.py:127-131) independently of
        ``deterministic`` (dropout). Defaults to ``not deterministic`` for
        callers that predate the split; the jitted train step passes
        ``train=True`` explicitly so a dropout-free training step (e.g. the
        gradient golden-parity test) cannot silently flip into the fused
        inference backbone whose fast stream is NOT stop_gradient'd."""
        cfg = self.cfg
        if train is None:
            train = not deterministic
        b, tc = frames_slow.shape[:2]
        t = (
            frames_fast.shape[1]
            if frames_fast is not None
            else min(tc * max(cfg.stride, 1), cfg.video_max_len_train)
        )

        # ---- backbone ---------------------------------------------------
        # At inference the slow frames ARE the stride-k subsample of the fast
        # frames (collate builds them that way), so a single backbone pass
        # over the fast stream serves both branches: slow tokens are a
        # ::k gather of the fast tokens. Saves the separate Tc-frame pass
        # (20% of backbone FLOPs at k=4). Training keeps two passes because
        # only the slow pass backpropagates into the backbone
        # (/root/reference/models/tubedetr.py:127-131).
        share = (
            not train
            and cfg.share_backbone_inference
            and cfg.fast
            and frames_fast is not None
            and cfg.stride > 0
            and frames_fast.shape[1] >= (tc - 1) * cfg.stride + 1
        )
        fast_src = None
        if share:
            fsrc, fmask, fpos = self.encode_frames(
                frames_fast.reshape((b * t,) + frames_fast.shape[2:]),
                fast_pad_mask.reshape((b * t,) + fast_pad_mask.shape[2:]),
            )
            hw = fsrc.shape[1]
            fast_src = fsrc.reshape(b, t, hw, cfg.hidden_dim)
            frame_pad_spatial = fmask.reshape(b, t, hw)
            src = fast_src[:, :: cfg.stride][:, :tc]
            src_mask = frame_pad_spatial[:, :: cfg.stride][:, :tc]
            pos = fpos.reshape(b, t, hw, cfg.hidden_dim)[:, :: cfg.stride][:, :tc]
            frame_pad = frame_pad_spatial
        else:
            # slow pathway: backbone over every clip frame (the training
            # pass — the always-frozen prefix may run int8, see
            # backbone_quant_frozen)
            slow_feats = self.backbone_feats(
                frames_slow.reshape((b * tc,) + frames_slow.shape[2:]),
                quant_frozen_prefix=True,
            )
            src, src_mask, pos = self.project_frames(
                slow_feats,
                slow_pad_mask.reshape((b * tc,) + slow_pad_mask.shape[2:]),
            )
            hw = src.shape[1]
            src = src.reshape(b, tc, hw, cfg.hidden_dim)
            src_mask = src_mask.reshape(b, tc, hw)
            pos = pos.reshape(b, tc, hw, cfg.hidden_dim)
            # fast pathway (no gradient to the backbone)
            if cfg.fast and frames_fast is not None:
                k = max(cfg.stride, 1)
                # Training share (beyond the reference): the slow pass just
                # computed the backbone on every k-th fast frame (the collate
                # contract: slow = fast[::k], data/collate.py), so the
                # gradient-free fast pass only needs the OTHER k-1 of every k
                # frames — its every-k-th features are stop_gradient(slow
                # features). Exact for the float path (same params, same
                # inputs, same trunk); under --backbone_quant_fast the reused
                # frames are the float-path values instead of the int8
                # approximation (strictly closer to the reference's
                # full-precision no-grad fast pass,
                # /root/reference/models/tubedetr.py:127-131). Skips 1/k of
                # the fast-pass backbone FLOPs (25% at the headline k=4).
                share_train = (
                    cfg.share_backbone_train
                    and cfg.stride > 0
                    and tc == -(-t // k)
                )
                if share_train and k == 1:
                    # stride 1: the fast stream IS the slow stream — reuse
                    # everything, no fast backbone pass at all
                    fh, fw, fc = slow_feats.shape[1:]
                    comb = jax.lax.stop_gradient(slow_feats).reshape(
                        b, t, fh, fw, fc
                    )
                elif share_train:
                    # pad the frame axis to tc*k so clips reshape evenly; the
                    # <=k-1 pad frames are computed and sliced away below
                    ff = frames_fast
                    if tc * k > t:
                        ff = jnp.pad(
                            ff, ((0, 0), (0, tc * k - t)) + ((0, 0),) * 3
                        )
                    rest = ff.reshape(
                        (b, tc, k) + ff.shape[2:]
                    )[:, :, 1:].reshape((b * tc * (k - 1),) + ff.shape[2:])
                    rest_feats = self.backbone_feats(
                        rest, stop_backbone_grad=True
                    )
                    fh, fw, fc = rest_feats.shape[1:]
                    comb = jnp.concatenate(
                        [
                            jax.lax.stop_gradient(slow_feats).reshape(
                                b, tc, 1, fh, fw, fc
                            ).astype(rest_feats.dtype),
                            rest_feats.reshape(b, tc, k - 1, fh, fw, fc),
                        ],
                        axis=2,
                    ).reshape(b, tc * k, fh, fw, fc)[:, :t]
                if share_train:
                    fsrc, fmask, _ = self.project_frames(
                        comb.reshape((b * t,) + comb.shape[2:]),
                        fast_pad_mask.reshape(
                            (b * t,) + fast_pad_mask.shape[2:]
                        ),
                    )
                else:
                    fsrc, fmask, _ = self.encode_frames(
                        frames_fast.reshape((b * t,) + frames_fast.shape[2:]),
                        fast_pad_mask.reshape(
                            (b * t,) + fast_pad_mask.shape[2:]
                        ),
                        stop_backbone_grad=True,
                    )
                fast_src = fsrc.reshape(b, t, hw, cfg.hidden_dim)
                frame_pad = fmask.reshape(b, t, hw)
            else:
                # replicate each clip's feature mask onto its frames
                f2c = jnp.arange(t) // max(cfg.stride, 1)
                frame_pad = src_mask[:, f2c]

        # temporal padding: clips past ceil(dur/k) are fully masked
        n_clips_valid = -(-durations // max(cfg.stride, 1))
        clip_pad = jnp.arange(tc)[None] >= n_clips_valid[:, None]
        src_mask = src_mask | clip_pad[:, :, None]
        src_mask = src_mask.at[:, :, 0].set(False)  # avoid empty masks
        # frames past the duration are fully padded
        time_pad = jnp.arange(t)[None] >= durations[:, None]
        frame_pad = frame_pad | time_pad[:, :, None]

        # ---- text encoder ----------------------------------------------
        if cfg.freeze_text_encoder:
            text_memory = jax.lax.stop_gradient(
                self.text_encoder(tokens, text_pad_mask, deterministic=True)
            )
        else:
            text_memory = self.text_encoder(
                tokens, text_pad_mask, deterministic=deterministic
            )

        # ---- transformer ----------------------------------------------
        tr = self.transformer(
            src=src,
            src_pad_mask=src_mask,
            pos_embed=pos,
            text_memory=text_memory,
            text_pad_mask=text_pad_mask,
            query_embed=self.query_embed,
            durations=durations,
            frame_pad_mask=frame_pad,
            fast_src=fast_src,
            deterministic=deterministic,
        )
        hs = tr["hs"]  # (n_layers, B, T*nq, D) frame-major

        # ---- heads ------------------------------------------------------
        nq = cfg.num_queries
        outputs_coord = jax.nn.sigmoid(
            self.bbox_embed(hs, deterministic=deterministic)
        )  # (n_layers, B, T*nq, 4)
        if cfg.sted:
            outputs_sted = self.sted_embed(hs, deterministic=deterministic)
        if nq == 1:
            out = {
                "pred_boxes": outputs_coord[-1].astype(jnp.float32),
                "aux_pred_boxes": outputs_coord[:-1].astype(jnp.float32),
                "weights": tr["tsa_weights"][-1].astype(jnp.float32),
                "aux_weights": tr["tsa_weights"][:-1].astype(jnp.float32),
                "ca_weights": tr["cross_weights"][-1].astype(jnp.float32),
                "n_visual_tokens": tr["n_visual_tokens"],
            }
            if cfg.sted:
                out["pred_sted"] = outputs_sted[-1].astype(jnp.float32)
                out["aux_pred_sted"] = outputs_sted[:-1].astype(jnp.float32)
            return out

        # num_queries > 1 (beyond the reference, whose nq>1 path is
        # non-functional — see losses/matcher.py): per-query outputs under
        # *_queries for the Hungarian-matched training losses; the
        # canonical single-tube outputs read query 0. The reference has no
        # objectness head to rank queries at inference (the structural
        # reason it never uses nq>1); here objectness_embed provides that
        # signal for --nq_select objectness.
        nl = outputs_coord.shape[0]
        b2, tq = outputs_coord.shape[1], outputs_coord.shape[2]
        t_frames = tq // nq
        coord_q = outputs_coord.reshape(nl, b2, t_frames, nq, 4)
        # TSA weights: (B, T*nq, T*nq) -> per-frame aggregate (B, T, T)
        # (mean over each frame's query block on both axes) so the guided-
        # attention loss and the eval contract keep their (B, T, T) shape
        tsa = tr["tsa_weights"]
        if tsa.shape[-1] == tq:  # full TSA (not the no_tsa (.., 1) shape)
            tsa = tsa.reshape(nl, b2, t_frames, nq, t_frames, nq)
            tsa = tsa.mean(axis=(3, 5)) * nq  # row-mean, column-sum
        ca = tr["cross_weights"].reshape(nl, b2, t_frames, nq, -1).mean(3)
        out = {
            "pred_boxes": coord_q[-1, :, :, 0].astype(jnp.float32),
            "aux_pred_boxes": coord_q[:-1, :, :, 0].astype(jnp.float32),
            "pred_boxes_queries": coord_q[-1].astype(jnp.float32),
            "aux_pred_boxes_queries": coord_q[:-1].astype(jnp.float32),
            "weights": tsa[-1].astype(jnp.float32),
            "aux_weights": tsa[:-1].astype(jnp.float32),
            "ca_weights": ca[-1].astype(jnp.float32),
            "n_visual_tokens": tr["n_visual_tokens"],
        }
        if cfg.sted:
            sted_q = outputs_sted.reshape(nl, b2, t_frames, nq, 2)
            out["pred_sted"] = sted_q[-1, :, :, 0].astype(jnp.float32)
            out["aux_pred_sted"] = sted_q[:-1, :, :, 0].astype(jnp.float32)
            out["pred_sted_queries"] = sted_q[-1].astype(jnp.float32)
            out["aux_pred_sted_queries"] = sted_q[:-1].astype(jnp.float32)
        # per-(frame, query) objectness logits (nq>1 only): the learned
        # query-selection signal for --nq_select objectness
        obj_q = self.objectness_embed(hs, deterministic=deterministic)
        obj_q = obj_q.reshape(nl, b2, t_frames, nq)
        out["pred_obj_queries"] = obj_q[-1].astype(jnp.float32)
        out["aux_pred_obj_queries"] = obj_q[:-1].astype(jnp.float32)
        return out


def build_model(cfg: TubeDETRConfig) -> TubeDETR:
    return TubeDETR(cfg=cfg.validate())
