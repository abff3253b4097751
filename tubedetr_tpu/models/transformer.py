"""Video-text encoder and space-time decoder (the TubeDETR transformer).

TPU-first redesign of /root/reference/models/transformer.py. The reference's
two-phase ``encode_and_save`` API, sequence-first layouts, and Python loops
over per-video durations are replaced by:

* batch-first static shapes: clips ``(B, Tc, S, D)`` and frames
  ``(B, T, S, D)`` where ``S = h*w + L`` tokens, ``Tc = ceil(T / stride)``;
* temporal replication as a static gather ``clip = frame // stride``
  (/root/reference/models/transformer.py:393-427 expressed as index math);
* time-aligned cross-attention as attention over a ``(B*T, 1, S)`` layout —
  frame i's query attends only frame i's memory tokens — exactly the
  reference's reshape trick (transformer.py:724-742) which XLA batches as a
  single fused matmul;
* the whole encode+decode path is one jittable function of static-shaped
  arrays + masks, so the stride bookkeeping compiles into the same XLA
  program as the backbone.

Post-LN residual blocks, ReLU FFNs, pos-embed added to q/k only — all as in
the reference so converted checkpoints are logit-exact.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tubedetr_tpu.core.embeddings import time_embedding_sine
from tubedetr_tpu.core.masking import frame_to_clip
from tubedetr_tpu.models.layers import FeatureResizer, MultiHeadAttention

# torch nn.LayerNorm default (the reference's DETR-style layers never set
# eps, /root/reference/models/transformer.py). Flax's default is 1e-6 — a
# FORWARD-invisible difference (O(eps) when var >> eps, exactly 0 at a
# zero-variance input) that the gradient golden-parity test exposed: at the
# decoder's zero-init tgt the LN backward scales as 1/sqrt(eps), so the
# eps mismatch inflated the TSA value/out-proj bias grads by exactly
# sqrt(10) (tests/test_grad_parity.py).
LN_EPS = 1e-5


class EncoderLayer(nn.Module):
    """DETR-style post-LN encoder layer: self-attn(q=k=x+pos) + FFN
    (/root/reference/models/transformer.py:608-646)."""

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_pad_mask, deterministic: bool = True):
        qk = x + pos
        attn, weights = MultiHeadAttention(
            self.d_model, self.nheads, self.dropout, self.dtype, name="self_attn"
        )(qk, qk, x, key_pad_mask=key_pad_mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear1")(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x), weights


class Encoder(nn.Module):
    """Stack of encoder layers, optional final LayerNorm (used by the
    fast-branch 'transformer' variant only — the main encoder has none)."""

    num_layers: int
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    final_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_pad_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x, _ = EncoderLayer(
                self.d_model,
                self.nheads,
                self.dim_feedforward,
                self.dropout,
                self.dtype,
                name=f"layer_{i}",
            )(x, pos, key_pad_mask, deterministic)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return x


class DecoderLayer(nn.Module):
    """Space-time decoder layer (/root/reference/models/transformer.py:649-751).

    1. temporal self-attention (TSA) across the T time queries of each video;
       with ``no_tsa`` each query instead attends only itself;
    2. time-aligned cross-attention: frame i's query attends only the memory
       tokens of frame i, realised by folding T into the batch axis;
    3. FFN. Norm layers are numbered 1/3/4 to match the reference's
       checkpoint keys (norm2 was deleted upstream).
    """

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    no_tsa: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, T*nq, D) frame-major time queries
        query_pos: jnp.ndarray,  # (B, T*nq, D)
        memory: jnp.ndarray,  # (B, T, S, D) per-frame memory
        memory_pos: jnp.ndarray,  # (B, T, S, D)
        memory_pad_mask: jnp.ndarray,  # (B, T, S) True = pad
        query_pad_mask: Optional[jnp.ndarray] = None,  # (B, T*nq) True = pad
        deterministic: bool = True,
    ):
        b, tq, d = tgt.shape
        t, s = memory.shape[1], memory.shape[2]
        nq = tq // t  # frame-major: frame i's queries at [i*nq, (i+1)*nq)
        qk = tgt + query_pos

        # --- temporal self-attention -----------------------------------
        if self.no_tsa:
            sa, weights = MultiHeadAttention(
                self.d_model, self.nheads, self.dropout, self.dtype, name="self_attn"
            )(
                qk.reshape(b * tq, 1, d),
                qk.reshape(b * tq, 1, d),
                tgt.reshape(b * tq, 1, d),
                deterministic=deterministic,
            )
            sa = sa.reshape(b, tq, d)
            weights = weights.reshape(b, tq, 1)
        else:
            sa, weights = MultiHeadAttention(
                self.d_model, self.nheads, self.dropout, self.dtype, name="self_attn"
            )(qk, qk, tgt, key_pad_mask=query_pad_mask, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(tgt)

        # --- time-aligned cross-attention ------------------------------
        # each frame's nq queries attend only that frame's memory tokens
        q = (tgt + query_pos).reshape(b * t, nq, d)
        k = (memory + memory_pos).reshape(b * t, s, d)
        v = memory.reshape(b * t, s, d)
        ca, cross_weights = MultiHeadAttention(
            self.d_model, self.nheads, self.dropout, self.dtype,
            name="cross_attn_image",
        )(
            q,
            k,
            v,
            key_pad_mask=memory_pad_mask.reshape(b * t, s),
            deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout)(ca.reshape(b, tq, d),
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(tgt)

        # --- FFN --------------------------------------------------------
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear1")(tgt)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear2")(h)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm4")(tgt)
        return tgt, weights, cross_weights.reshape(b, tq, s)


class Decoder(nn.Module):
    """Stack of decoder layers returning every layer's (shared-)normalized
    output for the aux losses (/root/reference/models/transformer.py:532-605:
    every intermediate, including the last, passes through the same final
    LayerNorm)."""

    num_layers: int
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    no_tsa: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt,
        query_pos,
        memory,
        memory_pos,
        memory_pad_mask,
        query_pad_mask=None,
        deterministic: bool = True,
    ):
        norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")
        hs, tsa_w, cross_w = [], [], []
        for i in range(self.num_layers):
            tgt, w, cw = DecoderLayer(
                self.d_model,
                self.nheads,
                self.dim_feedforward,
                self.dropout,
                self.no_tsa,
                self.dtype,
                name=f"layer_{i}",
            )(
                tgt,
                query_pos,
                memory,
                memory_pos,
                memory_pad_mask,
                query_pad_mask,
                deterministic,
            )
            hs.append(norm(tgt))
            tsa_w.append(w)
            cross_w.append(cw)
        # (n_layers, B, T, D), (n_layers, B, T, T[|1]), (n_layers, B, T, S)
        return jnp.stack(hs), jnp.stack(tsa_w), jnp.stack(cross_w)


class TubeDETRTransformer(nn.Module):
    """Joint space-text encoder + fast branch + temporal replication +
    space-time decoder, as one functional forward."""

    d_model: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    video_max_len: int = 200
    stride: int = 5
    no_tsa: bool = False
    fast: bool = True
    fast_mode: str = ""
    learn_time_embed: bool = False
    no_time_embed: bool = False
    text_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    def time_embed_table(self, t: int) -> jnp.ndarray:
        if self.no_time_embed:
            return jnp.zeros((t, self.d_model), dtype=self.dtype)
        if self.learn_time_embed:
            table = self.param(
                "time_embed",
                nn.initializers.uniform(scale=1.0),
                (self.video_max_len, self.d_model),
            )
        else:
            table = time_embedding_sine(self.video_max_len, self.d_model)
        return table[:t].astype(self.dtype)

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, Tc, hw, D) projected slow visual tokens
        src_pad_mask: jnp.ndarray,  # (B, Tc, hw) True = pad
        pos_embed: jnp.ndarray,  # (B, Tc, hw, D) spatial sine embedding
        text_memory: jnp.ndarray,  # (B, L, text_dim) encoded caption
        text_pad_mask: jnp.ndarray,  # (B, L) True = pad
        query_embed: jnp.ndarray,  # (num_queries=1, D) learned object query
        durations: jnp.ndarray,  # (B,) int frame counts
        frame_pad_mask: jnp.ndarray,  # (B, T, hw) per-frame pad (fast mask when
        #   fast branch is on, replicated clip mask otherwise)
        fast_src: Optional[jnp.ndarray] = None,  # (B, T, hw, D)
        deterministic: bool = True,
    ):
        b, tc, hw, d = src.shape
        t = frame_pad_mask.shape[1]
        l = text_memory.shape[1]

        # ---- caption -> shared d_model space ---------------------------
        text_resized = FeatureResizer(
            self.d_model, dropout=0.1, dtype=self.dtype, name="resizer"
        )(text_memory, deterministic=deterministic)  # (B, L, D)

        # ---- per-clip token sequences: [visual | text] -----------------
        text_clips = jnp.broadcast_to(
            text_resized[:, None], (b, tc, l, self.d_model)
        )
        text_mask_clips = jnp.broadcast_to(text_pad_mask[:, None], (b, tc, l))
        cat = jnp.concatenate([src, text_clips], axis=2)  # (B, Tc, hw+L, D)
        cat_mask = jnp.concatenate([src_pad_mask, text_mask_clips], axis=2)
        cat_pos = jnp.concatenate(
            [pos_embed, jnp.zeros_like(text_clips)], axis=2
        )
        s = hw + l

        # ---- joint space-text encoder (per clip) -----------------------
        if self.fast_mode == "noslow":
            img_memory = cat
        else:
            img_memory = Encoder(
                self.enc_layers,
                self.d_model,
                self.nheads,
                self.dim_feedforward,
                self.dropout,
                final_norm=False,
                dtype=self.dtype,
                name="encoder",
            )(
                cat.reshape(b * tc, s, self.d_model),
                cat_pos.reshape(b * tc, s, self.d_model),
                cat_mask.reshape(b * tc, s),
                deterministic,
            ).reshape(b, tc, s, self.d_model)

        # ---- fast branch ----------------------------------------------
        fast_memory = None
        if self.fast and fast_src is not None:
            if self.fast_mode == "transformer":
                # 1-layer temporal transformer across T per spatial position
                fs = fast_src.transpose(0, 2, 1, 3).reshape(b * hw, t, d)
                te = jnp.broadcast_to(
                    self.time_embed_table(t)[None], (b * hw, t, d)
                )
                fm = Encoder(
                    1,
                    self.d_model,
                    self.nheads,
                    self.dim_feedforward,
                    self.dropout,
                    final_norm=True,
                    dtype=self.dtype,
                    name="fast_encoder",
                )(fs, te, None, deterministic)
                fast_memory = fm.reshape(b, hw, t, d).transpose(0, 2, 1, 3)
            elif self.fast_mode == "pool":
                # masked spatial mean-pool, then linear, broadcast back
                valid = (~frame_pad_mask)[..., None].astype(fast_src.dtype)
                denom = jnp.clip(valid.sum(axis=2), min=1.0)
                pooled = (fast_src * valid).sum(axis=2) / denom  # (B, T, D)
                pooled = nn.Dense(
                    self.d_model, dtype=self.dtype, name="fast_encoder"
                )(pooled)
                fast_memory = jnp.broadcast_to(
                    pooled[:, :, None], (b, t, hw, d)
                )
            else:  # "" (default residual), "gating", "noslow"
                fast_memory = nn.Dense(
                    self.d_model, dtype=self.dtype, name="fast_encoder"
                )(fast_src)

        # ---- temporal replication: clip -> its k frames ----------------
        f2c = frame_to_clip(t, self.stride)  # (T,)
        memory_frames = img_memory[:, f2c]  # (B, T, S, D)
        pos_frames = cat_pos[:, f2c]

        # decoder memory mask: per-frame visual pad + text pad, then frames
        # beyond each video's duration fully padded except position 0
        mem_mask = jnp.concatenate(
            [frame_pad_mask, jnp.broadcast_to(text_pad_mask[:, None], (b, t, l))],
            axis=2,
        )
        mem_mask = mem_mask.at[:, :, 0].set(False)  # avoid empty masks

        # ---- fast/slow aggregation ------------------------------------
        if self.fast and fast_memory is not None:
            slow_visual = memory_frames[:, :, :hw]
            if self.fast_mode == "noslow":
                text_frames = memory_frames[:, :, hw:]
                memory_frames = jnp.concatenate([fast_memory, text_frames], axis=2)
            elif self.fast_mode == "gating":
                gated = slow_visual * jax.nn.sigmoid(fast_memory)
                memory_frames = jnp.concatenate(
                    [slow_visual + gated, memory_frames[:, :, hw:]], axis=2
                )
            else:  # default / transformer / pool: zero-init residual fusion
                mix = nn.Dense(
                    self.d_model,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name="fast_residual",
                )(slow_visual + fast_memory)
                memory_frames = jnp.concatenate(
                    [slow_visual + mix, memory_frames[:, :, hw:]], axis=2
                )

        # ---- time queries ---------------------------------------------
        # frame-major layout for num_queries >= 1: frame i's nq queries sit
        # at positions [i*nq, (i+1)*nq) of the (T*nq) query axis. (The
        # reference's nq>1 layout is internally inconsistent — query-major
        # embed repeat at transformer.py:211-218 vs frame-major padding mask
        # at :227-238 — and unused; we define the consistent convention.)
        nq = query_embed.shape[0]
        query_pos = (
            query_embed[None, None, :, :]
            + self.time_embed_table(t)[None, :, None, :]
        )  # (1, T, nq, D)
        query_pos = jnp.broadcast_to(
            query_pos, (b, t, nq, self.d_model)
        ).reshape(b, t * nq, self.d_model)
        query_pad = jnp.arange(t)[None] >= durations[:, None]  # (B, T)
        query_pad = jnp.repeat(query_pad, nq, axis=1)  # (B, T*nq)
        query_pad = query_pad.at[:, 0].set(False)  # avoid empty masks
        tgt = jnp.zeros((b, t * nq, self.d_model), dtype=self.dtype)

        # ---- space-time decoder ---------------------------------------
        hs, tsa_weights, cross_weights = Decoder(
            self.dec_layers,
            self.d_model,
            self.nheads,
            self.dim_feedforward,
            self.dropout,
            self.no_tsa,
            self.dtype,
            name="decoder",
        )(
            tgt,
            query_pos,
            memory_frames,
            pos_frames,
            mem_mask,
            query_pad,
            deterministic,
        )
        return {
            "hs": hs,  # (n_layers, B, T*nq, D) frame-major
            "tsa_weights": tsa_weights,  # (n_layers, B, T*nq, T*nq[|1])
            "cross_weights": cross_weights,  # (n_layers, B, T*nq, hw+L)
            "memory_frames": memory_frames,
            "n_visual_tokens": hw,
        }
