"""Shared neural net layers: multi-head attention, MLP heads, FeatureResizer.

These are the Flax building blocks for the video-text encoder and the
space-time decoder. Semantics follow the reference's torch layers
(/root/reference/models/transformer.py:608-773) so that converted PyTorch
checkpoints reproduce logits exactly:

* attention uses separate q/k/v/out projections (the converter splits torch's
  packed ``in_proj_weight``), scales q by ``head_dim**-0.5``, applies dropout
  on the softmax weights, and returns head-averaged attention weights (what
  ``torch.nn.MultiheadAttention`` returns, consumed by the guided-attention
  loss);
* masked softmax is NaN-safe: a fully-masked row yields zeros instead of NaN
  (the reference avoids this case with its "first position always valid"
  hack, which we also keep upstream for parity).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e30


def masked_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax that returns zeros (not NaN) for rows that are all ~NEG_INF."""
    m = jnp.max(logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(logits - jnp.maximum(m, NEG_INF / 2))
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


class MultiHeadAttention(nn.Module):
    """Batched MHA over (B, S, D) tensors with torch-compatible parameters.

    Default kernel init is xavier-uniform, matching the reference
    transformer's ``_reset_parameters``
    (/root/reference/models/transformer.py:154-157); RoBERTa overrides it
    with its normal(0.02) init.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: object = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Sq, D)
        key: jnp.ndarray,  # (B, Sk, D)
        value: jnp.ndarray,  # (B, Sk, D)
        key_pad_mask: Optional[jnp.ndarray] = None,  # (B, Sk) True = pad
        deterministic: bool = True,
    ):
        b, sq, _ = query.shape
        sk = key.shape[1]
        h = self.num_heads
        hd = self.d_model // h

        dense = lambda name: nn.Dense(
            self.d_model,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name=name,
        )
        q = dense("q_proj")(query).reshape(b, sq, h, hd)
        k = dense("k_proj")(key).reshape(b, sk, h, hd)
        v = dense("v_proj")(value).reshape(b, sk, h, hd)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        if key_pad_mask is not None:
            logits = jnp.where(key_pad_mask[:, None, None, :], NEG_INF, logits)
        weights = masked_softmax(logits, axis=-1)  # (B, h, Sq, Sk)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(
                weights, deterministic=deterministic
            )
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, sq, self.d_model)
        out = dense("out_proj")(out)
        # torch.nn.MultiheadAttention returns weights averaged over heads
        return out, jnp.mean(weights, axis=1)


class MLP(nn.Module):
    """The reference's box/sted head MLP (/root/reference/models/tubedetr.py:23-42).

    ReLU between layers; when ``dropout`` is set it is applied after *every*
    layer including the output (the sted head trains with dropout 0.5 on its
    logits — a reference quirk we reproduce).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(
                out, dtype=self.dtype, param_dtype=jnp.float32, name=f"layers_{i}"
            )(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
            if self.dropout:
                x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x


class FeatureResizer(nn.Module):
    """Linear 768->256 + LayerNorm(eps 1e-12) + dropout
    (/root/reference/models/transformer.py:754-773)."""

    output_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(
            self.output_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc",
        )(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x
