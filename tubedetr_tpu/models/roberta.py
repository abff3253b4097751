"""RoBERTa text encoder in Flax (roberta-base by default).

A from-scratch JAX implementation of the HuggingFace ``RobertaModel`` the
reference instantiates at /root/reference/models/transformer.py:130-135. The
reference consumes only ``last_hidden_state``, so no pooler is built.

Numerics match the torch implementation (validated in
``tests/test_interop.py`` against a randomly initialised torch
``RobertaModel``):

* position ids = ``cumsum(attention_mask) * attention_mask + padding_idx``
  with ``padding_idx = 1`` (RoBERTa's offset quirk);
* post-LN encoder blocks; LayerNorm eps from the config (roberta-base ships
  ``layer_norm_eps=1e-5``);
* exact (erf) GELU, normal(0.02) init.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from tubedetr_tpu.models.layers import MultiHeadAttention


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    ln_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


def roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """HF ``create_position_ids_from_input_ids``: non-pad tokens get
    ``padding_idx + running count``, pad tokens get ``padding_idx``."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class RobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_pad_mask, deterministic: bool = True):
        c = self.cfg
        attn_out, _ = MultiHeadAttention(
            d_model=c.hidden_size,
            num_heads=c.num_attention_heads,
            dropout=c.attention_dropout,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="attention",
        )(x, x, x, key_pad_mask=key_pad_mask, deterministic=deterministic)
        attn_out = nn.Dropout(c.hidden_dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=self.dtype, name="attention_norm")(
            x + attn_out
        )
        h = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02),
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02), name="output")(h)
        h = nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=self.dtype, name="output_norm")(
            x + h
        )


class RobertaModel(nn.Module):
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, L) int32
        pad_mask: jnp.ndarray,  # (B, L) bool, True = padding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        word = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        pos_ids = roberta_position_ids(
            jnp.where(pad_mask, c.pad_token_id, input_ids), c.pad_token_id
        )
        pos = nn.Embed(
            c.max_position_embeddings,
            c.hidden_size,
            dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)
        tok_type = nn.Embed(
            c.type_vocab_size,
            c.hidden_size,
            dtype=self.dtype,
            name="token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=self.dtype, name="embeddings_norm")(x)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)
        for i in range(c.num_hidden_layers):
            x = RobertaLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, key_pad_mask=pad_mask, deterministic=deterministic
            )
        return x
