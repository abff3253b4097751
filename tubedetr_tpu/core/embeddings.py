"""Sine / learned position and time embeddings (pure functions).

Math mirrors /root/reference/models/position_encoding.py but is laid out
channels-last (NHWC) for TPU and computed as pure functions of the padding
mask so everything stays inside one jitted program.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine(
    pad_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """2D sine position embedding over the valid region of a padded image.

    :param pad_mask: (..., H, W) bool, True on padded pixels
        (the reference's NestedTensor mask convention,
        /root/reference/models/position_encoding.py:71-94).
    :return: (..., H, W, 2*num_pos_feats) with [y-features | x-features].
    """
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=-2)
    x_embed = jnp.cumsum(not_mask, axis=-1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[..., -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[..., :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t  # (..., H, W, F)
    pos_y = y_embed[..., None] / dim_t
    # interleave sin of even channels with cos of odd channels
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], num_pos_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def time_embedding_sine(
    max_len: int, d_model: int, dtype=jnp.float32
) -> jnp.ndarray:
    """1D transformer sinusoid table, shape (max_len, d_model).

    Mirrors /root/reference/models/position_encoding.py:30-49. Even channels
    get sin, odd channels get cos; frequency decays as 10000^(-2i/d).
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    te = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    te = te.at[:, 0::2].set(jnp.sin(position * div_term))
    te = te.at[:, 1::2].set(jnp.cos(position * div_term[: (d_model // 2)]))
    return te.astype(dtype)
