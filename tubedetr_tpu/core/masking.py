"""Padding-mask conventions and ragged-to-static index helpers.

Convention throughout the framework (inherited from the reference's
NestedTensor): boolean ``pad_mask`` arrays are True on PADDED positions.

Where the reference loops over per-video durations in Python
(/root/reference/models/tubedetr.py:140-187, transformer.py:393-427), we keep
every video padded to the static maxima (T frames, ceil(T/k) clips) and
express all the bookkeeping as vectorized index arithmetic so it lives inside
a single XLA program with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def time_pad_mask(durations: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B,) int durations -> (B, T) bool, True on temporally padded frames."""
    return jnp.arange(t)[None, :] >= durations[:, None]


def clip_pad_mask(durations: jnp.ndarray, n_clips: int, stride: int) -> jnp.ndarray:
    """(B,) durations -> (B, n_clips) bool, True on clips past ceil(dur/k)."""
    n_valid = -(-durations // stride)  # ceil division
    return jnp.arange(n_clips)[None, :] >= n_valid[:, None]


def frame_to_clip(t: int, stride: int) -> jnp.ndarray:
    """Static (T,) map: frame index -> owning clip index (i // k).

    This is exactly the reference's temporal-replication rule: clip c covers
    frames [c*k, min((c+1)*k, T)) (/root/reference/models/transformer.py:399-417).
    """
    if not stride:
        return jnp.arange(t)
    return jnp.arange(t) // stride


def inter_positive_map(inter_idx: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B, 2) [start, end] inclusive moment indices -> (B, T) bool in-moment map.

    Rows with start < 0 (empty intersection, encoded as [-100, -100] by the
    datasets) yield an all-False row, matching
    /root/reference/models/tubedetr.py:415-423.
    """
    ar = jnp.arange(t)[None, :]
    start = inter_idx[:, 0:1]
    end = inter_idx[:, 1:2]
    return (ar >= start) & (ar <= end) & (start >= 0)


def downsample_pad_mask(mask: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Downsample a (..., H, W) bool pad mask to feature resolution.

    Replicates torch ``F.interpolate(mask.float(), size)`` with the default
    nearest mode used at /root/reference/models/backbone.py:97-105:
    src index = floor(dst * in/out).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    ys = (jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    xs = (jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return mask[..., ys, :][..., :, xs]


def force_first_valid(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Clear the first position along the last axis (mark it valid).

    The reference's "avoid empty masks" guard
    (/root/reference/models/tubedetr.py:152,186-187, transformer.py:424): a row
    that is entirely padding would make softmax produce NaNs, so position 0 is
    always treated as valid. Kept for strict numerical parity; our masked
    softmax is additionally NaN-safe.
    """
    return pad_mask.at[..., 0].set(False)
