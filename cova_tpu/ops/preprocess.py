"""Metadata preprocessing (reference: metapreprocess element,
cova-rs/gst-plugins/src/metapreprocess/imp.rs:288-332, plus the BlobNet
clip normalization, utils/model/preprocessing.py:5-8).

The reference element copies each frame's packed per-macroblock
``[mb_type, mv_x, mv_y, _]`` grid and stacks the most recent `timestep`
frames newest-first into the height axis, emitting one of every `gamma`
stacks.  Here the whole video chunk is already a (F, H, W, C) u8 array,
so the stack is a pure gather and the normalization fuses into the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def clip6_normalize(x: jnp.ndarray, signed_mv: bool = False) -> jnp.ndarray:
    """clip(x, 0, 6) / 6 (reference: utils/model/preprocessing.py:5-8).

    With signed_mv, channels 1 and 2 carry mean signed MVs offset-128
    (codec packed layout) and normalize as clip(x-128, -6, 6)/6 in
    [-1, 1]; other channels keep the reference normalization."""
    xf = x.astype(jnp.float32)
    if not signed_mv:
        return jnp.clip(xf, 0.0, 6.0) / 6.0
    c = x.shape[-1]
    is_mv = (jnp.arange(c) == 1) | (jnp.arange(c) == 2)
    signed = jnp.clip(xf - 128.0, -6.0, 6.0) / 6.0
    plain = jnp.clip(xf, 0.0, 6.0) / 6.0
    return jnp.where(is_mv, signed, plain)


def unpack_wire16(
    x: jnp.ndarray, use_nnz: bool, signed_mv: bool
) -> jnp.ndarray:
    """Device-side inverse of the codec's 2-byte/cell wire format
    (entdec.cc export_packed16: byte0 = mb_class|nnz<<3, byte1 =
    mv_x|mv_y<<4). Produces the (…, H, W, C) u8 channel layout whose
    clip6_normalize output is bit-identical to the 3/4-channel path —
    each wire field saturates exactly at the clip boundaries."""
    b0 = x[..., 0]
    b1 = x[..., 1]
    ch0 = b0 & 7
    mvx = b1 & 15
    mvy = b1 >> 4
    if signed_mv:
        # stored = clamp(full-pel, -8, 7) + 8 -> offset-128 u8 layout
        mvx = mvx + 120
        mvy = mvy + 120
    chans = [ch0, mvx, mvy]
    if use_nnz:
        chans.append((b0 >> 3) & 7)
    return jnp.stack(chans, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("timestep", "gamma"))
def temporal_stack(
    frames: jnp.ndarray, timestep: int = 4, gamma: int = 1
) -> jnp.ndarray:
    """Stack sliding temporal windows, newest first.

    Args:
      frames: (F, H, W, C) per-frame macroblock metadata.
      timestep: stack depth T.
      gamma: emit one of every `gamma` windows.

    Returns:
      (N, T, H, W, C) with N = (F - T) // gamma + 1; window n covers
      source frames [n*gamma, n*gamma + T) ordered newest-first, i.e.
      out[n, 0] is frame n*gamma + T - 1 (reference stacks current frame
      then prev_buffers; training side reverses to match,
      utils/data/slide.py:21-25).
    """
    f = frames.shape[0]
    n = (f - timestep) // gamma + 1
    starts = jnp.arange(n) * gamma
    # newest-first offsets: T-1, T-2, ..., 0
    offs = jnp.arange(timestep - 1, -1, -1)
    idx = starts[:, None] + offs[None, :]  # (N, T)
    return frames[idx]


def metapreprocess(
    frames: jnp.ndarray,
    timestep: int = 4,
    gamma: int = 1,
    signed_mv: bool = False,
) -> jnp.ndarray:
    """Temporal stack + clip normalization -> model-ready float input."""
    return clip6_normalize(temporal_stack(frames, timestep, gamma), signed_mv)
