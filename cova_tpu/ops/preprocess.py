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
