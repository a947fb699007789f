"""Constant-velocity Kalman filter for SORT, batched over track slots.

State x = [u, v, s, r, u', v', s'] — box center, scale (area), aspect
ratio and their velocities (aspect ratio has no velocity).  Matches the
reference filter exactly (reference: cova-rs/sort/src/tracker/
motion_model.rs:36-55, linear_observation_model.rs:32-47,
tracker/mod.rs:38-46):

  F = I7 with F[0,4] = F[1,5] = F[2,6] = 1 (dt = 1 frame)
  Q = diag(1, 1, 1, 1, .01, .01, .0001)
  H = [I4 | 0]
  R = diag(1, 1, 10, 10)
  P0 = diag(10, 10, 10, 10, 1e4, 1e4, 1e4)

The update uses Joseph-form covariance (tracker/mod.rs:88-92).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F = np.eye(7, dtype=np.float32)
_F[0, 4] = _F[1, 5] = _F[2, 6] = 1.0
_Q = np.diag(np.array([1, 1, 1, 1, 0.01, 0.01, 0.0001], np.float32))
_H = np.zeros((4, 7), np.float32)
_H[:4, :4] = np.eye(4)
_R = np.diag(np.array([1, 1, 10, 10], np.float32))
_P0 = np.diag(np.array([10, 10, 10, 10, 1e4, 1e4, 1e4], np.float32))


def bbox_to_z(ltwh: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) ltwh -> (..., 4) measurement [cx, cy, area, aspect]
    (reference: state.rs `into_z` — s is the box area w*h)."""
    l, t, w, h = (ltwh[..., i] for i in range(4))
    return jnp.stack(
        [l + w / 2.0, t + h / 2.0, w * h, w / jnp.maximum(h, 1e-12)], axis=-1
    )


def x_to_bbox(x: jnp.ndarray, reproduce_quirk: bool = True) -> jnp.ndarray:
    """(..., 7) state -> (..., 4) ltwh.

    reproduce_quirk=True replicates the reference's `from_x`, which uses
    width/2 for the vertical center offset (reference: state.rs:19-28);
    False computes the geometrically correct top.
    """
    s = jnp.maximum(x[..., 2], 1e-12)
    r = jnp.maximum(x[..., 3], 1e-12)
    w = jnp.sqrt(s * r)
    h = s / jnp.maximum(w, 1e-12)
    cx, cy = x[..., 0], x[..., 1]
    top_off = w / 2.0 if reproduce_quirk else h / 2.0
    return jnp.stack([cx - w / 2.0, cy - top_off, w, h], axis=-1)


def kalman_init(z: jnp.ndarray):
    """Init (mean, cov) from a measurement. Leading dims broadcast."""
    mean = jnp.concatenate([z, jnp.zeros(z.shape[:-1] + (3,), z.dtype)], axis=-1)
    cov = jnp.broadcast_to(jnp.asarray(_P0), z.shape[:-1] + (7, 7))
    return mean, cov


def kalman_predict(mean: jnp.ndarray, cov: jnp.ndarray):
    """Predict step with the reference's scale-velocity clamp: if
    s + s' <= 0, zero s' before the transition (tracker/mod.rs:104-121)."""
    vs = jnp.where(mean[..., 6] + mean[..., 2] <= 0.0, 0.0, mean[..., 6])
    mean = mean.at[..., 6].set(vs)
    f = jnp.asarray(_F)
    mean_p = mean @ f.T
    cov_p = f @ cov @ f.T + jnp.asarray(_Q)
    return mean_p, cov_p


def kalman_update(mean: jnp.ndarray, cov: jnp.ndarray, z: jnp.ndarray):
    """Joseph-form measurement update."""
    h = jnp.asarray(_H)
    r = jnp.asarray(_R)
    y = z - mean @ h.T  # innovation (..., 4)
    s = h @ cov @ h.T + r  # (..., 4, 4)
    k = cov @ h.T @ jnp.linalg.inv(s)  # (..., 7, 4)
    mean_u = mean + (k @ y[..., None])[..., 0]
    ikh = jnp.eye(7, dtype=cov.dtype) - k @ h
    cov_u = ikh @ cov @ jnp.swapaxes(ikh, -1, -2) + k @ r @ jnp.swapaxes(k, -1, -2)
    return mean_u, cov_u
