"""IoU geometry ops (reference: cova-rs/bbox/src/bbox.rs `iou`).

Boxes are ``(left, top, width, height)`` float arrays; the reference
computes intersection-over-union on half-open pixel rectangles:
``right = left + width``.
"""

from __future__ import annotations

import jax.numpy as jnp


def iou_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of two (..., 4) ltwh box arrays."""
    ax1, ay1 = a[..., 0], a[..., 1]
    ax2, ay2 = ax1 + a[..., 2], ay1 + a[..., 3]
    bx1, by1 = b[..., 0], b[..., 1]
    bx2, by2 = bx1 + b[..., 2], by1 + b[..., 3]

    ix = jnp.maximum(
        0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1)
    )
    iy = jnp.maximum(
        0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1)
    )
    inter = ix * iy
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) ltwh -> (N, M) IoU matrix."""
    return iou_pairwise(a[:, None, :], b[None, :, :])
