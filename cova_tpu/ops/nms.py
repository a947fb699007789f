"""Batched non-maximum suppression on device.

Replaces the DeepStream nvinfer cluster-mode=2 NMS applied to YOLO
detections (reference: config/dnn/yolov4_b2.txt `nms-iou-threshold=0.2`).
Greedy per-class NMS over fixed-capacity score-sorted boxes, expressed
as a `fori_loop` so it jits with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cova_tpu.ops.iou import iou_matrix


@functools.partial(jax.jit, static_argnames=("max_out",))
def batched_nms(
    ltwh: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_threshold: float = 0.2,
    score_threshold: float = 0.25,
    max_out: int = 64,
):
    """Greedy class-aware NMS.

    Args:
      ltwh: (N, 4) boxes; scores: (N,); class_ids: (N,) int32.

    Returns:
      (keep_ltwh (max_out, 4), keep_scores, keep_classes, keep_valid)
    """
    n = ltwh.shape[0]
    order = jnp.argsort(-scores)
    ltwh = ltwh[order]
    scores = scores[order]
    class_ids = class_ids[order]
    alive = scores > score_threshold

    iou = iou_matrix(ltwh, ltwh)
    same_class = class_ids[:, None] == class_ids[None, :]
    suppress_pair = (iou > iou_threshold) & same_class

    def body(i, alive):
        # Box i, if alive, suppresses all lower-scored overlapping boxes.
        kill = suppress_pair[i] & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, alive)

    # Compact survivors to the front.
    k = min(max_out, n)
    key = jnp.where(alive, jnp.arange(n), n)
    take = jax.lax.top_k(-key, k)[1]
    valid = alive[take]
    out_ltwh = jnp.where(valid[:, None], ltwh[take], 0.0)
    out_scores = jnp.where(valid, scores[take], 0.0)
    out_cls = jnp.where(valid, class_ids[take], -1)
    if k < max_out:
        pad = max_out - k
        out_ltwh = jnp.pad(out_ltwh, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_cls = jnp.pad(out_cls, (0, pad), constant_values=-1)
        valid = jnp.pad(valid, (0, pad))
    return out_ltwh, out_scores, out_cls, valid
