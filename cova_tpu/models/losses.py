"""Training losses (reference: utils/train-blobnet.py:45-53)."""

from __future__ import annotations

import jax.numpy as jnp


def jaccard_distance_loss(y_true, y_pred, smooth: float = 100.0):
    """Smoothed Jaccard distance, averaged over the batch; exactly the
    reference's formulation (sum over the last two spatial axes)."""
    intersection = jnp.sum(y_true * y_pred, axis=(-2, -1))
    total = jnp.sum(y_true + y_pred, axis=(-2, -1))
    jac = (intersection + smooth) / (total - intersection + smooth)
    return jnp.mean((1.0 - jac) * smooth)


def precision_recall(y_true, y_pred, threshold: float = 0.5):
    """Binary precision/recall metrics matching Keras defaults."""
    pred = y_pred > threshold
    truth = y_true > 0.5
    tp = jnp.sum(pred & truth)
    precision = tp / jnp.maximum(jnp.sum(pred), 1)
    recall = tp / jnp.maximum(jnp.sum(truth), 1)
    return precision, recall
