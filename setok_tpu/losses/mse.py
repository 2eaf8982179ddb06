"""Weighted MSE reconstruction loss (pure function).

Parity: /root/reference/src/model/loss/mse.py:3-19 `WeightedMSELoss` — MSE
with optional spatial mask normalization (masked sum over the last two axes,
normalized by mask area + 1).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def weighted_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      loss_mask: Optional[jnp.ndarray] = None,
                      weight: float = 1.0) -> jnp.ndarray:
    dt = jnp.promote_types(jnp.result_type(pred, target), jnp.float32)
    err = (pred.astype(dt) - target.astype(dt)) ** 2
    if loss_mask is not None:
        err = err * loss_mask
        denom = jnp.sum(loss_mask, axis=(-2, -1)) + 1.0
        per_sample = jnp.sum(err, axis=(-2, -1)) / denom
    else:
        per_sample = jnp.mean(err, axis=(-3, -2, -1))
    return jnp.mean(per_sample) * weight


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample-mean absolute error (taming-style rec loss component)."""
    dt = jnp.promote_types(jnp.result_type(pred, target), jnp.float32)
    return jnp.mean(jnp.abs(pred.astype(dt) - target.astype(dt)))
