"""Losses and image metrics.

The reference uses SUM-of-squared-errors (not mean) in both differentiable
kernels (scripts/mlp_fit.py:140-145, scripts/nerf.py:297-302) and PSNR
``20*log10(max/sqrt(mean_mse))`` for evaluation (train_nerf.py:163-183).
"""

from __future__ import annotations

import jax.numpy as jnp


def sum_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared errors (the reference's 'MSE')."""
    d = pred - target
    return jnp.sum(d * d)


def mean_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred - target
    return jnp.mean(d * d)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(max_val / jnp.sqrt(mse))
