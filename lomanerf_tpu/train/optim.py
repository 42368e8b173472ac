"""Optimizers.

``loma_adam`` reproduces the reference's hand-rolled AdamOptimizer
(/root/reference/train_nerf.py:133-161) EXACTLY — including its quirk of
applying bias correction twice: the step is

    lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)          (line 150)
    p   -= lr_t * m_hat / (sqrt(v_hat) + eps)         (line 159)

with m_hat = m/(1-b1^t) and v_hat = v/(1-b2^t) ALSO corrected (156-157), so
the effective correction is (1-b2^t)/(1-b1^t)^2 — not textbook Adam.  Use
``optax.adam`` for the standard behavior; ``loma_adam`` for parity runs.

``loma_sgd`` is the 2D-fit path's raw SGD (fit_img.py:512-513).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LomaAdamState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates


def loma_adam(
    learning_rate: float = 5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """The reference's double-bias-corrected Adam, as an optax transform."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return LomaAdamState(jnp.zeros([], jnp.int32), zeros, zeros)

    def update_fn(grads, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.v, grads)
        lr_t = learning_rate * jnp.sqrt(1 - b2**tf) / (1 - b1**tf)

        def upd(m, v):
            m_hat = m / (1 - b1**tf)
            v_hat = v / (1 - b2**tf)
            return -(lr_t * m_hat / (jnp.sqrt(v_hat) + eps))

        updates = jax.tree.map(upd, m, v)
        return updates, LomaAdamState(t, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


def loma_sgd(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    """Raw SGD (p -= lr * g), the fit_img.py update rule."""
    return optax.sgd(learning_rate)
