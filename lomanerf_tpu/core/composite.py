"""Alpha compositing / volume rendering weights.

Two transmittance modes:

* ``mode="loma"`` — bit-for-bit the reference semantics
  (/root/reference/scripts/nerf.py:200-288):
      a[j] = 1 - exp(-sigma[j] * dist[j])
      c[j] = 1 - a[j] + 1e-10
      T[0] = 1;  T[j] = prod_{k<=j} c[k]   for j >= 1   (INCLUSIVE cumprod —
          an off-by-one versus standard NeRF's exclusive transmittance; the
          first cumprod element is then forced to 1, nerf.py:252-258)
      w[j] = a[j] * T[j]
* ``mode="standard"`` — textbook NeRF exclusive transmittance
      T[j] = prod_{k<j} c[k], T[0] = 1.

``dists`` carries the reference's 1e8 far-plane sentinel in its last entry
(train_nerf.py:306-311); that is the caller's (ray sampling) responsibility.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-10


def render_weights(
    sigma: jnp.ndarray, dists: jnp.ndarray, mode: str = "loma"
) -> jnp.ndarray:
    """Per-sample compositing weights.

    Args:
        sigma: density, shape ``(..., S)``.
        dists: step sizes, shape ``(..., S)`` (broadcastable).
        mode: ``"loma"`` (reference-parity inclusive cumprod) or ``"standard"``.

    Returns:
        weights, shape ``(..., S)``.
    """
    # NOTE: written as c = e + EPS rather than the reference's literal
    # ``1 - alpha + 1e-10``: XLA reassociates the latter to (1 + 1e-10) -
    # alpha and constant-folds 1 + 1e-10 == 1.0f, silently dropping the
    # epsilon and producing c == 0 (NaN adjoints) for saturated alpha.  The
    # two forms are algebraically identical (alpha = 1 - e).
    e = jnp.exp(-sigma * dists)
    alpha = 1.0 - e
    c = e + EPS
    if mode == "loma":
        trans = jnp.cumprod(c, axis=-1)
        trans = trans.at[..., 0].set(1.0)
    elif mode == "standard":
        inclusive = jnp.cumprod(c, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(inclusive[..., :1]), inclusive[..., :-1]], axis=-1
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return alpha * trans


def accumulate_color(weights: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """``sum_j w[..., j] * rgb[..., j, :]`` (scripts/nerf.py:281-288)."""
    return jnp.sum(weights[..., None] * rgb, axis=-2)


def accumulate_depth(weights: jnp.ndarray, t_vals: jnp.ndarray) -> jnp.ndarray:
    """Expected ray depth ``sum_j w[..., j] * t[j]`` (a standard NeRF output
    the reference sketches but never wires — train_nerf.py:677 commented)."""
    return jnp.sum(weights * t_vals, axis=-1)
