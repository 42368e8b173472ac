"""Sinusoidal positional encoding.

Semantics match the reference ``pos_encoding.positional_encoding_2d/3d``
(/root/reference/pos_encoding.py:4-69): the output is a concatenation of
*per-function blocks* — ``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x),
...]`` where each block spans all input features.  Block 0 is the identity.

Shapes: ``(..., F) -> (..., F * (1 + 2 * num_functions))``.  Works for the 2D
(batch, F) and 3D (batch, samples, F) cases uniformly (the reference has two
separate functions; here broadcasting covers both).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_functions: int = 5) -> jnp.ndarray:
    """Block-layout sinusoidal encoding (identity block first).

    Args:
        x: array of shape ``(..., F)``.
        num_functions: number of frequency octaves ``2^0 .. 2^(n-1)``.

    Returns:
        array of shape ``(..., F * (1 + 2 * num_functions))`` laid out as
        ``[x | sin(2^0 x) | cos(2^0 x) | sin(2^1 x) | cos(2^1 x) | ...]``.
    """
    blocks = [x]
    for i in range(num_functions):
        scaled = (2.0**i) * x
        blocks.append(jnp.sin(scaled))
        blocks.append(jnp.cos(scaled))
    return jnp.concatenate(blocks, axis=-1)


def encoded_dim(in_features: int, num_functions: int) -> int:
    """Output feature count of :func:`positional_encoding`."""
    return in_features * (1 + 2 * num_functions)
