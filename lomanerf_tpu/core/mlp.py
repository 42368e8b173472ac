"""Plain MLP: init + apply, matching the reference's semantics.

Reference behavior being reproduced (not ported):
  * init: He-style ``N(0, sqrt(2/fan_in))`` weights of shape (in, out) and
    ``N(0, 0.5)`` biases (/root/reference/mlp_utils.py:166-204); the 2D-fit
    driver instead uses plain ``randn`` init (fit_img.py:168-206) — exposed
    here via ``init="randn"``.
  * apply: ``x @ W + b`` per layer, ReLU on hidden layers
    (scripts/mlp_fit.py:108-120), and a configurable head on the last layer:
      - ``"sigmoid"``: sigmoid on every output channel (2D image fit,
        scripts/mlp_fit.py:121-132)
      - ``"rgba"``: sigmoid on channels != 3, ReLU on channel 3 (density)
        (scripts/nerf.py:147-167)
      - ``"none"``: raw linear output.

Params are a simple pytree ``{"w": [W_0..W_{L-1}], "b": [b_0..b_{L-1}]}`` with
exact (unpadded) shapes; TPU kernels pad to lane width internally.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, List[jnp.ndarray]]


def mlp_layer_sizes(
    in_channels: int, out_channels: int, num_layers: int, filter_size: int
) -> List[tuple]:
    """Per-layer (fan_in, fan_out), mirroring mlp_utils.get_sample_mlp."""
    sizes = []
    fan_in = in_channels
    for i in range(num_layers):
        fan_out = out_channels if i == num_layers - 1 else filter_size
        sizes.append((fan_in, fan_out))
        fan_in = fan_out
    return sizes


def init_mlp(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    num_layers: int,
    filter_size: int = 16,
    init: str = "he",
    dtype: Any = jnp.float32,
) -> Params:
    """Initialize MLP params.

    ``init="he"``: W ~ N(0, sqrt(2/fan_in)), b ~ N(0, 0.5)  (mlp_utils.py:175,196)
    ``init="randn"``: W, b ~ N(0, 1)                         (fit_img.py randn path)
    ``init="nerf"``: He hidden weights, ZERO biases, head weights x0.1, and
    a +0.5 density bias (channel 3 of an rgba head).  Deep (8x256) radiance
    MLPs at plain He init start with a DEAD density head with probability
    ~1/2: the per-unit constant component of the head pre-activation
    (~N(0, 1.6)) dominates its across-point spread (~1.0)
    (artifacts/r5_flagship_gradcheck.log — every gradient EXACTLY zero
    through relu'(sigma<0)), so the sigma unit's sign is a coin flip.  The
    positive density bias starts the field as thin fog — alpha > 0
    everywhere, gradients alive through both the density and color paths —
    the standard NeRF-practice init; the reference never hits this because
    its loma kernels are capped at 3 layers x 32 wide (scripts/nerf.py:67).
    """
    ws, bs = [], []
    for fan_in, fan_out in mlp_layer_sizes(
        in_channels, out_channels, num_layers, filter_size
    ):
        key, kw, kb = jax.random.split(key, 3)
        if init == "nerf":
            w = jax.random.normal(kw, (fan_in, fan_out), dtype) * jnp.sqrt(
                jnp.asarray(2.0 / fan_in, dtype)
            )
            b = jnp.zeros((fan_out,), dtype)
        elif init == "he":
            w = jax.random.normal(kw, (fan_in, fan_out), dtype) * jnp.sqrt(
                jnp.asarray(2.0 / fan_in, dtype)
            )
            b = jax.random.normal(kb, (fan_out,), dtype) * jnp.asarray(0.5, dtype)
        elif init == "randn":
            w = jax.random.normal(kw, (fan_in, fan_out), dtype)
            b = jax.random.normal(kb, (fan_out,), dtype)
        else:
            raise ValueError(f"unknown init {init!r}")
        ws.append(w)
        bs.append(b)
    if init == "nerf":
        ws[-1] = ws[-1] * jnp.asarray(0.1, dtype)
        if out_channels >= 4:
            bs[-1] = bs[-1].at[3].set(jnp.asarray(0.5, dtype))
    return {"w": ws, "b": bs}


def params_from_numpy(ws: Sequence, bs: Sequence, dtype: Any = jnp.float32) -> Params:
    """Wrap externally-created (e.g. numpy, oracle-matched) weights."""
    return {
        "w": [jnp.asarray(w, dtype) for w in ws],
        "b": [jnp.asarray(b, dtype) for b in bs],
    }


def _apply_head(y: jnp.ndarray, head: str) -> jnp.ndarray:
    if head == "sigmoid":
        return jax.nn.sigmoid(y)
    if head == "rgba":
        # sigmoid on color channels, ReLU on density channel 3
        # (scripts/nerf.py:147-167)
        density = jnp.maximum(y[..., 3:4], 0.0)
        rgb = jax.nn.sigmoid(
            jnp.concatenate([y[..., :3], y[..., 4:]], axis=-1)
        )
        return jnp.concatenate([rgb[..., :3], density, rgb[..., 3:]], axis=-1)
    if head == "none":
        return y
    raise ValueError(f"unknown head {head!r}")


def mlp_apply(
    params: Params,
    x: jnp.ndarray,
    head: str = "sigmoid",
    precision: Any = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Forward the MLP: ReLU hidden layers, ``head`` on the output layer.

    This is the semantic-oracle path, so matmuls default to full fp32
    (``Precision.HIGHEST``) — TPU's default bf16 passes are a ~1e-1 relative
    error, far outside parity tolerances.  The Pallas perf path manages its
    own precision.
    """
    n = len(params["w"])
    y = x
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        y = jnp.matmul(y, w, precision=precision) + b
        if i < n - 1:
            y = jnp.maximum(y, 0.0)
        else:
            y = _apply_head(y, head)
    return y
