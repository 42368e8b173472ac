"""Tensor-parallel MLP (Megatron-style column/row alternation).

For wide configs (the 8x256 "full NeRF"), hidden layers are sharded over the
``model`` mesh axis: even layers column-parallel (output features sharded),
odd layers row-parallel (input features sharded) with a single ``psum`` per
pair.  Elementwise ReLU runs on the column-sharded activations, so only row
layers communicate.  This is new scope vs the reference (which has no model
parallelism at all — SURVEY.md §2.2 "strategies NOT present").

All functions here run *inside* ``shard_map``; params are the local shards.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lomanerf_tpu.core.mlp import Params, _apply_head


def tp_param_specs(num_layers: int) -> Params:
    """PartitionSpecs for TP params: even layers column-sharded
    (W: (in, out/tp), b: (out/tp)), odd layers row-sharded
    (W: (in/tp, out), b replicated)."""
    w_specs: List[P] = []
    b_specs: List[P] = []
    for i in range(num_layers):
        if i % 2 == 0:
            w_specs.append(P(None, "model"))
            b_specs.append(P("model"))
        else:
            w_specs.append(P("model", None))
            b_specs.append(P())
    return {"w": w_specs, "b": b_specs}


def tp_mlp_apply(
    params: Params,
    x: jnp.ndarray,
    head: str = "rgba",
    axis_name: str = "model",
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Forward the TP-sharded MLP on replicated activations ``x``.

    Column layer i: ``y_loc = x @ W_loc + b_loc`` (output sharded).
    Row layer i:    ``y = psum(x_loc @ W_loc) + b`` (output replicated).
    ReLU between layers runs wherever the activation lives (elementwise).
    The final layer's head activation must see full features, so an odd
    number of layers ends with a column layer followed by an all-gather-like
    psum of a one-hot placement; instead we simply make the LAST layer always
    row-parallel when it would land on a column layer with a nonlinear head.
    """
    n = len(params["w"])
    y = x
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        if i % 2 == 0 and i == n - 1:
            # last layer landed column-parallel: compute local slice then
            # all-gather over the model axis so the head sees full features
            y = jnp.matmul(y, w, precision=precision) + b
            y = jax.lax.all_gather(y, axis_name, axis=-1, tiled=True)
            y = _apply_head(y, head)
            return y
        if i % 2 == 0:
            y = jnp.matmul(y, w, precision=precision) + b
        else:
            y = jax.lax.psum(
                jnp.matmul(y, w, precision=precision), axis_name
            ) + b
        if i < n - 1:
            y = jnp.maximum(y, 0.0)
        else:
            y = _apply_head(y, head)
    return y


def shard_tp_params(params: Params, num_layers: int, tp: int, tp_index: int) -> Params:
    """Slice full params into the shard owned by ``tp_index`` (host-side
    helper for tests / checkpoint resharding)."""
    out_w, out_b = [], []
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        if i % 2 == 0:
            step = w.shape[1] // tp
            out_w.append(w[:, tp_index * step : (tp_index + 1) * step])
            out_b.append(b[tp_index * step : (tp_index + 1) * step])
        else:
            step = w.shape[0] // tp
            out_w.append(w[tp_index * step : (tp_index + 1) * step, :])
            out_b.append(b)
    return {"w": out_w, "b": out_b}
