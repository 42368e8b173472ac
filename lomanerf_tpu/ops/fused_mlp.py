"""Fused image-field MLP kernels (the ``mlp_fit`` capability on TPU).

Fuses positional encoding + L-layer MLP + head per pixel tile, forward and
hand-derived backward (cf. /root/reference/scripts/mlp_fit.py:1-147 and its
``rev_diff``).  Same layout machinery as ops/fused_nerf.py, minus rays and
compositing: input is raw 2D coords, so even the host-side
``positional_encoding_2d`` (pos_encoding.py:4-36) disappears from the HBM
path — per pixel only 2 floats in, 128 out (vs 22+ floats of encodings the
reference marshals per call).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lomanerf_tpu.ops import pallas_utils as pu


# bf16x3 tier + shared dot wrappers (see pallas_utils).
from lomanerf_tpu.ops.pallas_utils import BF16X3  # noqa: F401
from lomanerf_tpu.ops.pallas_utils import mm as _dot, mm_t as _dot_t, \
    mm_tt as _dot_tt


def _encode(coords_ref, E_ref, m_ref, precision):
    # masks rows: [id-mask, sin-mask, phase]; cos = sin(x + pi/2)
    P = _dot(coords_ref[...], E_ref[...], precision)
    return m_ref[0:1, :] * P + m_ref[1:2, :] * jnp.sin(P + m_ref[2:3, :])


def _forward_acts(coords_ref, E_ref, m_ref, w_ref, b_ref, L, precision):
    acts = [_encode(coords_ref, E_ref, m_ref, precision)]
    h = acts[0]
    for l in range(L):
        z = _dot(h, w_ref[l], precision) + b_ref[l : l + 1, :]
        h = jnp.maximum(z, 0.0) if l < L - 1 else jax.nn.sigmoid(z)
        acts.append(h)
    return acts


def _fwd_kernel(coords_ref, E_ref, m_ref, w_ref, b_ref, out_ref,
                *, L, precision):
    acts = _forward_acts(coords_ref, E_ref, m_ref, w_ref, b_ref, L, precision)
    out_ref[...] = acts[-1][:, :128]


def _bwd_kernel(coords_ref, E_ref, m_ref, w_ref, b_ref, dout_ref,
                dw_ref, db_ref, *, L, precision):
    acts = _forward_acts(coords_ref, E_ref, m_ref, w_ref, b_ref, L, precision)
    y = acts[-1]
    d_out = dout_ref[...]
    pw = y.shape[1]
    if pw > 128:
        d_out = jnp.pad(d_out, ((0, 0), (0, pw - 128)))
    d_z = d_out * y * (1.0 - y)  # sigmoid head on every channel

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    for l in range(L - 1, -1, -1):
        h_prev = acts[l]
        dw_ref[l] += _dot_tt(h_prev, d_z, precision)
        db_ref[l : l + 1, :] += jnp.sum(d_z, axis=0, keepdims=True)
        if l > 0:
            d_h = _dot_t(d_z, w_ref[l], precision)
            d_z = d_h * (h_prev > 0).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_field_fns(L, rows_tile, pw, in_dim, num_functions, highest_prec):
    precision = pu.resolve_precision(highest_prec)
    E_np, m_np = pu.build_encoding_consts(in_dim, num_functions, pw)

    def in_specs():
        return [
            pu.bspec((rows_tile, in_dim), 0),
            pu.bspec((in_dim, pw)),
            pu.bspec((3, pw)),
            pu.bspec((L, pw, pw)),
            pu.bspec((L, pw)),
        ]

    def forward(w_stack, b_stack, coords):
        n_pad = coords.shape[0]
        return pu.tiled_call(
            functools.partial(_fwd_kernel, L=L, precision=precision),
            n_pad // rows_tile,
            in_specs=in_specs(),
            out_specs=pu.bspec((rows_tile, 128), 0),
            out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        )(coords, jnp.asarray(E_np), jnp.asarray(m_np), w_stack, b_stack)

    def backward(w_stack, b_stack, coords, d_out):
        return pu.tiled_call(
            functools.partial(_bwd_kernel, L=L, precision=precision),
            coords.shape[0] // rows_tile,
            in_specs=in_specs() + [pu.bspec((rows_tile, 128), 0)],
            out_specs=[pu.bspec((L, pw, pw)), pu.bspec((L, pw))],
            out_shape=[
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
        )(coords, jnp.asarray(E_np), jnp.asarray(m_np), w_stack, b_stack,
          d_out)

    # shared custom_vjp wiring (coords cotangent zero; identity dcol — every
    # output lane is a real sigmoid channel, padding columns get zero
    # cotangents from the caller's slice)
    return pu.render_vjp(forward, backward, lambda d: d)


def field_forward(
    params, coords, num_functions: int, out_channels: int = 3,
    rows_tile: int = 1024, highest_precision: bool = True,
) -> jnp.ndarray:
    """Fused encode+MLP+sigmoid field: coords (N, in_dim) -> (N, out_ch).

    Differentiable w.r.t. params (coords cotangent is zero)."""
    L = len(params["w"])
    in_dim = coords.shape[1]
    widths = [params["w"][0].shape[0]] + [w.shape[1] for w in params["w"]]
    pw = pu.round_up(max(widths + [128]), 128)
    n = coords.shape[0]
    n_pad = pu.round_up(max(n, rows_tile), rows_tile)
    coords_p = jnp.pad(coords.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    w_stack, b_stack = pu.stack_padded_params(params, pw)
    field = _make_field_fns(L, rows_tile, pw, in_dim, num_functions,
                            highest_precision)
    out = field(w_stack, b_stack, coords_p)
    return out[:n, :out_channels]


def mlp_forward(params, coords_encoded, head: str = "sigmoid"):
    """Compatibility shim: models.ImageFieldModel passes pre-encoded inputs;
    the fused path wants raw coords.  Falls back to core mlp_apply (the
    fused entry is field_forward)."""
    from lomanerf_tpu.core.mlp import mlp_apply

    return mlp_apply(params, coords_encoded, head=head)
