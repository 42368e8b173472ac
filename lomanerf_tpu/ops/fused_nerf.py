"""Fused NeRF train kernels (Pallas TPU).

One forward kernel fuses, per ray tile, the entire differentiable pipeline
the reference implements as ``nerf_evaluate_and_march``
(/root/reference/scripts/nerf.py:67-302) plus the host-side ray->point
sampling and positional encoding it receives precomputed
(train_nerf.py:289-302):

    ray points -> sinusoidal encoding -> L-layer MLP (ReLU hidden,
    sigmoid-RGB / ReLU-density head) -> alpha compositing -> per-ray color

The backward kernel is a hand-derived VJP (the analog of loma's
``rev_diff`` output): it recomputes the tile's forward activations in VMEM
(rematerialization — HBM traffic is the bottleneck, not FLOPs), walks the
compositing and MLP adjoints, and accumulates dW/db across the sequential
grid into VMEM-resident output blocks (the race-free TPU analog of loma's
``atomic_add`` accumulation, reverse_diff.py:144-155).

Only ray data ever moves through HBM: ~(6 + 2S + 4) floats per ray instead
of the ~S * PW * (L+1) floats per ray the unfused jnp path materializes.

Layouts: activations are ``(rows, PW)`` with rows = tile_rays * S; per-sample
scalars are ``(rows, 1)``; compositing scans are segmented sublane rolls
(see ops/pallas_utils.py).  Transmittance supports both the reference's
inclusive-cumprod quirk (mode="loma", nerf.py:226-258) and standard NeRF.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lomanerf_tpu.ops import pallas_utils as pu

EPS = 1e-10


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_t(a, b, precision):
    """a @ b.T via contraction on dim 1."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_tt(a, b, precision):
    """a.T @ b via contraction on dim 0 (rows)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _encode(o_ref, d_ref, t_flat, E_ref, m_ref, R, S, precision):
    """(rows, PW) positional-encoded sample points.

    P[r*S+s, :] = (o[r] @ E) + (d[r] @ E) * t[r*S+s]; then the id/sin/cos
    mask blend.  Exploits pts = o + t*d being linear in t so the only matmuls
    are tiny per-ray (R, 3) @ (3, PW).
    """
    E = E_ref[...]
    oe = _dot(o_ref[...], E, precision)  # (R, PW)
    de = _dot(d_ref[...], E, precision)  # (R, PW)
    pw = E.shape[1]
    rows = R * S
    oe_b = jnp.broadcast_to(oe[:, None, :], (R, S, pw)).reshape(rows, pw)
    de_b = jnp.broadcast_to(de[:, None, :], (R, S, pw)).reshape(rows, pw)
    P = oe_b + de_b * t_flat  # (rows, PW) * (rows, 1)
    m_id = m_ref[0:1, :]
    m_sin = m_ref[1:2, :]
    m_cos = m_ref[2:3, :]
    return m_id * P + m_sin * jnp.sin(P) + m_cos * jnp.cos(P)


def _mlp_forward(enc, w_ref, b_ref, L, precision):
    """Returns list of post-activation tensors [h_0=enc, h_1, ..., h_L]."""
    acts = [enc]
    h = enc
    for l in range(L):
        z = _dot(h, w_ref[l], precision) + b_ref[l : l + 1, :]
        if l < L - 1:
            h = jnp.maximum(z, 0.0)
        else:
            # rgba head: sigmoid on lanes != 3, ReLU on density lane 3
            lane = _lane_iota(z.shape)
            h = jnp.where(
                lane == 3, jnp.maximum(z, 0.0), jax.nn.sigmoid(z)
            )
        acts.append(h)
    return acts


def _composite_fwd(rgba, dists_flat, R, S, mode):
    """Per-sample weights w (rows,1) from density lane 3 and dists."""
    pw = rgba.shape[1]
    lane = _lane_iota(rgba.shape)
    sigma = jnp.sum(jnp.where(lane == 3, rgba, 0.0), axis=1, keepdims=True)
    # c = e + EPS, not 1 - alpha + EPS: XLA folds the latter's epsilon away
    # (see core/composite.py) and c == 0 NaNs the backward division
    e = jnp.exp(-sigma * dists_flat)
    alpha = 1.0 - e  # (rows, 1)
    c = e + EPS
    P = pu.seg_inclusive_cumprod(c, S)
    s_idx = pu._sample_index(alpha.shape[0], S)
    if mode == "loma":
        T = jnp.where(s_idx == 0, 1.0, P)  # nerf.py:252-258 forces T[0]=1
    else:
        T = pu.seg_shift_down(P, S, fill=1.0)
    w = alpha * T
    return sigma, alpha, c, P, T, w


def _nerf_forward_kernel(
    o_ref, d_ref, t_ref, dists_ref, E_ref, m_ref, w_ref, b_ref, out_ref,
    *, L, R, S, mode, precision,
):
    rows = R * S
    enc = _encode(o_ref, d_ref, t_ref[...], E_ref, m_ref, R, S, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision)
    rgba = acts[-1]
    _, _, _, _, _, w = _composite_fwd(rgba, dists_ref[...], R, S, mode)
    pw = rgba.shape[1]
    weighted = (rgba * w).reshape(R, S, pw)
    out_ref[...] = jnp.sum(weighted, axis=1)[:, :128]


def _nerf_backward_kernel(
    o_ref, d_ref, t_ref, dists_ref, E_ref, m_ref, w_ref, b_ref, dcol_ref,
    dw_ref, db_ref, *, L, R, S, mode, precision,
):
    rows = R * S
    # --- recompute forward (remat) ---
    enc = _encode(o_ref, d_ref, t_ref[...], E_ref, m_ref, R, S, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision)
    rgba = acts[-1]
    dists = dists_ref[...]
    sigma, alpha, c, P, T, w = _composite_fwd(rgba, dists, R, S, mode)
    pw = rgba.shape[1]
    lane = _lane_iota(rgba.shape)
    rgb_mask = (lane < 3).astype(jnp.float32)

    # --- compositing backward ---
    dcol = dcol_ref[...]  # (R, 128); only lanes 0..2 nonzero
    if pw > 128:
        dcol = jnp.pad(dcol, ((0, 0), (0, pw - 128)))
    dcol_b = jnp.broadcast_to(dcol[:, None, :], (R, S, pw)).reshape(rows, pw)
    # color_ch = sum_s w * rgba_ch  (ch < 3)
    d_w = jnp.sum(dcol_b * rgba * rgb_mask, axis=1, keepdims=True)  # (rows,1)
    d_rgb = dcol_b * w * rgb_mask  # (rows, pw), lanes 0..2
    # T[s]: loma: 1 at s=0 else P[s]; standard: P shifted down
    s_idx = pu._sample_index(rows, S)
    if mode == "loma":
        d_T = jnp.where(s_idx == 0, 0.0, d_w * alpha)
        # d_c[j] = (1/c_j) * sum_{m >= max(j,1)} d_T[m] * P[m]
        g = d_T * P
        suf = pu.seg_suffix_sum(g, S)
        # for j = 0 the sum starts at m=1: suffix at 1 == suffix at 0 minus g[0];
        # g[0] = 0 here because d_T[0] = 0, so suf works for j=0 too.
        d_c = suf / c
    else:
        d_T_incl = d_w * alpha  # dL/dT at each s (T = shift_down(P))
        # P[j] feeds T[j+1]; so d_P[j] = d_T_incl[j+1] (within segment)
        # d_c[j] = (1/c_j) * sum_{m >= j} d_P[m] * P[m]
        rolled = pltpu.roll(d_T_incl, rows - 1, axis=0)
        d_P = jnp.where(s_idx < S - 1, rolled, 0.0)
        suf = pu.seg_suffix_sum(d_P * P, S)
        d_c = suf / c
    d_alpha = jnp.where(s_idx == 0, d_w * 1.0, d_w * T) if mode == "loma" \
        else d_w * T
    d_alpha = d_alpha - d_c
    d_sigma = d_alpha * dists * jnp.exp(-sigma * dists)  # (rows, 1)

    # --- head backward: dz for the last layer ---
    d_h = d_rgb + d_sigma * (lane == 3).astype(jnp.float32)
    zL = rgba
    relu_m = (zL > 0).astype(jnp.float32)
    sig_d = zL * (1.0 - zL)
    d_z = jnp.where(lane == 3, d_h * relu_m, d_h * sig_d)

    # --- MLP backward with accumulation across grid steps ---
    first = pl.program_id(0) == 0

    @pl.when(first)
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
def _make_render_fns(L, R, S, pw, in_dim, num_functions, mode, highest_prec):
    precision = (
        jax.lax.Precision.HIGHEST if highest_prec else jax.lax.Precision.DEFAULT
    )
    E_np, m_np = pu.build_encoding_consts(in_dim, num_functions, pw)

    fwd_kernel = functools.partial(
        _nerf_forward_kernel, L=L, R=R, S=S, mode=mode, precision=precision
    )
    bwd_kernel = functools.partial(
        _nerf_backward_kernel, L=L, R=R, S=S, mode=mode, precision=precision
    )

    def common_in_specs(n_tiles):
        rows = R * S
        return [
            pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, pw, pw), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def forward(w_stack, b_stack, o, d, t_flat, dists_flat):
        n_pad = o.shape[0]
        n_tiles = n_pad // R
        E = jnp.asarray(E_np)
        m = jnp.asarray(m_np)
        flops_tile = 2 * R * S * pw * pw * (L + 1) * 3
        return pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=common_in_specs(n_tiles),
            out_specs=pl.BlockSpec(
                (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * n_tiles,
                bytes_accessed=n_pad * (6 + 2 * S + 128) * 4,
                transcendentals=n_pad * S * pw * 3,
            ),
            interpret=_interpret(),
        )(o, d, t_flat, dists_flat, E, m, w_stack, b_stack)

    def backward(w_stack, b_stack, o, d, t_flat, dists_flat, d_colors):
        n_pad = o.shape[0]
        n_tiles = n_pad // R
        E = jnp.asarray(E_np)
        m = jnp.asarray(m_np)
        in_specs = common_in_specs(n_tiles) + [
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        dw, db = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((L, pw, pw), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, pw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interpret(),
        )(o, d, t_flat, dists_flat, E, m, w_stack, b_stack, d_colors)
        return dw, db

    @jax.custom_vjp
    def render(w_stack, b_stack, o, d, t_flat, dists_flat):
        return forward(w_stack, b_stack, o, d, t_flat, dists_flat)

    def render_fwd(w_stack, b_stack, o, d, t_flat, dists_flat):
        out = forward(w_stack, b_stack, o, d, t_flat, dists_flat)
        return out, (w_stack, b_stack, o, d, t_flat, dists_flat)

    def render_bwd(res, d_out):
        w_stack, b_stack, o, d, t_flat, dists_flat = res
        # only lanes 0..2 of the output are real colors
        lane = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 1)
        d_colors = jnp.where(lane < 3, d_out, 0.0)
        dw, db = backward(w_stack, b_stack, o, d, t_flat, dists_flat, d_colors)
        zeros = lambda x: jnp.zeros_like(x)
        return dw, db, zeros(o), zeros(d), zeros(t_flat), zeros(dists_flat)

    render.defvjp(render_fwd, render_bwd)
    return render


def render_rays(
    params, origins, directions, t_vals, dists, config,
    tile_rays: int = 0, highest_precision: bool = True,
) -> jnp.ndarray:
    """Fused render: (N,3) colors from rays.  Differentiable w.r.t. params
    (input cotangents are zero — training optimizes params only)."""
    L = len(params["w"])
    S = config.num_samples
    widths = [config.in_channels] + [w.shape[1] for w in params["w"]]
    pw = pu.round_up(max(widths + [128]), 128)
    if not tile_rays:
        tile_rays = pu.pick_tile_rays(S, pw, n_live_buffers=L + 4)
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    o = pad_rays(origins.astype(jnp.float32))
    d = pad_rays(directions.astype(jnp.float32))
    t_flat = pad_rays(t_vals.astype(jnp.float32)).reshape(n_pad * S, 1)
    dists_flat = pad_rays(dists.astype(jnp.float32)).reshape(n_pad * S, 1)

    w_stack, b_stack = pu.stack_padded_params(params, pw)
    render = _make_render_fns(
        L, tile_rays, S, pw, 3, config.num_encoding_functions, config.mode,
        highest_precision,
    )
    out = render(w_stack, b_stack, o, d, t_flat, dists_flat)
    return out[:n, :3]


def nerf_loss(params, origins, directions, t_vals, dists, target, config,
              **kw) -> jnp.ndarray:
    from lomanerf_tpu.core.losses import sum_mse

    pred = render_rays(params, origins, directions, t_vals, dists, config, **kw)
    return sum_mse(pred, target)
