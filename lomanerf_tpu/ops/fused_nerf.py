"""Fused NeRF train kernels (Pallas TPU).

One forward kernel fuses, per ray tile, the pipeline the reference
implements as ``nerf_evaluate_and_march``
(/root/reference/scripts/nerf.py:67-302) plus the host-side positional
encoding it receives precomputed (train_nerf.py:302):

    sample points -> sinusoidal encoding -> L-layer MLP (ReLU hidden,
    sigmoid-RGB / ReLU-density head) -> alpha compositing -> per-ray color

The backward kernel is a hand-derived VJP (the analog of loma's
``rev_diff`` output): it recomputes the tile's forward activations in VMEM
(rematerialization), walks the compositing and MLP adjoints, and
accumulates dW/db across the sequential grid into VMEM-resident output
blocks (the race-free TPU analog of loma's ``atomic_add`` accumulation,
reverse_diff.py:144-155).

Performance notes (v5e-measured):
* inputs are pre-computed sample points ``(rows, 3)`` — 12 B/row of HBM —
  encoded in-kernel by ONE (rows,3)@(3,PW) matmul plus a single masked
  ``sin`` pass (cos via pi/2 phase); sublane-replication broadcasts of
  per-ray data across S samples (S is not a sublane multiple) were the
  dominant VPU cost in the first design and are gone,
* the backward's per-ray cotangent broadcast is a tiny 0/1 selector matmul
  (rows, R)@(R, 128) on the MXU instead of a sublane-replication,
* per-sample scalars are ``(rows, 1)``; compositing scans are segmented
  Hillis-Steele sublane rolls (ops/pallas_utils.py).

Transmittance supports the reference's inclusive-cumprod quirk
(mode="loma", nerf.py:226-258) and standard NeRF.
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


def _encode(pts_ref, E_ref, m_ref, precision):
    """(rows, PW) positional-encoded points: one matmul + one sin pass."""
    P = _dot(pts_ref[...], E_ref[...], precision)
    return m_ref[0:1, :] * P + m_ref[1:2, :] * jnp.sin(P + m_ref[2:3, :])


def _mlp_forward(enc, w_ref, b_ref, L, precision, cdt=jnp.float32):
    """Returns list of post-activation tensors [h_0=enc, h_1, ..., h_L].

    ``cdt`` is the matmul compute dtype: bfloat16 stores activations (and
    the weight stack, cast by the wrapper) at half the VMEM and full MXU
    rate; accumulation and the nonlinearities stay fp32
    (preferred_element_type=f32).
    """
    acts = [enc.astype(cdt)]
    h = acts[0]
    for l in range(L):
        z = _dot(h, w_ref[l].astype(cdt), precision) + b_ref[l : l + 1, :]
        if l < L - 1:
            h = jnp.maximum(z, 0.0).astype(cdt)
        else:
            # rgba head: sigmoid on lanes != 3, ReLU on density lane 3
            lane = _lane_iota(z.shape)
            h = jnp.where(
                lane == 3, jnp.maximum(z, 0.0), jax.nn.sigmoid(z)
            ).astype(cdt)
        acts.append(h)
    return acts


def _composite_fwd(rgba, dists_flat, S, mode):
    """Per-sample weights w (rows,1) from density lane 3 and dists.

    Always fp32 (rgba may arrive as bf16 from the compute-dtype path)."""
    lane = _lane_iota(rgba.shape)
    sigma = jnp.sum(
        jnp.where(lane == 3, rgba.astype(jnp.float32), 0.0),
        axis=1, keepdims=True,
    )
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


def _ray_selector(rows, R, S):
    """(rows, R) 0/1 matrix: row i belongs to ray i // S.  Broadcasting
    per-ray vectors across samples as an MXU matmul."""
    ray_of_row = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 0) // S
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    return (ray_of_row == col).astype(jnp.float32)


def _nerf_forward_kernel(
    pts_ref, dists_ref, E_ref, m_ref, w_ref, b_ref, out_ref,
    *, L, R, S, mode, precision, cdt, ablate="",
):
    # ``ablate`` is a perf-debugging hook ("no_sin" / "no_composite" /
    # "no_mlp"); production paths always pass "".
    if "no_sin" in ablate:
        enc = _dot(pts_ref[...], E_ref[...], precision)
    else:
        enc = _encode(pts_ref, E_ref, m_ref, precision)
    if "no_mlp" in ablate:
        rgba = enc.astype(jnp.float32)
    else:
        acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
        rgba = acts[-1].astype(jnp.float32)
    if "no_composite" in ablate:
        lane = _lane_iota(rgba.shape)
        sigma = jnp.sum(jnp.where(lane == 3, rgba, 0.0), axis=1,
                        keepdims=True)
        w = 1.0 - jnp.exp(-sigma * dists_ref[...])
    else:
        _, _, _, _, _, w = _composite_fwd(rgba, dists_ref[...], S, mode)
    pw = rgba.shape[1]
    weighted = (rgba * w).reshape(R, S, pw)
    out_ref[...] = jnp.sum(weighted, axis=1)[:, :128]


def _nerf_backward_kernel(
    pts_ref, dists_ref, E_ref, m_ref, w_ref, b_ref, dcol_ref,
    dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
):
    rows = R * S
    # --- recompute forward (remat) ---
    enc = _encode(pts_ref, E_ref, m_ref, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    dists = dists_ref[...]
    sigma, alpha, c, P, T, w = _composite_fwd(rgba, dists, S, mode)
    pw = rgba.shape[1]
    lane = _lane_iota(rgba.shape)
    rgb_mask = (lane < 3).astype(jnp.float32)

    # --- compositing backward ---
    dcol = dcol_ref[...]  # (R, 128); only lanes 0..2 nonzero
    if pw > 128:
        dcol = jnp.pad(dcol, ((0, 0), (0, pw - 128)))
    sel = _ray_selector(rows, R, S)
    dcol_b = _dot(sel, dcol, precision)  # (rows, pw) per-ray broadcast
    # color_ch = sum_s w * rgba_ch  (ch < 3)
    d_w = jnp.sum(dcol_b * rgba * rgb_mask, axis=1, keepdims=True)  # (rows,1)
    d_rgb = dcol_b * w * rgb_mask  # (rows, pw), lanes 0..2
    s_idx = pu._sample_index(rows, S)
    if mode == "loma":
        d_T = jnp.where(s_idx == 0, 0.0, d_w * alpha)
        # d_c[j] = (1/c_j) * sum_{m >= max(j,1)} d_T[m] * P[m]; d_T[0] = 0 so
        # the plain suffix sum covers j = 0 as well
        suf = pu.seg_suffix_sum(d_T * P, S)
        d_c = suf / c
    else:
        d_T_incl = d_w * alpha  # dL/dT at each s (T = shift_down(P))
        rolled = pltpu.roll(d_T_incl, rows - 1, axis=0)
        d_P = jnp.where(s_idx < S - 1, rolled, 0.0)
        suf = pu.seg_suffix_sum(d_P * P, S)
        d_c = suf / c
    d_alpha = d_w * T - d_c
    d_sigma = d_alpha * dists * (1.0 - alpha)  # d(alpha)/d(sigma*d) = e

    # --- head backward: dz for the last layer ---
    d_h = d_rgb + d_sigma * (lane == 3).astype(jnp.float32)
    relu_m = (rgba > 0).astype(jnp.float32)
    sig_d = rgba * (1.0 - rgba)
    d_z = jnp.where(lane == 3, d_h * relu_m, d_h * sig_d)

    # --- MLP backward with accumulation across grid steps ---
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    for l in range(L - 1, -1, -1):
        h_prev = acts[l]
        d_z_c = d_z.astype(cdt)
        dw_ref[l] += _dot_tt(h_prev, d_z_c, precision)
        db_ref[l : l + 1, :] += jnp.sum(d_z, axis=0, keepdims=True)
        if l > 0:
            d_h = _dot_t(d_z_c, w_ref[l].astype(cdt), precision)
            # compare in f32 (bf16 comparisons unsupported on this target)
            d_z = d_h * (h_prev.astype(jnp.float32) > 0).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_render_fns(L, R, S, pw, in_dim, num_functions, mode, highest_prec,
                     compute_dtype="float32", ablate=""):
    precision = (
        jax.lax.Precision.HIGHEST if highest_prec else jax.lax.Precision.DEFAULT
    )
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts(in_dim, num_functions, pw)

    fwd_kernel = functools.partial(
        _nerf_forward_kernel, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt, ablate=ablate,
    )
    bwd_kernel = functools.partial(
        _nerf_backward_kernel, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt,
    )
    rows = R * S

    def common_in_specs():
        return [
            pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, pw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, pw, pw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def forward(w_stack, b_stack, pts_flat, dists_flat):
        n_rows = pts_flat.shape[0]
        n_tiles = n_rows // rows
        w_stack = w_stack.astype(cdt)  # bf16 weights halve their VMEM block
        return pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=common_in_specs(),
            out_specs=pl.BlockSpec(
                (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_rows // S, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_rows * pw * (pw * L + in_dim),
                bytes_accessed=n_rows * (3 + 1) * 4 + (n_rows // S) * 512,
                transcendentals=n_rows * pw * 2,
            ),
            interpret=_interpret(),
        )(pts_flat, dists_flat, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack, b_stack)

    def backward(w_stack, b_stack, pts_flat, dists_flat, d_colors):
        n_rows = pts_flat.shape[0]
        n_tiles = n_rows // rows
        w_stack = w_stack.astype(cdt)
        in_specs = common_in_specs() + [
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
        )(pts_flat, dists_flat, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack, b_stack, d_colors)
        return dw, db

    @jax.custom_vjp
    def render(w_stack, b_stack, pts_flat, dists_flat):
        return forward(w_stack, b_stack, pts_flat, dists_flat)

    def render_fwd(w_stack, b_stack, pts_flat, dists_flat):
        out = forward(w_stack, b_stack, pts_flat, dists_flat)
        return out, (w_stack, b_stack, pts_flat, dists_flat)

    def render_bwd(res, d_out):
        w_stack, b_stack, pts_flat, dists_flat = res
        # only lanes 0..2 of the output are real colors
        lane = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 1)
        d_colors = jnp.where(lane < 3, d_out, 0.0)
        dw, db = backward(w_stack, b_stack, pts_flat, dists_flat, d_colors)
        return dw, db, jnp.zeros_like(pts_flat), jnp.zeros_like(dists_flat)

    render.defvjp(render_fwd, render_bwd)
    return render


def render_rays(
    params, origins, directions, t_vals, dists, config,
    tile_rays: int = 0, highest_precision: bool = True,
    compute_dtype: str = "", kw_ablate: str = "",
) -> jnp.ndarray:
    """Fused render: (N,3) colors from rays.  Differentiable w.r.t. params
    (input cotangents are zero — training optimizes params only).

    ``compute_dtype="bfloat16"`` runs matmuls/activations in bf16 with fp32
    accumulation and compositing — the production mode for MXU-bound wide
    configs; fp32 (optionally HIGHEST precision) is the parity mode.
    """
    L = len(params["w"])
    S = config.num_samples
    if not compute_dtype:
        compute_dtype = getattr(config, "compute_dtype", "float32")
    if compute_dtype == "bfloat16":
        # fp32 contract precision on bf16 operands is invalid in Mosaic
        # ("Bad lhs type"); bf16 is single-pass by definition
        highest_precision = False
    widths = [config.in_channels] + [w.shape[1] for w in params["w"]]
    pw = pu.round_up(max(widths + [128]), 128)
    if not tile_rays:
        itemsize = 2 if compute_dtype == "bfloat16" else 4
        tile_rays = pu.pick_tile_rays(S, pw, n_live_buffers=L + 4,
                                      itemsize=itemsize)
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    o = pad_rays(origins.astype(jnp.float32))
    d = pad_rays(directions.astype(jnp.float32))
    t = pad_rays(t_vals.astype(jnp.float32))
    # sample points computed by XLA (12 B/row of HBM; keeps the kernel free
    # of cross-sample sublane broadcasts)
    pts_flat = (o[:, None, :] + d[:, None, :] * t[..., None]).reshape(
        n_pad * S, 3
    )
    dists_flat = pad_rays(dists.astype(jnp.float32)).reshape(n_pad * S, 1)

    w_stack, b_stack = pu.stack_padded_params(params, pw)
    render = _make_render_fns(
        L, tile_rays, S, pw, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype, kw_ablate,
    )
    out = render(w_stack, b_stack, pts_flat, dists_flat)
    return out[:n, :3]


def nerf_loss(params, origins, directions, t_vals, dists, target, config,
              **kw) -> jnp.ndarray:
    from lomanerf_tpu.core.losses import sum_mse

    pred = render_rays(params, origins, directions, t_vals, dists, config, **kw)
    return sum_mse(pred, target)
