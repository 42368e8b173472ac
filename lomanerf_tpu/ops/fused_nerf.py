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


# bf16x3 precision tier + shared dot wrappers (pallas_utils).
BF16X3 = pu.BF16X3
_dot_general3 = pu.dot_general_bf16x3
_dot, _dot_t, _dot_tt = pu.mm, pu.mm_t, pu.mm_tt

def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _encode(pk_ref, E_ref, m_ref, precision):
    """(rows, PW) positional-encoded points: one matmul + one sin pass.

    ``pk_ref`` is the PACKED (8, rows) ray block — sublanes 0-2 = xyz,
    sublane 3 = dists, 4-7 zero (see ``_packed_ray_layout``).  E is (8, pw)
    with zero rows for sublanes >= 3, so the transposed matmul
    pk^T (rows, 8) @ E ignores the dists sublane.  A (rows, 3)-shaped input
    would cost 128/3x its logical bytes in HBM (TPU tiles the minor dim to
    128 lanes) — at 800x800xS=128 that is 4.3 GB for points alone."""
    P = _dot_tt(pk_ref[...], E_ref[...], precision)
    return m_ref[0:1, :] * P + m_ref[1:2, :] * jnp.sin(P + m_ref[2:3, :])


def _pk_dists(pk_ref, dsel_ref):
    """(rows, 1) dists column from the packed block: a one-hot transposed
    matmul at HIGHEST precision (exact for 1.0 * x products), independent
    of the config's compute precision."""
    return _dot_tt(pk_ref[...], dsel_ref[...],
                   jax.lax.Precision.HIGHEST)[:, 0:1]


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


def _composite_fwd(rgba, dists_flat, S, mode, stride=1):
    """Per-sample weights w (rows,1) from density lane 3 and dists.

    Always fp32 (rgba may arrive as bf16 from the compute-dtype path).
    ``stride=1`` = ray-major rows (samples contiguous); ``stride=R`` =
    s-major rows (row = s*R + r; the in-kernel-point-generation layout) —
    the scans roll by multiples of the stride."""
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
    P = pu.seg_inclusive_cumprod(c, S, stride)
    s_idx = pu._sample_index(alpha.shape[0], S, stride)
    if mode == "loma":
        T = jnp.where(s_idx == 0, 1.0, P)  # nerf.py:252-258 forces T[0]=1
    else:
        T = pu.seg_shift_down(P, S, fill=1.0, stride=stride)
    w = alpha * T
    return sigma, alpha, c, P, T, w


def _ray_selector(rows, R, S, smajor=False):
    """(rows, R) 0/1 matrix: row i belongs to ray i // S (ray-major) or
    i %% R (s-major).  Broadcasting per-ray vectors across samples — and
    reducing rows to rays — as an MXU matmul."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 0)
    ray_of_row = (row % R) if smajor else (row // S)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    return (ray_of_row == col).astype(jnp.float32)


def _nerf_forward_kernel(
    pk_ref, dsel_ref, E_ref, m_ref, w_ref, b_ref, out_ref,
    *, L, R, S, mode, precision, cdt, ablate="",
):
    # ``ablate`` is a perf-debugging hook ("no_sin" / "no_composite" /
    # "no_mlp"); production paths always pass "".
    if "no_sin" in ablate:
        enc = _dot_tt(pk_ref[...], E_ref[...], precision)
    else:
        enc = _encode(pk_ref, E_ref, m_ref, precision)
    dists = _pk_dists(pk_ref, dsel_ref)
    if "no_mlp" in ablate:
        rgba = enc.astype(jnp.float32)
    else:
        acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
        rgba = acts[-1].astype(jnp.float32)
    if "no_composite" in ablate:
        lane = _lane_iota(rgba.shape)
        sigma = jnp.sum(jnp.where(lane == 3, rgba, 0.0), axis=1,
                        keepdims=True)
        w = 1.0 - jnp.exp(-sigma * dists)
    else:
        _, _, _, _, _, w = _composite_fwd(rgba, dists, S, mode)
    pw = rgba.shape[1]
    weighted = (rgba * w).reshape(R, S, pw)
    out_ref[...] = jnp.sum(weighted, axis=1)[:, :128]


def _bwd_from_dcol(
    dcol, acts, rgba, dists, comp, w_ref, dw_ref, db_ref,
    *, L, R, S, mode, precision, cdt, stride=1,
):
    """Shared backward: from per-ray color cotangents ``dcol`` (R, pw) and
    the in-VMEM forward state, accumulate dW/db across the sequential grid
    (the race-free TPU analog of loma's ``atomic_add``,
    reverse_diff.py:144-155).  ``stride`` as in _composite_fwd (1 =
    ray-major rows, R = s-major rows)."""
    rows = R * S
    sigma, alpha, c, P, T, w = comp
    pw = rgba.shape[1]
    lane = _lane_iota(rgba.shape)
    rgb_mask = (lane < 3).astype(jnp.float32)

    # --- compositing backward ---
    sel = _ray_selector(rows, R, S, smajor=stride > 1)
    dcol_b = _dot(sel, dcol, precision)  # (rows, pw) per-ray broadcast
    # color_ch = sum_s w * rgba_ch  (ch < 3)
    d_w = jnp.sum(dcol_b * rgba * rgb_mask, axis=1, keepdims=True)  # (rows,1)
    d_rgb = dcol_b * w * rgb_mask  # (rows, pw), lanes 0..2
    s_idx = pu._sample_index(rows, S, stride)
    if mode == "loma":
        d_T = jnp.where(s_idx == 0, 0.0, d_w * alpha)
        # d_c[j] = (1/c_j) * sum_{m >= max(j,1)} d_T[m] * P[m]; d_T[0] = 0 so
        # the plain suffix sum covers j = 0 as well
        suf = pu.seg_suffix_sum(d_T * P, S, stride)
        d_c = suf / c
    else:
        d_T_incl = d_w * alpha  # dL/dT at each s (T = shift_down(P))
        rolled = pltpu.roll(d_T_incl, rows - stride, axis=0)
        d_P = jnp.where(s_idx < S - 1, rolled, 0.0)
        suf = pu.seg_suffix_sum(d_P * P, S, stride)
        d_c = suf / c
    d_alpha = d_w * T - d_c
    d_sigma = d_alpha * dists * (1.0 - alpha)  # d(alpha)/d(sigma*d) = e

    # --- head backward: dz for the last layer ---
    d_h = d_rgb + d_sigma * (lane == 3).astype(jnp.float32)
    relu_m = (rgba > 0).astype(jnp.float32)
    sig_d = rgba * (1.0 - rgba)
    d_z = jnp.where(lane == 3, d_h * relu_m, d_h * sig_d)

    # --- MLP backward with accumulation across grid steps ---
    for l in range(L - 1, -1, -1):
        h_prev = acts[l]
        d_z_c = d_z.astype(cdt)
        dw_ref[l] += _dot_tt(h_prev, d_z_c, precision)
        db_ref[l : l + 1, :] += jnp.sum(d_z, axis=0, keepdims=True)
        if l > 0:
            d_h = _dot_t(d_z_c, w_ref[l].astype(cdt), precision)
            # compare in f32 (bf16 comparisons unsupported on this target)
            d_z = d_h * (h_prev.astype(jnp.float32) > 0).astype(jnp.float32)


def _nerf_backward_kernel(
    pk_ref, dsel_ref, E_ref, m_ref, w_ref, b_ref, dcol_ref,
    dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
):
    # --- recompute forward (remat) ---
    enc = _encode(pk_ref, E_ref, m_ref, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    dists = _pk_dists(pk_ref, dsel_ref)
    comp = _composite_fwd(rgba, dists, S, mode)
    pw = rgba.shape[1]

    dcol = dcol_ref[...]  # (R, 128); only lanes 0..2 nonzero
    if pw > 128:
        dcol = jnp.pad(dcol, ((0, 0), (0, pw - 128)))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    _bwd_from_dcol(dcol, acts, rgba, dists, comp, w_ref, dw_ref, db_ref,
                   L=L, R=R, S=S, mode=mode, precision=precision, cdt=cdt)


def _nerf_train_kernel(
    nrays_ref, pk_ref, dsel_ref, E_ref, m_ref, w_ref, b_ref, tgt_ref,
    loss_ref, dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
):
    """ONE pass: forward + sum-MSE loss + backward, activations staying in
    VMEM.  Replaces the (forward kernel, remat-backward kernel) pair for the
    train step — one full forward (including the dominant encoding sin pass)
    cheaper per step.  Equivalent to the reference running
    ``nerf_evaluate_and_march`` + ``grad_...`` in one fused call
    (train_nerf.py:325-478) without recomputing the primal."""
    enc = _encode(pk_ref, E_ref, m_ref, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    dists = _pk_dists(pk_ref, dsel_ref)
    comp = _composite_fwd(rgba, dists, S, mode)
    w = comp[-1]
    pw = rgba.shape[1]

    # per-ray reduction as a selector matmul (MXU) — reshape(R, S, pw) with
    # S not a sublane multiple forces an expensive relayout
    sel = _ray_selector(R * S, R, S)
    pred = _dot_tt(sel, rgba * w, precision)  # (R, pw)
    tgt = tgt_ref[...]  # (R, 128); lanes 0..2 real
    if pw > 128:
        tgt = jnp.pad(tgt, ((0, 0), (0, pw - 128)))
    lane_r = _lane_iota(pred.shape)
    ray_idx = pl.program_id(0) * R + jax.lax.broadcasted_iota(
        jnp.int32, pred.shape, 0
    )
    # mask out pad lanes AND pad rays (rays >= n_rays are tile padding);
    # n_rays arrives as an SMEM scalar so batch size is NOT baked into the
    # trace (variable-batch training reuses one compiled kernel)
    mask = jnp.where((lane_r < 3) & (ray_idx < nrays_ref[0, 0]), 1.0, 0.0)
    diff = (pred - tgt) * mask

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    # keep the partial loss 2D end-to-end (scalar VMEM stores are invalid)
    sq = jnp.sum(diff * diff, axis=1, keepdims=True)  # (R, 1)
    loss_ref[...] += jnp.sum(sq, axis=0, keepdims=True)  # (1, 1)
    _bwd_from_dcol(2.0 * diff, acts, rgba, dists, comp, w_ref, dw_ref,
                   db_ref, L=L, R=R, S=S, mode=mode, precision=precision,
                   cdt=cdt)


@functools.lru_cache(maxsize=None)
def _make_render_fns(L, R, S, pw, in_dim, num_functions, mode, highest_prec,
                     compute_dtype="float32", ablate=""):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_pk(in_dim, num_functions, pw)
    dsel_np = np.zeros((8, 128), np.float32)
    dsel_np[3, 0] = 1.0  # dists live on sublane 3 of the packed block

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
            pu.bspec((8, rows), 1),
            pu.bspec((8, 128)),
            pu.bspec((8, pw)),
            pu.bspec((3, pw)),
            pu.bspec((L, pw, pw)),
            pu.bspec((L, pw)),
        ]

    def forward(w_stack, b_stack, pk):
        n_rows = pk.shape[1]
        # bf16 weights halve their VMEM block
        return pu.tiled_call(
            fwd_kernel, n_rows // rows,
            in_specs=common_in_specs(),
            out_specs=pu.bspec((R, 128), 0),
            out_shape=jax.ShapeDtypeStruct((n_rows // S, 128), jnp.float32),
            cost=pl.CostEstimate(
                flops=2 * n_rows * pw * (pw * L + in_dim),
                bytes_accessed=n_rows * 8 * 4 + (n_rows // S) * 512,
                transcendentals=n_rows * pw * 2,
            ),
        )(pk, jnp.asarray(dsel_np), jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack)

    def backward(w_stack, b_stack, pk, d_colors):
        return pu.tiled_call(
            bwd_kernel, pk.shape[1] // rows,
            in_specs=common_in_specs() + [pu.bspec((R, 128), 0)],
            out_specs=[pu.bspec((L, pw, pw)), pu.bspec((L, pw))],
            out_shape=[
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
        )(pk, jnp.asarray(dsel_np), jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack, d_colors)

    def dcol(d_out):
        # only lanes 0..2 of the output are real colors
        lane = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 1)
        return jnp.where(lane < 3, d_out, 0.0)

    return pu.render_vjp(forward, backward, dcol)


# ---------------------------------------------------------------------------
# transposed layout (narrow MLPs): activations are (PS, rows) — features on
# SUBLANES (PS = width rounded to 8, e.g. 40 for the parity MLP), rows on
# LANES.  Elementwise ops then touch PS/8 sublane-tiles instead of a full
# 128-lane vreg per 8 rows: ~3.2x less VPU work for width-33 data, and the
# per-sample compositing scalars become (1, rows) — one vreg per 128 samples
# instead of per 8.  This is the structural fix for the lane waste measured
# in the row-major kernel (PERF.md ablation); wide configs (PS >= 128) keep
# the row-major kernels where lanes are already full.
# ---------------------------------------------------------------------------


def _sublane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _encode_T(ptsT, E_ref, m_ref, precision):
    """(PS, rows) encoded points, then masked sin blend.

    P = E^T @ pts^T is block-sparse (each output sublane is one coordinate
    times a power of two), so it is computed as three (PS,1)x(1,rows)
    broadcast multiply-adds on the VPU: exact f32 (each product is a single
    f32 multiply) and cheaper than the MXU matmul, whose HIGHEST-precision
    6-pass emulation dominated the encode cost."""
    E = E_ref[...]
    P = E[:, 0:1] * ptsT[0:1, :]
    for k in range(1, 3):
        P = P + E[:, k : k + 1] * ptsT[k : k + 1, :]
    return m_ref[:, 0:1] * P + m_ref[:, 1:2] * jnp.sin(P + m_ref[:, 2:3])


def _encode_T_rec(ptsT, num_functions, ps, in_dim=3):
    """Recurrence encoding: the sin pass over all PS sublanes was the
    measured VPU floor of the parity train step (PERF.md ablation, ~47%).
    sin/cos of the base octave are computed ONCE on (in_dim, rows) slices
    and every higher octave follows from the double-angle identities
        sin 2x = 2 sin x cos x,   cos 2x = 1 - 2 sin^2 x
    — 3 multiply/add passes on (in_dim, rows) per octave instead of a
    transcendental over the full (PS, rows) tile: ~PS/(2*in_dim) = 6.7x
    fewer transcendental lanes for the parity config.  Error grows ~2x per
    octave (≈16 ulp at octave 4) — far inside kernel parity tolerances.
    Layout matches pos_encoding.py:26-32: [x | sin 2^0 x | cos 2^0 x | ...].
    """
    p = ptsT[:in_dim, :]
    s = jnp.sin(p)
    c = jnp.cos(p)
    blocks = [p, s, c]
    for _ in range(1, num_functions):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        blocks.append(s)
        blocks.append(c)
    enc = jnp.concatenate(blocks, axis=0)
    pad = ps - enc.shape[0]
    if pad:
        enc = jnp.pad(enc, ((0, pad), (0, 0)))
    return enc


def _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt=jnp.float32,
                   head_period=None):
    """acts[l] are (PS, rows); w_ref[l] holds W_l^T in [:out, :in].

    ``head_period``: sublane period of the density channel — None for the
    plain transposed layout (density at sublane 3), ``ps`` for the
    sublane-packed layout where group g's density sits at g*ps + 3."""
    acts = [enc.astype(cdt)]
    h = acts[0]
    for l in range(L):
        z = _dot(w_ref[l].astype(cdt), h, precision) + b_ref[:, l : l + 1]
        if l < L - 1:
            h = jnp.maximum(z, 0.0).astype(cdt)
        else:
            sub = _sublane_iota(z.shape)
            if head_period is not None:
                sub = sub % head_period
            h = jnp.where(
                sub == 3, jnp.maximum(z, 0.0), jax.nn.sigmoid(z)
            ).astype(cdt)
        acts.append(h)
    return acts


def _composite_fwd_T(rgba, distsT, S, mode, stride=1):
    """Transposed compositing: all per-sample scalars are (1, rows).
    Density is a static SUBLANE slice (rgba[3:4]) — free, unlike the
    row-major masked-sum over lanes.  ``stride`` selects the lane order:
    1 = ray-major (samples contiguous), R = s-major (rays contiguous,
    sample blocks R lanes apart) — the scan recurrences are identical with
    rolls scaled by the stride."""
    sigma = rgba[3:4, :].astype(jnp.float32)
    e = jnp.exp(-sigma * distsT)
    alpha = 1.0 - e
    c = e + EPS
    P = pu.seg_inclusive_cumprod_lanes(c, S, stride)
    s_idx = pu._sample_index_lanes(alpha.shape[1], S, stride)
    if mode == "loma":
        T = jnp.where(s_idx == 0, 1.0, P)
    else:
        T = pu.seg_shift_down_lanes(P, S, fill=1.0, stride=stride)
    w = alpha * T
    return sigma, alpha, c, P, T, w


def _ray_matrix_T(R, rows, S):
    """(R, rows) 0/1: column i belongs to ray i // S.  Used both to reduce
    rows->rays (contract on lanes) and to broadcast rays->rows (contract on
    R) — one MXU-resident matrix for both directions."""
    row_of = jax.lax.broadcasted_iota(jnp.int32, (R, rows), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, rows), 1) // S
    return (row_of == col).astype(jnp.float32)


def _nerf_train_kernel_T(
    nrays_ref, *refs, L, R, S, mode, precision, cdt,
    num_functions, enc_impl="rec", ablate="", from_rays=False,
):
    """Transposed single-pass train kernel: forward + sum-MSE + backward.
    Outputs dW in W^T layout (L, PS, PS) and db as (PS, L) columns.

    ``from_rays=True`` (uniform depths): the tile reads a PER-RAY (8, R)
    block (origin sublanes 0-2, direction 3-5) + per-ray (8, R) targets and
    generates the (8, rows) ray-major sample points IN-KERNEL — lane
    r*S + s = o_r + d_r * t[s] via a lane-repeat of the ray block — which
    deletes the O(N*S) XLA input prep (measured 5.0 ms = 20% of the
    single64 step, artifacts/r5_single64_stages.log) and shrinks the
    step's ray HBM traffic from O(N*S) to O(N), the same structural fix
    the s-major kernels apply where their VMEM shape fits."""
    if from_rays:
        (raysT_ref, selM_ref, trow_ref, distsT_ref, E_ref, m_ref, w_ref,
         b_ref, tgt8_ref, loss_ref, dw_ref, db_ref) = refs
        # (1, 8, Rp) lane-padded per-tile ray block (Pallas wants 128-lane
        # blocks; only the first R lanes are real rays) + targets, expanded
        # together to the (8, rows) ray-major layout by ONE 0/1 selector
        # matmul selM[k, l] = (k == l // S) — see _expand_rays_T
        stacked = jnp.concatenate([raysT_ref[0], tgt8_ref[0]], axis=0)
        ptsT, tgtT = _expand_rays_T(stacked, selM_ref, trow_ref, precision)
    else:
        (ptsT_ref, distsT_ref, E_ref, m_ref, w_ref, b_ref, tgtT_ref,
         loss_ref, dw_ref, db_ref) = refs
        ptsT = ptsT_ref[...]
        tgtT = tgtT_ref[...]

    def _enc():
        if enc_impl == "rec":
            return _encode_T_rec(ptsT, num_functions, w_ref.shape[1])
        return _encode_T(ptsT, E_ref, m_ref, precision)
    rows = R * S
    if "enc_nocat" in ablate or "enc_notrans" in ablate:
        # stage-isolation probes for the encode floor (PERF.md roofline):
        # enc_nocat   = DMA + transcendentals + recurrence, NO concatenate
        # enc_notrans = DMA + the (PS, rows) concatenate of (3, rows)
        #               blocks, NO transcendentals/recurrence
        p = ptsT[:3, :]
        if "enc_nocat" in ablate:
            s = jnp.sin(p)
            c = jnp.cos(p)
            acc = p + s + c
            for _ in range(1, num_functions):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                acc = acc + s + c
            probe = acc
        else:
            blocks = [p * (0.5 * k + 1.0) for k in range(2 * num_functions + 1)]
            enc = jnp.concatenate(blocks, axis=0)
            pad = w_ref.shape[1] - enc.shape[0]
            if pad:
                enc = jnp.pad(enc, ((0, pad), (0, 0)))
            probe = enc

        @pl.when(pl.program_id(0) == 0)
        def _():
            loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
            dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
            db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

        loss_ref[...] += jnp.sum(probe[:1, :1], axis=0, keepdims=True)
        return
    if "enc_only" in ablate:  # measure launch+DMA+encode floor
        enc = _enc()

        @pl.when(pl.program_id(0) == 0)
        def _():
            loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
            dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
            db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

        loss_ref[...] += jnp.sum(enc[:1, :1], axis=0, keepdims=True)
        return
    enc = _enc()
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    distsT = distsT_ref[...]
    if "no_scans" in ablate:  # perf hook: skip the compositing scans
        sigma = rgba[3:4, :].astype(jnp.float32)
        alpha = 1.0 - jnp.exp(-sigma * distsT_ref[...])
        c = P = T = jnp.ones_like(alpha)
        w = alpha
    else:
        sigma, alpha, c, P, T, w = _composite_fwd_T(rgba, distsT, S, mode)
    ps = rgba.shape[0]

    # Per-ray color sums and their broadcast back to rows as segmented lane
    # scans on an (8, rows) slice — no (R, rows) ray matrix (quadratic VMEM
    # in the ray tile) and no MXU passes.
    g8 = (rgba * w)[:8, :]  # sublanes 0..2 real
    if "no_scans" in ablate:
        suf = g8
    else:
        suf = pu.seg_suffix_sum_lanes(g8, S)  # value at s=0: ray's color
    tgt = tgtT  # (8, rows): per-ray target replicated across s
    sub8 = _sublane_iota(tgt.shape)
    row_idx = pl.program_id(0) * rows + jax.lax.broadcasted_iota(
        jnp.int32, tgt.shape, 1
    )
    s_idx = pu._sample_index_lanes(rows, S)
    # n_rays is an SMEM scalar (not baked into the trace): one compiled
    # kernel serves every batch size that shares a padded tile count
    valid = (sub8 < 3) & (row_idx < nrays_ref[0, 0] * S)
    diff0 = jnp.where(valid & (s_idx == 0), suf - tgt, 0.0)  # (8, rows)

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    sq = jnp.sum(diff0 * diff0, axis=1, keepdims=True)  # (8, 1)
    loss_ref[...] += jnp.sum(sq, axis=0, keepdims=True)

    if "no_bwd" in ablate:  # perf-ablation hook: forward+loss only
        return

    # --- compositing backward (all (1, rows) lane math) ---
    if "no_scans" in ablate:
        dcol8 = 2.0 * diff0
    else:
        dcol8 = 2.0 * pu.seg_broadcast_first_lanes(diff0, S)  # (8, rows)
    _bwd_from_dcol_T(dcol8, acts, rgba, distsT, (sigma, alpha, c, P, T, w),
                     w_ref, dw_ref, db_ref, L=L, S=S, mode=mode,
                     precision=precision, cdt=cdt, ablate=ablate)


def _bwd_from_dcol_T(
    dcol8, acts, rgba, distsT, comp, w_ref, dw_ref, db_ref,
    *, L, S, mode, precision, cdt, ablate="", stride=1, h0_fn=None,
    pack=1,
):
    """Shared transposed backward: from per-row color cotangents ``dcol8``
    (8, rows; sublanes 0..2 real, already broadcast across each ray's
    samples) and the in-VMEM forward state, accumulate dW^T/db across the
    sequential grid.  ``stride`` as in _composite_fwd_T (1 = ray-major
    lanes, R = s-major lanes)."""
    sigma, alpha, c, P, T, w = comp
    ps = rgba.shape[0]
    rows = rgba.shape[1]
    d_w = (
        dcol8[0:1] * rgba[0:1]
        + dcol8[1:2] * rgba[1:2]
        + dcol8[2:3] * rgba[2:3]
    )  # (1, rows)
    dcol_b = jnp.pad(dcol8, ((0, ps - 8), (0, 0)))  # (PS, rows)
    sub = _sublane_iota(rgba.shape)
    rgb_mask = (sub < 3).astype(jnp.float32)
    d_rgb = dcol_b * w * rgb_mask
    s_idx = pu._sample_index_lanes(rows, S, stride)
    if "no_scans" in ablate:
        d_c = jnp.zeros_like(c)
    elif mode == "loma":
        d_T = jnp.where(s_idx == 0, 0.0, d_w * alpha)
        suf = pu.seg_suffix_sum_lanes(d_T * P, S, stride)
        d_c = suf / c
    else:
        d_T_incl = d_w * alpha
        rolled = pltpu.roll(d_T_incl, rows - stride, axis=1)
        d_P = jnp.where(s_idx < S - 1, rolled, 0.0)
        suf = pu.seg_suffix_sum_lanes(d_P * P, S, stride)
        d_c = suf / c
    d_alpha = d_w * T - d_c
    d_sigma = d_alpha * distsT * (1.0 - alpha)  # (1, rows)

    # --- head backward ---
    d_h = d_rgb + d_sigma * (sub == 3).astype(jnp.float32)
    relu_m = (rgba > 0).astype(jnp.float32)
    sig_d = rgba * (1.0 - rgba)
    d_z = jnp.where(sub == 3, d_h * relu_m, d_h * sig_d)

    if "no_mlp_bwd" in ablate:  # perf-ablation hook
        return

    if pack > 1:
        # sublane-packed MLP backward (see _pick_pack_S): acts, w_ref AND
        # the dw/db output refs are packed — the diagonal-block fold to
        # unpacked (ps, ...) grads happens once per step in XLA outside
        # the kernel (train_call), not per tile
        d_zp = _pack_sublanes(d_z, pack)
        for l in range(L - 1, -1, -1):
            h_prev = acts[l] if acts[l] is not None else h0_fn()
            d_z_c = d_zp.astype(cdt)
            dw_ref[l] += _dot_t(d_z_c, h_prev, precision)  # (k*ps, k*ps)
            db_ref[:, l : l + 1] += jnp.sum(d_zp, axis=1, keepdims=True)
            if l > 0:
                d_hp = _dot_tt(w_ref[l].astype(cdt), d_z_c, precision)
                d_zp = d_hp * (
                    h_prev.astype(jnp.float32) > 0
                ).astype(jnp.float32)
        return

    # --- MLP backward: dW^T[l] = d_z @ h_prev^T (contract rows-lanes) ---
    for l in range(L - 1, -1, -1):
        # h0_fn: recompute the encoding here instead of keeping acts[0]
        # live through the whole kernel (a VMEM-liveness experiment for
        # bigger ray tiles; the encode is ~free, PERF.md round-3)
        h_prev = acts[l] if acts[l] is not None else h0_fn()
        d_z_c = d_z.astype(cdt)
        dw_ref[l] += _dot_t(d_z_c, h_prev, precision)
        db_ref[:, l : l + 1] += jnp.sum(d_z, axis=1, keepdims=True)
        if l > 0:
            d_h = _dot_tt(w_ref[l].astype(cdt), d_z_c, precision)
            d_z = d_h * (h_prev.astype(jnp.float32) > 0).astype(jnp.float32)


def _expand_precision(precision):
    """Precision tier for the selector-matmul ray expansion: keep the
    kernel's own tier, but never looser than bf16x3 — a single bf16 pass
    would round the fp32 ray COORDINATES to ~4e-3 relative, which the
    encoding amplifies by 2^octaves into large phases.  HIGHEST is exact;
    bf16x3 leaves ~1.5e-5 relative (inside the "high" gate tolerances)
    at half the MXU passes."""
    if precision == jax.lax.Precision.HIGHEST:
        return precision
    return BF16X3


def _expand_rays_T(stack_block, selM_ref, trow_ref, precision):
    """(8k, Rp) stacked per-ray blocks -> (8k, rows) ray-major via ONE 0/1
    selector matmul (Mosaic rejects the equivalent lane repeat+reshape;
    stacking rays/targets/cotangents on sublanes amortizes the matmul's
    8/128 output-sublane occupancy), then ptsT from sublanes 0-5 and the
    (1, rows) depth comb.  Returns (ptsT(8, rows), rest(8(k-1), rows))."""
    rep = pu.mm(stack_block, selM_ref[...], _expand_precision(precision))
    ptsT = jnp.pad(rep[0:3] + rep[3:6] * trow_ref[...], ((0, 5), (0, 0)))
    return ptsT, rep[8:]


def _nerf_forward_kernel_T(
    *refs, L, S, mode, precision, cdt, num_functions, enc_impl="rec",
    from_rays=False,
):
    """Transposed render forward.  Default layout: writes the (8, rows)
    segmented suffix sum of weighted colors — the lane at each ray's
    s == 0 holds its color (sublanes 0..2); the wrapper gathers those
    lanes in XLA.  ``from_rays``: per-ray (1, 8, Rp) input blocks, points
    generated in-kernel, and the PER-RAY (1, 8, Rp) colors written
    directly (selector-matmul gather of the s == 0 lanes) — O(N) ray
    bytes in and out instead of O(N*S)."""
    if from_rays:
        (raysT_ref, selM_ref, trow_ref, distsT_ref, E_ref, m_ref, w_ref,
         b_ref, out_ref) = refs
        ptsT, _ = _expand_rays_T(raysT_ref[0], selM_ref, trow_ref,
                                 precision)
    else:
        (ptsT_ref, distsT_ref, E_ref, m_ref, w_ref, b_ref, out_ref) = refs
        ptsT = ptsT_ref[...]
    if enc_impl == "rec":
        enc = _encode_T_rec(ptsT, num_functions, w_ref.shape[1])
    else:
        enc = _encode_T(ptsT, E_ref, m_ref, precision)
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    w = _composite_fwd_T(rgba, distsT_ref[...], S, mode)[-1]
    suf = pu.seg_suffix_sum_lanes((rgba * w)[:8, :], S)
    if from_rays:
        rows = suf.shape[1]
        s_idx = pu._sample_index_lanes(rows, S)
        suf0 = jnp.where(s_idx == 0, suf, 0.0)
        # (8, rows) @ selM^T -> (8, Rp): exactly one nonzero lane per
        # segment survives the mask, so the 0/1 contraction is a gather
        out_ref[0] = pu.mm_t(suf0, selM_ref[...],
                             _expand_precision(precision))
    else:
        out_ref[...] = suf


def _nerf_backward_kernel_T(
    *refs, L, S, mode, precision, cdt, num_functions, enc_impl="rec",
    from_rays=False,
):
    """Transposed remat backward for the render path: recompute the tile's
    forward in VMEM, then run the shared transposed adjoint walk.  dcolT is
    (8, rows) — each ray's color cotangent replicated across its samples —
    or, under ``from_rays``, a per-ray (1, 8, Rp) block expanded in-kernel
    by the same selector matmul."""
    if from_rays:
        (raysT_ref, selM_ref, trow_ref, distsT_ref, E_ref, m_ref, w_ref,
         b_ref, dcol3_ref, dw_ref, db_ref) = refs
        stacked = jnp.concatenate([raysT_ref[0], dcol3_ref[0]], axis=0)
        ptsT, dcolT = _expand_rays_T(stacked, selM_ref, trow_ref, precision)
    else:
        (ptsT_ref, distsT_ref, E_ref, m_ref, w_ref, b_ref, dcolT_ref,
         dw_ref, db_ref) = refs
        ptsT = ptsT_ref[...]
        dcolT = dcolT_ref[...]
    if enc_impl == "rec":
        enc = _encode_T_rec(ptsT, num_functions, w_ref.shape[1])
    else:
        enc = _encode_T(ptsT, E_ref, m_ref, precision)
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    distsT = distsT_ref[...]
    comp = _composite_fwd_T(rgba, distsT, S, mode)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    _bwd_from_dcol_T(dcolT, acts, rgba, distsT, comp, w_ref,
                     dw_ref, db_ref, L=L, S=S, mode=mode,
                     precision=precision, cdt=cdt)


@functools.lru_cache(maxsize=None)
def _make_render_fns_T(L, R, S, ps, in_dim, num_functions, mode,
                       highest_prec, compute_dtype="float32",
                       from_rays=False):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_T(in_dim, num_functions, ps)
    in_pad = E_np.shape[1]
    fwd_kernel = functools.partial(
        _nerf_forward_kernel_T, L=L, S=S, mode=mode, precision=precision,
        cdt=cdt, num_functions=num_functions, from_rays=from_rays,
    )
    bwd_kernel = functools.partial(
        _nerf_backward_kernel_T, L=L, S=S, mode=mode, precision=precision,
        cdt=cdt, num_functions=num_functions, from_rays=from_rays,
    )
    rows = R * S

    if from_rays:
        # uniform depths: O(N) per-ray inputs AND O(N) per-ray outputs —
        # points generated and s==0 colors gathered in-kernel (selector
        # matmuls); the O(N*S) ptsT prep and every-S-th-lane XLA gather
        # both disappear (the narrow analog of the s-major render layout
        # where that kernel's VMEM shape doesn't fit, e.g. single64)
        Rp = max(pu.round_up(R, 128), 128)
        selM_np = (np.arange(Rp)[:, None] ==
                   (np.arange(rows)[None, :] // S)).astype(np.float32)

        def common_rays():
            return [
                pu.bspec((1, 8, Rp), 0),
                pu.bspec((Rp, rows)),
                pu.bspec((1, rows)),
                pu.bspec((1, rows)),
                pu.bspec((ps, in_pad)),
                pu.bspec((ps, 3)),
                pu.bspec((L, ps, ps)),
                pu.bspec((ps, L)),
            ]

        def forward(w_stack, b_stack, rays3, t_row, d_row):
            n_tiles = rays3.shape[0]
            return pu.tiled_call(
                fwd_kernel, n_tiles,
                in_specs=common_rays(),
                out_specs=pu.bspec((1, 8, Rp), 0),
                out_shape=jax.ShapeDtypeStruct((n_tiles, 8, Rp),
                                               jnp.float32),
            )(rays3, jnp.asarray(selM_np), t_row, d_row,
              jnp.asarray(E_np), jnp.asarray(m_np), w_stack.astype(cdt),
              b_stack)

        def backward(w_stack, b_stack, rays3, t_row, d_row, dcol3):
            return pu.tiled_call(
                bwd_kernel, rays3.shape[0],
                in_specs=common_rays() + [pu.bspec((1, 8, Rp), 0)],
                out_specs=[pu.bspec((L, ps, ps)), pu.bspec((ps, L))],
                out_shape=[
                    jax.ShapeDtypeStruct((L, ps, ps), jnp.float32),
                    jax.ShapeDtypeStruct((ps, L), jnp.float32),
                ],
            )(rays3, jnp.asarray(selM_np), t_row, d_row,
              jnp.asarray(E_np), jnp.asarray(m_np), w_stack.astype(cdt),
              b_stack, dcol3)

        def dcol(d_out):
            # (n_tiles, 8, Rp) per-ray cotangents: sublanes 0..2 real
            sub = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 1)
            return jnp.where(sub < 3, d_out, 0.0)

        return pu.render_vjp(forward, backward, dcol)

    def common_in_specs():
        return [
            pu.bspec((in_pad, rows), 1),
            pu.bspec((1, rows), 1),
            pu.bspec((ps, in_pad)),
            pu.bspec((ps, 3)),
            pu.bspec((L, ps, ps)),
            pu.bspec((ps, L)),
        ]

    def forward(w_stack, b_stack, ptsT, distsT):
        return pu.tiled_call(
            fwd_kernel, ptsT.shape[1] // rows,
            in_specs=common_in_specs(),
            out_specs=pu.bspec((8, rows), 1),
            out_shape=jax.ShapeDtypeStruct((8, ptsT.shape[1]), jnp.float32),
        )(ptsT, distsT, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack)

    def backward(w_stack, b_stack, ptsT, distsT, dcolT):
        return pu.tiled_call(
            bwd_kernel, ptsT.shape[1] // rows,
            in_specs=common_in_specs() + [pu.bspec((8, rows), 1)],
            out_specs=[pu.bspec((L, ps, ps)), pu.bspec((ps, L))],
            out_shape=[
                jax.ShapeDtypeStruct((L, ps, ps), jnp.float32),
                jax.ShapeDtypeStruct((ps, L), jnp.float32),
            ],
        )(ptsT, distsT, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack, dcolT)

    def dcol(d_out):
        # the wrapper reads only sublanes 0..2 at each ray's s == 0 lane;
        # broadcast those cotangents across each ray's samples for the
        # kernel's adjoint walk (and zero everything else)
        total = d_out.shape[1]
        sub = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 0)
        d0 = jnp.where(sub < 3, d_out, 0.0).reshape(8, total // S, S)[..., 0]
        return jnp.repeat(d0, S, axis=1)

    return pu.render_vjp(forward, backward, dcol)


@functools.lru_cache(maxsize=None)
def _make_train_fn_T(L, R, S, ps, in_dim, num_functions, mode, highest_prec,
                     compute_dtype, ablate="", from_rays=False):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_T(in_dim, num_functions, ps)
    in_pad = E_np.shape[1]
    kernel = functools.partial(
        _nerf_train_kernel_T, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt, num_functions=num_functions, ablate=ablate,
        from_rays=from_rays,
    )
    rows = R * S

    if from_rays:
        # uniform depths: O(N) per-ray inputs, points generated in-kernel
        # (t_row/d_row are the same (1, rows) comb every tile — broadcast)
        Rp = max(pu.round_up(R, 128), 128)
        # 0/1 ray-broadcast selector: lane r*S + s takes ray r (fp32-exact
        # through an MXU pass at HIGHEST); constant across tiles
        selM_np = (np.arange(Rp)[:, None] ==
                   (np.arange(rows)[None, :] // S)).astype(np.float32)

        def train_call_rays(w_stack, b_stack, rays3, t_row, d_row, tgt3,
                            n_rays):
            n_tiles = rays3.shape[0]
            loss, dw, db = pu.tiled_call(
                kernel, n_tiles,
                in_specs=[
                    pu.bspec((1, 1), smem=True),
                    pu.bspec((1, 8, Rp), 0),
                    pu.bspec((Rp, rows)),
                    pu.bspec((1, rows)),
                    pu.bspec((1, rows)),
                    pu.bspec((ps, in_pad)),
                    pu.bspec((ps, 3)),
                    pu.bspec((L, ps, ps)),
                    pu.bspec((ps, L)),
                    pu.bspec((1, 8, Rp), 0),
                ],
                out_specs=[pu.bspec((1, 1)), pu.bspec((L, ps, ps)),
                           pu.bspec((ps, L))],
                out_shape=[
                    jax.ShapeDtypeStruct((1, 1), jnp.float32),
                    jax.ShapeDtypeStruct((L, ps, ps), jnp.float32),
                    jax.ShapeDtypeStruct((ps, L), jnp.float32),
                ],
            )(n_rays, rays3, jnp.asarray(selM_np), t_row, d_row,
              jnp.asarray(E_np), jnp.asarray(m_np), w_stack.astype(cdt),
              b_stack, tgt3)
            return loss[0, 0], dw, db

        return pu.train_loss_vjp(train_call_rays)

    def train_call(w_stack, b_stack, ptsT, distsT, tgtT, n_rays):
        n_tiles = ptsT.shape[1] // rows
        loss, dw, db = pu.tiled_call(
            kernel, n_tiles,
            in_specs=[
                pu.bspec((1, 1), smem=True),
                pu.bspec((in_pad, rows), 1),
                pu.bspec((1, rows), 1),
                pu.bspec((ps, in_pad)),
                pu.bspec((ps, 3)),
                pu.bspec((L, ps, ps)),
                pu.bspec((ps, L)),
                pu.bspec((8, rows), 1),
            ],
            out_specs=[pu.bspec((1, 1)), pu.bspec((L, ps, ps)),
                       pu.bspec((ps, L))],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((L, ps, ps), jnp.float32),
                jax.ShapeDtypeStruct((ps, L), jnp.float32),
            ],
        )(n_rays, ptsT, distsT, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack, tgtT)
        return loss[0, 0], dw, db

    # shared custom_vjp wiring (pallas_utils.train_loss_vjp): signature
    # fused_loss(w, b, ptsT, distsT, tgtT, n_smem) -> loss
    return pu.train_loss_vjp(train_call)


def _nerf_train_loss_T(
    params, origins, directions, t_vals, dists, target, config,
    tile_rays: int, highest_precision: bool, compute_dtype: str, ps: int,
    ablate: str = "",
) -> jnp.ndarray:
    L = len(params["w"])
    S = config.num_samples
    n = origins.shape[0]
    ptsT, distsT, n_pad, pad_rays = _transposed_ray_layout(
        origins, directions, t_vals, dists, S, tile_rays
    )
    # per-ray targets replicated across samples: (8, rows) so the kernel's
    # loss/cotangent math stays in the transposed lane layout.  Built
    # directly transposed (broadcast of the tiny (3, n_pad) transpose) —
    # the previous repeat+transpose of the O(N*S) result cost ~4 ms at the
    # parity shape (artifacts/r3_prep_ablate.log)
    tgt_t = pad_rays(target.astype(jnp.float32)).T  # (3, n_pad)
    n_pad2 = tgt_t.shape[1]
    tgtT = jnp.pad(
        jnp.broadcast_to(tgt_t[:, :, None], (3, n_pad2, S)).reshape(3, -1),
        ((0, 5), (0, 0)),
    )  # (8, n_pad*S)

    w_stack, b_stack = pu.stack_padded_params_T(params, ps)
    fused = _make_train_fn_T(
        L, tile_rays, S, ps, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype, ablate,
    )
    n_smem = jnp.full((1, 1), n, jnp.int32)
    return fused(w_stack, b_stack, ptsT, distsT, tgtT, n_smem)


# ---------------------------------------------------------------------------
# s-major transposed layout (narrow MLPs, uniform ray depths): sample points
# are generated IN-KERNEL from per-ray origin/direction blocks.
#
# The round-3 stage ablations (artifacts/r3_prep_ablate.log) showed the
# "encode" stage of the ray-major transposed kernel was 93% XLA-side input
# prep: building (8, rows) pts^T costs an 11.4 ms minor-dim-3 transpose of
# 94 MB of points, and the (8, rows) tgt^T repeat+transpose another 4 ms —
# 15.5 of the 45.8 ms parity step.  Generating points inside the kernel
# removes that prep AND shrinks the step's HBM traffic from O(N*S) to O(N):
# per tile the kernel reads R rays (origin, direction, target: 96 B/ray)
# instead of R*S rows (68 B/row = 2040 B/ray at S=30).
#
# Within a tile, lanes are ordered s*R + r (s-major) so each sample block is
# a lane-ALIGNED copy of the (8, R) ray block: pts[s] = o + d * t[s] is two
# FMAs per block, and the per-ray targets/cotangents broadcast to all
# samples by concatenating S aligned copies.  The segmented compositing
# scans keep their log2(S) masked-roll structure with rolls scaled by R
# (pallas_utils stride parameter).  Requires per-ray-uniform t_vals/dists
# ((S,) shaped — the production and parity sampling; sample_along_rays
# returns that when unjittered); stratified per-ray depths fall back to the
# ray-major kernels.
# ---------------------------------------------------------------------------


def _tile_lanes(x, rows):
    """Concatenate copies of ``x`` along lanes (doubling: ceil(log2) concats
    instead of ``rows/x.shape[1]`` — compile time matters at S=128) and
    slice to ``rows`` lanes.  The lane pattern stays periodic in
    x.shape[1], which is exactly the s-major repeat."""
    while x.shape[1] < rows:
        x = jnp.concatenate([x, x], axis=1)
    return x[:, :rows]


def _pick_pack_S(ps, R, S):
    """Sublane packing factor k for the s-major train kernel.

    Narrow-MLP matmuls are MXU-starved: a (ps, ps) @ (ps, rows) contraction
    with ps=40 uses 40/128 of the systolic array on BOTH the contraction
    and output-sublane dims (~10% utilization).  Packing k lane-groups of
    rows onto sublanes — activations (ps, rows) -> (k*ps, rows/k), weights
    block-diagonal (k*ps, k*ps) — contracts over k*ps instead (k=3 for
    ps=40: 120/128 = 94%), cutting MXU time ~k-fold at identical math
    (off-diagonal zero blocks produce zeros).  Needs k*ps <= 128 and each
    lane group 128-aligned (R*S % (k*128) == 0)."""
    rows = R * S
    for k in range(128 // ps, 1, -1):
        if rows % (k * 128) == 0:
            return k
    return 1


def _pack_sublanes(x, k):
    """(p, rows) -> (k*p, rows/k): stack k lane-aligned row groups onto
    sublanes (group g occupies sublanes g*p..(g+1)*p-1)."""
    p, rows = x.shape
    rk = rows // k
    return jnp.concatenate(
        [x[:, g * rk:(g + 1) * rk] for g in range(k)], axis=0)


def _unpack_sublanes(x, k, p):
    """Inverse of _pack_sublanes: (k*p, rows/k) -> (p, rows)."""
    return jnp.concatenate(
        [x[g * p:(g + 1) * p, :] for g in range(k)], axis=1)


def _blockdiag_params(w_stack, b_stack, k):
    """Pack the (L, ps, ps) weight stack into block-diagonal
    (L, k*ps, k*ps) and tile biases (ps, L) -> (k*ps, L) for the
    sublane-packed kernels.  Done in XLA once per step (tiny)."""
    L, ps, _ = w_stack.shape
    eye = jnp.eye(k, dtype=w_stack.dtype)
    wp = jnp.einsum("gh,lab->lgahb", eye, w_stack).reshape(
        L, k * ps, k * ps)
    return wp, jnp.tile(b_stack, (k, 1))


def _build_rows_smajor(rays_ref, tl_ref, dl_ref, S, R):
    """(ptsT, distsT) for one (8, R) ray block: sublanes 0-2 of ``rays``
    are origin xyz, 3-5 direction xyz; ``tl_ref``/``dl_ref`` are (1, rows)
    per-ROW depth/step columns (t/dists repeated R times each in XLA — a
    few KB, constant across tiles).  Returns (8, S*R) s-major sample
    points (sublanes 0-2 = xyz, rest zero) and (1, S*R) dists."""
    rows = R * S
    rays = rays_ref[...]
    sub = _sublane_iota(rays.shape)
    o3 = jnp.where(sub < 3, rays, 0.0)
    d3 = jnp.where(sub < 3, pltpu.roll(rays, 5, axis=0), 0.0)
    pts = _tile_lanes(o3, rows) + _tile_lanes(d3, rows) * tl_ref[...]
    return pts, dl_ref[...]


def _nerf_train_kernel_S(
    nrays_ref, tl_ref, dl_ref, rays_ref, w_ref, b_ref, tgt_ref,
    loss_ref, dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
    num_functions, ablate="", pack=1,
):
    """S-major single-pass train kernel: in-kernel point generation +
    forward + sum-MSE + backward.  Same outputs as _nerf_train_kernel_T.

    ``pack`` > 1: sublane-packed MLP (see _pick_pack_S) — w_ref/b_ref
    arrive block-diagonal/tiled; activations run as (pack*ps, rows/pack);
    encode/compositing/loss stay in the unpacked (ps, rows) space."""
    ps = w_ref.shape[1] // pack
    ptsT, distsT = _build_rows_smajor(rays_ref, tl_ref, dl_ref, S, R)
    enc = _encode_T_rec(ptsT, num_functions, ps)

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    if "enc_only" in ablate:  # measure launch+DMA+pointgen+encode floor
        loss_ref[...] += jnp.sum(
            enc[:1, :1] + distsT[:1, :1], axis=0, keepdims=True
        )
        return
    if pack > 1:
        enc = _pack_sublanes(enc, pack)
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt,
                          head_period=ps if pack > 1 else None)
    rgba = (_unpack_sublanes(acts[-1], pack, ps) if pack > 1
            else acts[-1]).astype(jnp.float32)
    if "no_scans" in ablate:  # perf hook: skip the compositing scans
        sigma = rgba[3:4, :].astype(jnp.float32)
        alpha = 1.0 - jnp.exp(-sigma * distsT)
        c = P = T = jnp.ones_like(alpha)
        w = alpha
        comp = (sigma, alpha, c, P, T, w)
        suf = (rgba * w)[:8, :]
    else:
        comp = _composite_fwd_T(rgba, distsT, S, mode, stride=R)
        w = comp[-1]
        suf = pu.seg_suffix_sum_lanes((rgba * w)[:8, :], S, stride=R)
    ray_col = suf[:, :R]  # lanes 0..R-1 are each ray's s == 0 position
    tgt = tgt_ref[...]  # (8, R): per-ray targets, no cross-sample repeat
    sub8 = _sublane_iota(tgt.shape)
    lane = jax.lax.broadcasted_iota(jnp.int32, tgt.shape, 1)
    valid = (sub8 < 3) & (pl.program_id(0) * R + lane < nrays_ref[0, 0])
    diff = jnp.where(valid, ray_col - tgt, 0.0)  # (8, R)

    sq = jnp.sum(diff * diff, axis=1, keepdims=True)  # (8, 1)
    loss_ref[...] += jnp.sum(sq, axis=0, keepdims=True)

    if "no_bwd" in ablate:  # perf-ablation hook: forward+loss only
        return

    # broadcast per-ray cotangents to all samples: doubling lane copies
    dcol8 = _tile_lanes(2.0 * diff, R * S)  # (8, rows)
    h0_fn = None
    if "remat_enc" in ablate:
        # VMEM-liveness experiment: drop acts[0] (the (ps, rows) encoding)
        # after the layer-0 forward matmul; recompute it for dW0 at the
        # end of the backward (2 FMAs + recurrence — near free)
        acts = [None] + acts[1:]

        def h0_fn():
            p2, _ = _build_rows_smajor(rays_ref, tl_ref, dl_ref, S, R)
            e2 = _encode_T_rec(p2, num_functions, ps)
            if pack > 1:
                e2 = _pack_sublanes(e2, pack)
            return e2.astype(cdt)
    _bwd_from_dcol_T(dcol8, acts, rgba, distsT, comp, w_ref, dw_ref, db_ref,
                     L=L, S=S, mode=mode, precision=precision, cdt=cdt,
                     ablate=ablate, stride=R, h0_fn=h0_fn, pack=pack)


@functools.lru_cache(maxsize=None)
def _make_train_fn_S(L, R, S, ps, in_dim, num_functions, mode, highest_prec,
                     compute_dtype, ablate="", pack=1):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    kernel = functools.partial(
        _nerf_train_kernel_S, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt, num_functions=num_functions, ablate=ablate, pack=pack,
    )
    kps = pack * ps  # packed weight/bias width seen by the kernel

    def train_call(w_stack, b_stack, raysT, tgtT, t_row, d_row, n_rays):
        n_tiles = raysT.shape[1] // R
        rows = R * S
        if pack > 1:
            w_stack, b_stack = _blockdiag_params(w_stack, b_stack, pack)
        loss, dw, db = pu.tiled_call(
            kernel, n_tiles,
            in_specs=[
                pu.bspec((1, 1), smem=True),
                pu.bspec((1, rows)),
                pu.bspec((1, rows)),
                pu.bspec((8, R), 1),
                pu.bspec((L, kps, kps)),
                pu.bspec((kps, L)),
                pu.bspec((8, R), 1),
            ],
            out_specs=[pu.bspec((1, 1)), pu.bspec((L, kps, kps)),
                       pu.bspec((kps, L))],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((L, kps, kps), jnp.float32),
                jax.ShapeDtypeStruct((kps, L), jnp.float32),
            ],
        )(n_rays, t_row, d_row, raysT, w_stack.astype(cdt), b_stack, tgtT)
        if pack > 1:
            # fold the packed grads once per STEP in XLA (an in-kernel
            # per-tile fold would lane-slice at ps offsets 2048x per step)
            dwb = dw.reshape(L, pack, ps, pack, ps)
            dw = sum(dwb[:, g, :, g, :] for g in range(pack))
            db = sum(db[g * ps:(g + 1) * ps] for g in range(pack))
        return loss[0, 0], dw, db

    # shared custom_vjp wiring: fused_loss(w, b, raysT, tgtT, t_row, d_row,
    # n_smem) -> loss
    return pu.train_loss_vjp(train_call)


def _nerf_train_loss_T_rays(
    params, origins, directions, t_1d, dists_1d, target, config,
    tile_rays: int, highest_precision, compute_dtype: str, ps: int,
    ablate: str = "",
) -> jnp.ndarray:
    """T-layout train loss from O(N) per-ray inputs (uniform (S,) depths):
    sample points and per-row targets are generated in-kernel (ray-major
    lane order), deleting the O(N*S) XLA prep the (N, S)-depth T path pays
    (5.0 ms = 20% of the 65,536-ray single64 step,
    artifacts/r5_single64_stages.log)."""
    L = len(params["w"])
    S = config.num_samples
    n = origins.shape[0]
    raysT, tgt8, n_pad = _smajor_ray_layout(origins, directions, target,
                                            tile_rays)
    rays3, tgt3 = _ray_tiles(raysT, tile_rays), _ray_tiles(tgt8, tile_rays)
    # ray-major lane l = r*S + s -> depth t[l % S]: one tiled (1, rows) comb
    t_row = jnp.tile(jnp.asarray(t_1d, jnp.float32),
                     tile_rays).reshape(1, tile_rays * S)
    d_row = jnp.tile(jnp.asarray(dists_1d, jnp.float32),
                     tile_rays).reshape(1, tile_rays * S)
    w_stack, b_stack = pu.stack_padded_params_T(params, ps)
    fused = _make_train_fn_T(
        L, tile_rays, S, ps, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype, ablate, True,
    )
    n_smem = jnp.full((1, 1), n, jnp.int32)
    return fused(w_stack, b_stack, rays3, t_row, d_row, tgt3, n_smem)


def _ray_tiles(x8, R: int):
    """(8, n_pad) per-ray array -> (n_tiles, 8, Rp) per-tile blocks with
    lanes padded to 128 (Pallas block rule); O(N) bytes reshaped."""
    Rp = max(pu.round_up(R, 128), 128)
    n_tiles = x8.shape[1] // R
    x3 = x8.reshape(8, n_tiles, R).transpose(1, 0, 2)
    return jnp.pad(x3, ((0, 0), (0, 0), (0, Rp - R)))


def _smajor_ray_layout(origins, directions, target, tile_rays):
    """Per-RAY inputs for the s-major kernels: (8, n_pad) rays (sublanes
    0-2 origin, 3-5 direction) and (8, n_pad) targets.  O(N) bytes — the
    kernel generates the O(N*S) sample rows itself."""
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)))

    raysT = jnp.concatenate(
        [pad_rays(origins.astype(jnp.float32)).T,
         pad_rays(directions.astype(jnp.float32)).T,
         jnp.zeros((2, n_pad), jnp.float32)], axis=0)
    tgtT = None
    if target is not None:
        tgtT = jnp.pad(pad_rays(target.astype(jnp.float32)).T,
                       ((0, 5), (0, 0)))
    return raysT, tgtT, n_pad


def _nerf_train_loss_S(
    params, origins, directions, t_1d, dists_1d, target, config,
    tile_rays: int, highest_precision: bool, compute_dtype: str, ps: int,
    ablate: str = "",
) -> jnp.ndarray:
    L = len(params["w"])
    S = config.num_samples
    n = origins.shape[0]
    raysT, tgtT, _ = _smajor_ray_layout(origins, directions, target,
                                        tile_rays)
    # per-ROW (1, rows) depth columns (s-major: row = s*R + r -> t[row//R]);
    # tiny and constant across tiles, so the kernel pays no per-sample
    # scalar unrolling (compile time) and no broadcast scans (run time)
    t_row = jnp.repeat(jnp.asarray(t_1d, jnp.float32),
                       tile_rays).reshape(1, tile_rays * S)
    d_row = jnp.repeat(jnp.asarray(dists_1d, jnp.float32),
                       tile_rays).reshape(1, tile_rays * S)
    w_stack, b_stack = pu.stack_padded_params_T(params, ps)
    # "packmlp" opts into the sublane-packed MLP (_pick_pack_S) — measured
    # SLOWER on v5e despite 3x the MXU contraction occupancy (the narrow
    # matmuls are data-streaming-bound, not pass-bound; PERF.md round 4,
    # artifacts/r4_pack_ab2.log), so unpacked is the default
    pack = _pick_pack_S(ps, tile_rays, S) if "packmlp" in ablate else 1
    fused = _make_train_fn_S(
        L, tile_rays, S, ps, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype, ablate, pack,
    )
    n_smem = jnp.full((1, 1), n, jnp.int32)
    return fused(w_stack, b_stack, raysT, tgtT, t_row, d_row, n_smem)


def _nerf_forward_kernel_S(
    tl_ref, dl_ref, rays_ref, w_ref, b_ref, out_ref,
    *, L, R, S, mode, precision, cdt, num_functions,
):
    """S-major render forward: writes each ray's color directly as an
    (8, R) per-ray block (sublanes 0..2) — no O(N*S) output, no XLA-side
    every-S-th-lane gather."""
    ptsT, distsT = _build_rows_smajor(rays_ref, tl_ref, dl_ref, S, R)
    enc = _encode_T_rec(ptsT, num_functions, w_ref.shape[1])
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    w = _composite_fwd_T(rgba, distsT, S, mode, stride=R)[-1]
    suf = pu.seg_suffix_sum_lanes((rgba * w)[:8, :], S, stride=R)
    out_ref[...] = suf[:, :R]


def _nerf_backward_kernel_S(
    tl_ref, dl_ref, rays_ref, w_ref, b_ref, dcol_ref, dw_ref, db_ref,
    *, L, R, S, mode, precision, cdt, num_functions,
):
    """S-major remat backward for the render path; dcol is the (8, R)
    per-ray color cotangent block (broadcast across samples in-kernel)."""
    ptsT, distsT = _build_rows_smajor(rays_ref, tl_ref, dl_ref, S, R)
    enc = _encode_T_rec(ptsT, num_functions, w_ref.shape[1])
    acts = _mlp_forward_T(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    comp = _composite_fwd_T(rgba, distsT, S, mode, stride=R)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    dcol8 = _tile_lanes(dcol_ref[...], R * S)
    _bwd_from_dcol_T(dcol8, acts, rgba, distsT, comp, w_ref, dw_ref, db_ref,
                     L=L, S=S, mode=mode, precision=precision, cdt=cdt,
                     stride=R)


@functools.lru_cache(maxsize=None)
def _make_render_fns_S(L, R, S, ps, in_dim, num_functions, mode,
                       highest_prec, compute_dtype="float32"):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    fwd_kernel = functools.partial(
        _nerf_forward_kernel_S, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt, num_functions=num_functions,
    )
    bwd_kernel = functools.partial(
        _nerf_backward_kernel_S, L=L, R=R, S=S, mode=mode,
        precision=precision, cdt=cdt, num_functions=num_functions,
    )

    def common_in_specs():
        rows = R * S
        return [
            pu.bspec((1, rows)),
            pu.bspec((1, rows)),
            pu.bspec((8, R), 1),
            pu.bspec((L, ps, ps)),
            pu.bspec((ps, L)),
        ]

    def forward(w_stack, b_stack, raysT, t_row, d_row):
        return pu.tiled_call(
            fwd_kernel, raysT.shape[1] // R,
            in_specs=common_in_specs(),
            out_specs=pu.bspec((8, R), 1),
            out_shape=jax.ShapeDtypeStruct((8, raysT.shape[1]), jnp.float32),
        )(t_row, d_row, raysT, w_stack.astype(cdt), b_stack)

    def backward(w_stack, b_stack, raysT, t_row, d_row, dcolT):
        return pu.tiled_call(
            bwd_kernel, raysT.shape[1] // R,
            in_specs=common_in_specs() + [pu.bspec((8, R), 1)],
            out_specs=[pu.bspec((L, ps, ps)), pu.bspec((ps, L))],
            out_shape=[
                jax.ShapeDtypeStruct((L, ps, ps), jnp.float32),
                jax.ShapeDtypeStruct((ps, L), jnp.float32),
            ],
        )(t_row, d_row, raysT, w_stack.astype(cdt), b_stack, dcolT)

    def dcol(d_out):
        # only sublanes 0..2 (rgb) of the per-ray output are real
        sub = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 0)
        return jnp.where(sub < 3, d_out, 0.0)

    return pu.render_vjp(forward, backward, dcol)


def _pick_tile_S(S, ps, L, itemsize, n_bufs=6,
                 vmem_budget=6 * 1024 * 1024) -> int:
    """Ray tile for the s-major kernels: R is a multiple of 128 (sample
    blocks concatenate at vreg-aligned lane offsets), grown while the
    conservative VMEM model fits.  Returns 0 when even R=128 does not.

    The L activation buffers live in the compute dtype, but the n_bufs
    compositing/scan temporaries (sigma/alpha/c/P/T/w, suffix sums) are
    fp32 regardless — account them at 4 bytes so a bf16 run cannot pick a
    tile the fp32 sweep already showed fails Mosaic compile
    (artifacts/r3_tile_sweep.log)."""
    R = 128

    def est(r):
        return r * S * ps * (itemsize * L + 4 * n_bufs)

    if est(R) > vmem_budget:
        return 0
    while R < 1024 and est(R * 2) <= vmem_budget:
        R *= 2
    return R


# ---------------------------------------------------------------------------
# s-major ROW-MAJOR kernels (wide MLPs, uniform ray depths): the same
# in-kernel point generation for the lanes-full configs.  Rows within a tile
# are ordered s*R + r; sample blocks stack as SUBLANE-aligned (R, 8) copies
# of the per-ray block (R is a sublane multiple), the per-ray selector
# becomes row % R, and the (rows, 1) sublane scans roll by multiples of R.
# Removes the pk packed-layout XLA prep (2.85 ms per 16k-ray flagship
# batch; ~110 ms of relayout per 800x800 frame — artifacts/r3_prep_full.log)
# and shrinks ray HBM traffic from 32 B/row to 32 B/ray.
# ---------------------------------------------------------------------------


def _tile_sublanes(x, rows):
    """Concatenate copies of ``x`` along sublanes (doubling — ceil(log2)
    concats; compile time matters at S=128) and slice to ``rows``."""
    while x.shape[0] < rows:
        x = jnp.concatenate([x, x], axis=0)
    return x[:rows]


def _build_rows_smajor_rm(rays_ref, tc_ref, dc_ref, S, R):
    """(rows, 8) s-major sample points + (rows, 1) dists from an (R, 8)
    per-ray block (lanes 0-2 = origin xyz, 3-5 = direction xyz);
    ``tc_ref``/``dc_ref`` are (rows, 1) per-row depth/step columns
    (repeated in XLA, constant across tiles)."""
    rows = R * S
    rays = rays_ref[...]
    lane = _lane_iota(rays.shape)
    o3 = jnp.where(lane < 3, rays, 0.0)
    d3 = jnp.where(lane < 3, pltpu.roll(rays, 5, axis=1), 0.0)
    pts = _tile_sublanes(o3, rows) + _tile_sublanes(d3, rows) * tc_ref[...]
    return pts, dc_ref[...]


def _encode_rm(pts8, E_ref, m_ref, precision):
    """(rows, PW) encoding of generated (rows, 8) points (lanes 3-7 zero;
    E's rows >= 3 are zero, so they contribute nothing)."""
    P = _dot(pts8, E_ref[...], precision)
    return m_ref[0:1, :] * P + m_ref[1:2, :] * jnp.sin(P + m_ref[2:3, :])


def _nerf_train_kernel_W(
    nrays_ref, tc_ref, dc_ref, rays_ref, E_ref, m_ref, w_ref, b_ref, tgt_ref,
    loss_ref, dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
):
    """s-major single-pass train kernel for wide MLPs (row-major layout)."""
    pts8, dists = _build_rows_smajor_rm(rays_ref, tc_ref, dc_ref, S, R)
    enc = _encode_rm(pts8, E_ref, m_ref, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    comp = _composite_fwd(rgba, dists, S, mode, stride=R)
    w = comp[-1]
    pw = rgba.shape[1]

    sel = _ray_selector(R * S, R, S, smajor=True)
    pred = _dot_tt(sel, rgba * w, precision)  # (R, pw)
    tgt = tgt_ref[...]  # (R, 128); lanes 0..2 real
    if pw > 128:
        tgt = jnp.pad(tgt, ((0, 0), (0, pw - 128)))
    lane_r = _lane_iota(pred.shape)
    ray_idx = pl.program_id(0) * R + jax.lax.broadcasted_iota(
        jnp.int32, pred.shape, 0
    )
    mask = jnp.where((lane_r < 3) & (ray_idx < nrays_ref[0, 0]), 1.0, 0.0)
    diff = (pred - tgt) * mask

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    sq = jnp.sum(diff * diff, axis=1, keepdims=True)  # (R, 1)
    loss_ref[...] += jnp.sum(sq, axis=0, keepdims=True)  # (1, 1)
    _bwd_from_dcol(2.0 * diff, acts, rgba, dists, comp, w_ref, dw_ref,
                   db_ref, L=L, R=R, S=S, mode=mode, precision=precision,
                   cdt=cdt, stride=R)


def _nerf_forward_kernel_W(
    tc_ref, dc_ref, rays_ref, E_ref, m_ref, w_ref, b_ref, out_ref,
    *, L, R, S, mode, precision, cdt, ablate="",
):
    pts8, dists = _build_rows_smajor_rm(rays_ref, tc_ref, dc_ref, S, R)
    enc = _encode_rm(pts8, E_ref, m_ref, precision)
    if "enc_only" in ablate:  # stage floor: launch+DMA+pointgen+encode
        out_ref[...] = enc[:R, :128] + dists[:R, :1]
        return
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    if "no_comp" in ablate:  # stage: + MLP forward only
        out_ref[...] = rgba[:R, :128] + dists[:R, :1]
        return
    w = _composite_fwd(rgba, dists, S, mode, stride=R)[-1]
    if "no_sel" in ablate:  # stage: + compositing, skip ray reduction
        out_ref[...] = (rgba * w)[:R, :128]
        return
    sel = _ray_selector(R * S, R, S, smajor=True)
    out_ref[...] = _dot_tt(sel, rgba * w, precision)[:, :128]


def _nerf_backward_kernel_W(
    tc_ref, dc_ref, rays_ref, E_ref, m_ref, w_ref, b_ref, dcol_ref,
    dw_ref, db_ref, *, L, R, S, mode, precision, cdt,
):
    pts8, dists = _build_rows_smajor_rm(rays_ref, tc_ref, dc_ref, S, R)
    enc = _encode_rm(pts8, E_ref, m_ref, precision)
    acts = _mlp_forward(enc, w_ref, b_ref, L, precision, cdt)
    rgba = acts[-1].astype(jnp.float32)
    comp = _composite_fwd(rgba, dists, S, mode, stride=R)
    pw = rgba.shape[1]

    dcol = dcol_ref[...]  # (R, 128); only lanes 0..2 nonzero
    if pw > 128:
        dcol = jnp.pad(dcol, ((0, 0), (0, pw - 128)))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    _bwd_from_dcol(dcol, acts, rgba, dists, comp, w_ref, dw_ref, db_ref,
                   L=L, R=R, S=S, mode=mode, precision=precision, cdt=cdt,
                   stride=R)


def _rm_smajor_ray_layout(origins, directions, tile_rays):
    """(n_pad, 8) per-ray block for the wide s-major kernels: lanes 0-2 =
    origin, 3-5 = direction.  Built by one lane-dim concatenate — no
    transpose, no per-sample rows."""
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)))

    rays_rm = jnp.concatenate(
        [pad_rays(origins.astype(jnp.float32)),
         pad_rays(directions.astype(jnp.float32)),
         jnp.zeros((n_pad, 2), jnp.float32)], axis=1)
    return rays_rm, n_pad, pad_rays


@functools.lru_cache(maxsize=None)
def _make_train_fn_W(L, R, S, pw, in_dim, num_functions, mode, highest_prec,
                     compute_dtype):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_pk(in_dim, num_functions, pw)
    kernel = functools.partial(
        _nerf_train_kernel_W, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt,
    )

    def train_call(w_stack, b_stack, rays_rm, tgt_pad, t_row, d_row, n_rays):
        n_tiles = rays_rm.shape[0] // R
        rows = R * S
        loss, dw, db = pu.tiled_call(
            kernel, n_tiles,
            in_specs=[
                pu.bspec((1, 1), smem=True),
                pu.bspec((rows, 1)),
                pu.bspec((rows, 1)),
                pu.bspec((R, 8), 0),
                pu.bspec((8, pw)),
                pu.bspec((3, pw)),
                pu.bspec((L, pw, pw)),
                pu.bspec((L, pw)),
                pu.bspec((R, 128), 0),
            ],
            out_specs=[pu.bspec((1, 1)), pu.bspec((L, pw, pw)),
                       pu.bspec((L, pw))],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
        )(n_rays, t_row, d_row, rays_rm, jnp.asarray(E_np),
          jnp.asarray(m_np), w_stack.astype(cdt), b_stack, tgt_pad)
        return loss[0, 0], dw, db

    # shared custom_vjp wiring: fused_loss(w, b, rays_rm, tgt_pad, t_row,
    # d_row, n_smem) -> loss
    return pu.train_loss_vjp(train_call)


def _nerf_train_loss_W(
    params, origins, directions, t_1d, dists_1d, target, config,
    tile_rays: int, highest_precision: bool, compute_dtype: str, pw: int,
) -> jnp.ndarray:
    L = len(params["w"])
    S = config.num_samples
    n = origins.shape[0]
    rays_rm, n_pad, pad_rays = _rm_smajor_ray_layout(origins, directions,
                                                     tile_rays)
    tgt = pad_rays(target.astype(jnp.float32))
    tgt_pad = jnp.pad(tgt, ((0, 0), (0, 128 - tgt.shape[1])))
    # per-row (rows, 1) depth columns (row = s*R + r -> t[row // R])
    t_row = jnp.repeat(jnp.asarray(t_1d, jnp.float32),
                       tile_rays).reshape(tile_rays * S, 1)
    d_row = jnp.repeat(jnp.asarray(dists_1d, jnp.float32),
                       tile_rays).reshape(tile_rays * S, 1)
    w_stack, b_stack = pu.stack_padded_params(params, pw)
    fused = _make_train_fn_W(
        L, tile_rays, S, pw, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype,
    )
    n_smem = jnp.full((1, 1), n, jnp.int32)
    return fused(w_stack, b_stack, rays_rm, tgt_pad, t_row, d_row, n_smem)


@functools.lru_cache(maxsize=None)
def _make_render_fns_W(L, R, S, pw, in_dim, num_functions, mode,
                       highest_prec, compute_dtype="float32", ablate=""):
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_pk(in_dim, num_functions, pw)
    fwd_kernel = functools.partial(
        _nerf_forward_kernel_W, L=L, R=R, S=S, mode=mode,
        precision=precision, cdt=cdt, ablate=ablate,
    )
    bwd_kernel = functools.partial(
        _nerf_backward_kernel_W, L=L, R=R, S=S, mode=mode,
        precision=precision, cdt=cdt,
    )

    def common_in_specs():
        rows = R * S
        return [
            pu.bspec((rows, 1)),
            pu.bspec((rows, 1)),
            pu.bspec((R, 8), 0),
            pu.bspec((8, pw)),
            pu.bspec((3, pw)),
            pu.bspec((L, pw, pw)),
            pu.bspec((L, pw)),
        ]

    def forward(w_stack, b_stack, rays_rm, t_row, d_row):
        return pu.tiled_call(
            fwd_kernel, rays_rm.shape[0] // R,
            in_specs=common_in_specs(),
            out_specs=pu.bspec((R, 128), 0),
            out_shape=jax.ShapeDtypeStruct((rays_rm.shape[0], 128),
                                           jnp.float32),
        )(t_row, d_row, rays_rm, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack)

    def backward(w_stack, b_stack, rays_rm, t_row, d_row, dcol):
        return pu.tiled_call(
            bwd_kernel, rays_rm.shape[0] // R,
            in_specs=common_in_specs() + [pu.bspec((R, 128), 0)],
            out_specs=[pu.bspec((L, pw, pw)), pu.bspec((L, pw))],
            out_shape=[
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
        )(t_row, d_row, rays_rm, jnp.asarray(E_np), jnp.asarray(m_np),
          w_stack.astype(cdt), b_stack, dcol)

    def dcol_fn(d_out):
        lane = jax.lax.broadcasted_iota(jnp.int32, d_out.shape, 1)
        return jnp.where(lane < 3, d_out, 0.0)

    return pu.render_vjp(forward, backward, dcol_fn)


@functools.lru_cache(maxsize=None)
def _make_train_fn(L, R, S, pw, in_dim, num_functions, mode, highest_prec,
                   compute_dtype):
    """Fused loss+grad: loss(w, b, pts, dists, targets) as a custom_vjp whose
    forward pass ALSO produces dW/db (one kernel launch per train step)."""
    precision = pu.resolve_precision(highest_prec)
    cdt = jnp.dtype(compute_dtype)
    E_np, m_np = pu.build_encoding_consts_pk(in_dim, num_functions, pw)
    dsel_np = np.zeros((8, 128), np.float32)
    dsel_np[3, 0] = 1.0
    kernel = functools.partial(
        _nerf_train_kernel, L=L, R=R, S=S, mode=mode, precision=precision,
        cdt=cdt,
    )
    rows = R * S

    def train_call(w_stack, b_stack, pk, tgt_pad, n_rays):
        n_tiles = pk.shape[1] // rows
        loss, dw, db = pu.tiled_call(
            kernel, n_tiles,
            in_specs=[
                pu.bspec((1, 1), smem=True),
                pu.bspec((8, rows), 1),
                pu.bspec((8, 128)),
                pu.bspec((8, pw)),
                pu.bspec((3, pw)),
                pu.bspec((L, pw, pw)),
                pu.bspec((L, pw)),
                pu.bspec((R, 128), 0),
            ],
            out_specs=[pu.bspec((1, 1)), pu.bspec((L, pw, pw)),
                       pu.bspec((L, pw))],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((L, pw, pw), jnp.float32),
                jax.ShapeDtypeStruct((L, pw), jnp.float32),
            ],
        )(n_rays, pk, jnp.asarray(dsel_np), jnp.asarray(E_np),
          jnp.asarray(m_np), w_stack.astype(cdt), b_stack, tgt_pad)
        return loss[0, 0], dw, db

    # shared custom_vjp wiring: fused_loss(w, b, pk, tgt_pad, n_smem)
    return pu.train_loss_vjp(train_call)


def _pick_tile_T(S, ps, L, itemsize, n_bufs=6,
                 vmem_budget=6 * 1024 * 1024) -> int:
    """Ray tile for the transposed kernels: smallest tile whose lane dim
    (rows = R*S) is 128-aligned, then grown while the conservative VMEM
    model fits (Mosaic's real live set measured ~2x the bare activation
    estimate on v5e, so the budget stays well under the ~16 MB physical).
    Returns 0 when even the smallest aligned tile does not fit."""
    R_T = 8
    while (R_T * S) % 128:
        R_T += 8

    def est(r):
        return r * S * ps * itemsize * (L + n_bufs)

    while R_T < 1024 and est(R_T * 2) <= vmem_budget:
        R_T *= 2
    return R_T if est(R_T) <= vmem_budget else 0


def _packed_ray_layout(origins, directions, t_vals, dists, S, tile_rays):
    """(8, n_pad*S) packed ray block for the row-major kernels: sublanes
    0-2 = xyz sample points, sublane 3 = dists, 4-7 zero.

    The minor (lane) dim is the row count, so HBM stores ~8x the logical
    ray bytes instead of the 42x/128x the old (rows, 3) / (rows, 1) layouts
    paid to TPU (8, 128) tiling — the difference between a 640k-ray
    flagship render fitting comfortably and exceeding HBM (16.06 GB > 15.75
    measured on v5e)."""
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    oT = pad_rays(origins.astype(jnp.float32)).T  # (3, n_pad)
    dT = pad_rays(directions.astype(jnp.float32)).T
    t = pad_rays(t_vals.astype(jnp.float32))  # (n_pad, S)
    pts3 = oT[:, :, None] + dT[:, :, None] * t[None, :, :]  # (3, n_pad, S)
    dist1 = pad_rays(dists.astype(jnp.float32))[None]  # (1, n_pad, S)
    pk = jnp.concatenate([pts3, dist1], axis=0)  # (4, n_pad, S)
    pk = jnp.pad(pk, ((0, 4), (0, 0), (0, 0))).reshape(8, n_pad * S)
    return pk, n_pad, pad_rays


def _transposed_ray_layout(origins, directions, t_vals, dists, S, tile_rays):
    """Pad rays to the tile, build (8, rows) pts^T and (1, rows) dists^T.

    pts^T is CONSTRUCTED directly in the transposed layout: only the tiny
    (n, 3) ray arrays are transposed, and the (3, n_pad, S) sample tensor
    collapses its minor dims for free.  The previous formulation computed
    (n_pad*S, 3) points and minor-dim-3-transposed the O(N*S) result —
    measured at 7.1 ms of the 26 ms single64 step (94 MB / 11.4 ms at the
    parity shape, artifacts/r3_prep_ablate.log class)."""
    n = origins.shape[0]
    n_pad = pu.round_up(max(n, tile_rays), tile_rays)

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    o_t = pad_rays(origins.astype(jnp.float32)).T  # (3, n_pad): tiny
    d_t = pad_rays(directions.astype(jnp.float32)).T
    t = pad_rays(t_vals.astype(jnp.float32))  # (n_pad, S)
    ptsT = (
        o_t[:, :, None] + d_t[:, :, None] * t[None, :, :]
    ).reshape(3, n_pad * S)  # lane r*S + s — the T order, built in place
    ptsT = jnp.pad(ptsT, ((0, 5), (0, 0)))  # (8, rows)
    distsT = pad_rays(dists.astype(jnp.float32)).reshape(1, n_pad * S)
    return ptsT, distsT, n_pad, pad_rays


def nerf_train_loss(
    params, origins, directions, t_vals, dists, target, config,
    tile_rays: int = 0, highest_precision: bool = True,
    compute_dtype: str = "",
) -> jnp.ndarray:
    """Sum-MSE train loss whose VJP comes from the single fused train
    kernel (forward + compositing + backward in one pass, activations never
    leaving VMEM).  Differentiable w.r.t. ``params`` ONLY — the ray inputs
    (origins/directions/t_vals/dists/target) are stop_gradient'ed here, so
    differentiating w.r.t. them yields zeros by the documented stop-gradient
    semantics rather than by a silent kernel omission (pose/camera
    refinement needs the jnp path).  Use under ``jax.value_and_grad`` /
    ``jax.vjp``; the adjoint seed (the reference's loss-valued ``_dreturn``,
    train_nerf.py:477) is the VJP cotangent."""
    sg = jax.lax.stop_gradient
    origins, directions, t_vals, dists, target = (
        sg(origins), sg(directions), sg(t_vals), sg(dists), sg(target)
    )
    L = len(params["w"])
    S = config.num_samples
    if not compute_dtype:
        compute_dtype = getattr(config, "compute_dtype", "float32")
    if compute_dtype == "bfloat16":
        highest_precision = False
    elif highest_precision is True:
        # default True defers to the config's precision tier
        highest_precision = getattr(config, "precision", "highest")
    widths = [config.in_channels] + [w.shape[1] for w in params["w"]]
    # narrow MLPs dispatch to the transposed layout (features on sublanes:
    # ~3x less VPU elementwise work, 16x cheaper compositing scans) when the
    # tile fits VMEM; wide configs keep the row-major layout (lanes full)
    ps = pu.round_up(max(max(widths), 8), 8)
    itemsize = 2 if compute_dtype == "bfloat16" else 4
    # per-ray-uniform depths ((S,) t_vals/dists, the unjittered
    # sample_along_rays contract) enable the s-major kernels: points are
    # generated in-kernel from O(N) per-ray inputs instead of prepared by
    # XLA as O(N*S) transposed rows (15.5 ms of the 45.8 ms parity step —
    # artifacts/r3_prep_ablate.log)
    uniform = t_vals.ndim == 1 and dists.ndim == 1
    if ps <= 64 and tile_rays == 0 and uniform:
        R_S = _pick_tile_S(S, ps, L, itemsize, n_bufs=6)
        if R_S:
            return _nerf_train_loss_S(
                params, origins, directions, t_vals, dists, target, config,
                R_S, highest_precision, compute_dtype, ps,
            )
        # s-major tile doesn't fit (e.g. single64: S=64, ps=64 — VMEM
        # proof in artifacts/r4_single64_smajor.log) but depths are still
        # uniform: the T kernel's from_rays variant keeps O(N) inputs +
        # in-kernel point generation in ray-major lane order.  The VMEM
        # model charges the resident (128, R*S) fp32 selector matrix as
        # extra ps-width buffers; the budget is raised to 7.5 MB, anchored
        # to the measured R=32 single64 compile+run (PERF.md round 5).
        sel_bufs = -(-128 * 4 // (ps * itemsize))
        R_T = _pick_tile_T(S, ps, L, itemsize, n_bufs=6 + sel_bufs,
                           vmem_budget=int(7.5 * 1024 * 1024))
        if R_T:
            return _nerf_train_loss_T_rays(
                params, origins, directions, t_vals, dists, target, config,
                R_T, highest_precision, compute_dtype, ps,
            )
    if ps > 64 and tile_rays == 0 and uniform:
        # wide MLPs: the s-major row-major kernel (in-kernel point
        # generation; no pk packed-layout prep)
        pw = pu.round_up(max(widths + [128]), 128)
        R_W = pu.pick_tile_rays(S, pw, n_live_buffers=L + 5,
                                itemsize=itemsize)
        return _nerf_train_loss_W(
            params, origins, directions, t_vals, dists, target, config,
            R_W, highest_precision, compute_dtype, pw,
        )
    if uniform:  # older layouts take per-ray (N, S) depth arrays
        n0 = origins.shape[0]
        t_vals = jnp.broadcast_to(t_vals, (n0, S))
        dists = jnp.broadcast_to(dists, (n0, S))
    if ps <= 64 and tile_rays == 0:
        R_T = _pick_tile_T(S, ps, L, itemsize, n_bufs=6)
        if R_T:
            return _nerf_train_loss_T(
                params, origins, directions, t_vals, dists, target, config,
                R_T, highest_precision, compute_dtype, ps,
            )
    pw = pu.round_up(max(widths + [128]), 128)
    if not tile_rays:
        tile_rays = pu.pick_tile_rays(S, pw, n_live_buffers=L + 5,
                                      itemsize=itemsize)
    n = origins.shape[0]
    pk, n_pad, pad_rays = _packed_ray_layout(
        origins, directions, t_vals, dists, S, tile_rays
    )
    tgt = pad_rays(target.astype(jnp.float32))
    tgt_pad = jnp.pad(tgt, ((0, 0), (0, 128 - tgt.shape[1])))

    w_stack, b_stack = pu.stack_padded_params(params, pw)
    fused = _make_train_fn(
        L, tile_rays, S, pw, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype,
    )
    n_smem = jnp.full((1, 1), n, jnp.int32)
    return fused(w_stack, b_stack, pk, tgt_pad, n_smem)


def render_rays(
    params, origins, directions, t_vals, dists, config,
    tile_rays: int = 0, highest_precision: bool = True,
    compute_dtype: str = "", kw_ablate: str = "",
) -> jnp.ndarray:
    """Fused render: (N,3) colors from rays.  Differentiable w.r.t. params
    ONLY — ray inputs are stop_gradient'ed (training optimizes params; use
    the jnp path for pose/camera refinement).

    ``compute_dtype="bfloat16"`` runs matmuls/activations in bf16 with fp32
    accumulation and compositing — the production mode for MXU-bound wide
    configs; fp32 (optionally HIGHEST precision) is the parity mode.
    """
    sg = jax.lax.stop_gradient
    origins, directions, t_vals, dists = (
        sg(origins), sg(directions), sg(t_vals), sg(dists)
    )
    L = len(params["w"])
    S = config.num_samples
    if not compute_dtype:
        compute_dtype = getattr(config, "compute_dtype", "float32")
    if compute_dtype == "bfloat16":
        # fp32 contract precision on bf16 operands is invalid in Mosaic
        # ("Bad lhs type"); bf16 is single-pass by definition
        highest_precision = False
    widths = [config.in_channels] + [w.shape[1] for w in params["w"]]
    ps = pu.round_up(max(max(widths), 8), 8)
    itemsize = 2 if compute_dtype == "bfloat16" else 4
    uniform = t_vals.ndim == 1 and dists.ndim == 1
    if ps <= 64 and tile_rays == 0 and not kw_ablate and uniform:
        # s-major: in-kernel point generation from O(N) per-ray inputs,
        # per-ray (8, n_pad) output (no every-S-th-lane gather)
        R_S = _pick_tile_S(S, ps, L, itemsize, n_bufs=5)
        if R_S:
            n = origins.shape[0]
            raysT, _, _ = _smajor_ray_layout(origins, directions, None, R_S)
            t_row = jnp.repeat(jnp.asarray(t_vals, jnp.float32),
                               R_S).reshape(1, R_S * S)
            d_row = jnp.repeat(jnp.asarray(dists, jnp.float32),
                               R_S).reshape(1, R_S * S)
            w_stack, b_stack = pu.stack_padded_params_T(params, ps)
            render = _make_render_fns_S(
                L, R_S, S, ps, 3, config.num_encoding_functions,
                config.mode, highest_precision, compute_dtype,
            )
            out8 = render(w_stack, b_stack, raysT, t_row, d_row)
            return out8[:3, :n].T
        # s-major tile misses VMEM (e.g. single64): the T render's
        # from_rays variant keeps O(N) inputs/outputs with in-kernel
        # point generation and s==0 color gather (selector matrix charged
        # as extra buffers — see the train dispatch)
        sel_bufs = -(-128 * 4 // (ps * itemsize))
        R_T = _pick_tile_T(S, ps, L, itemsize, n_bufs=5 + sel_bufs,
                           vmem_budget=int(7.5 * 1024 * 1024))
        if R_T:
            n = origins.shape[0]
            raysT, _, n_pad = _smajor_ray_layout(origins, directions, None,
                                                 R_T)
            rays3 = _ray_tiles(raysT, R_T)
            t_row = jnp.tile(jnp.asarray(t_vals, jnp.float32),
                             R_T).reshape(1, R_T * S)
            d_row = jnp.tile(jnp.asarray(dists, jnp.float32),
                             R_T).reshape(1, R_T * S)
            w_stack, b_stack = pu.stack_padded_params_T(params, ps)
            render = _make_render_fns_T(
                L, R_T, S, ps, 3, config.num_encoding_functions,
                config.mode, highest_precision, compute_dtype, True,
            )
            out3 = render(w_stack, b_stack, rays3, t_row, d_row)
            return out3[:, :3, :R_T].transpose(0, 2, 1).reshape(-1, 3)[:n]
    if ps > 64 and tile_rays == 0 and not kw_ablate and uniform:
        # wide MLPs: s-major row-major render (in-kernel point generation)
        pw = pu.round_up(max(widths + [128]), 128)
        R_W = pu.pick_tile_rays(S, pw, n_live_buffers=L + 4,
                                itemsize=itemsize)
        n = origins.shape[0]
        rays_rm, _, _ = _rm_smajor_ray_layout(origins, directions, R_W)
        t_row = jnp.repeat(jnp.asarray(t_vals, jnp.float32),
                           R_W).reshape(R_W * S, 1)
        d_row = jnp.repeat(jnp.asarray(dists, jnp.float32),
                           R_W).reshape(R_W * S, 1)
        w_stack, b_stack = pu.stack_padded_params(params, pw)
        render = _make_render_fns_W(
            L, R_W, S, pw, 3, config.num_encoding_functions, config.mode,
            highest_precision, compute_dtype,
        )
        out = render(w_stack, b_stack, rays_rm, t_row, d_row)
        return out[:n, :3]
    if uniform:  # older layouts take per-ray (N, S) depth arrays
        n0 = origins.shape[0]
        t_vals = jnp.broadcast_to(t_vals, (n0, S))
        dists = jnp.broadcast_to(dists, (n0, S))
    if ps <= 64 and tile_rays == 0 and not kw_ablate:
        # narrow MLPs: transposed layout (features on sublanes) — same
        # structural win as the train kernel (PERF.md "transposed layout")
        R_T = _pick_tile_T(S, ps, L, itemsize, n_bufs=5)
        if R_T:
            n = origins.shape[0]
            ptsT, distsT, n_pad, _ = _transposed_ray_layout(
                origins, directions, t_vals, dists, S, R_T
            )
            w_stack, b_stack = pu.stack_padded_params_T(params, ps)
            render = _make_render_fns_T(
                L, R_T, S, ps, 3, config.num_encoding_functions,
                config.mode, highest_precision, compute_dtype,
            )
            out8 = render(w_stack, b_stack, ptsT, distsT)  # (8, n_pad*S)
            colors = out8[:3].reshape(3, n_pad, S)[..., 0].T
            return colors[:n]
    pw = pu.round_up(max(widths + [128]), 128)
    if not tile_rays:
        tile_rays = pu.pick_tile_rays(S, pw, n_live_buffers=L + 4,
                                      itemsize=itemsize)
    n = origins.shape[0]
    # sample points computed by XLA in the packed (8, rows) layout (32 B/row
    # of HBM; keeps the kernel free of cross-sample sublane broadcasts)
    pk, n_pad, _ = _packed_ray_layout(
        origins, directions, t_vals, dists, S, tile_rays
    )

    w_stack, b_stack = pu.stack_padded_params(params, pw)
    render = _make_render_fns(
        L, tile_rays, S, pw, 3, config.num_encoding_functions, config.mode,
        highest_precision, compute_dtype, kw_ablate,
    )
    out = render(w_stack, b_stack, pk)
    return out[:n, :3]


def nerf_loss(params, origins, directions, t_vals, dists, target, config,
              **kw) -> jnp.ndarray:
    from lomanerf_tpu.core.losses import sum_mse

    pred = render_rays(params, origins, directions, t_vals, dists, config, **kw)
    return sum_mse(pred, target)
