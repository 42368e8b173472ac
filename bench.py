"""Headline benchmark: NeRF train-step rays/sec on one chip (fwd+bwd).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline = the reference loma CPU implementation (gcc -O2, serial C) running
the same parity workload (30 samples/ray, MLP 33->30->30->4, fwd+grad per
chunk of 4 rays).  Measured live when /root/reference + gcc are present
(~391 rays/s on this host); otherwise the recorded measured constant is used.  The
reference publishes no numbers of its own (BASELINE.md).

``--task fit`` benchmarks the 2D image-fit train step instead (BASELINE
configs 1-2): pixels/s fwd+bwd, baseline = the loma CPU mlp_fit fwd+grad
loop over 256-px chunks (fit_img.py:423-431).
"""

from __future__ import annotations

import argparse
import json
import time

# Recorded loma CPU oracle throughputs on this machine, anchored to
# completed --live-baseline runs (the earlier 350 round-1 estimate
# UNDERSTATED the reference and inflated vs_baseline): 392.9 rays/s
# (artifacts/r4_baseline_strat.log) and 389.2 rays/s (r4_ladder.log,
# parity 10.224 M at 26266x).
LOMA_CPU_RAYS_PER_S = 391.0
# measured live (cached oracle, fwd+grad over 256-px chunks): the round-1
# guess of 11,000 UNDERSTATED the reference 2.7x
LOMA_CPU_FIT_PX_PER_S = 29800.0
# forward-only (render/eval path) oracle throughput; the reference's eval
# loop calls only the forward kernel.  Measured live (2,112 rays/s on the
# parity-shape kernel — the reference's loma kernels are compile-time
# capped at 3 layers x 32 wide, so the flagship 8x256 MLP is not even
# expressible there; this baseline is the closest runnable analog).
LOMA_CPU_RENDER_RAYS_PER_S = 2100.0

PARITY_SAMPLES = 30
PARITY_LAYERS = [(33, 30), (30, 30), (30, 4)]
FIT_LAYERS = [(22, 16), (16, 16), (16, 3)]


def emit(metric: str, value: float, unit: str, const_baseline: float,
         live_baseline=None, **extra) -> None:
    """Print the one-line JSON result.

    ``vs_baseline`` is the headline multiplier: against the LIVE-measured
    loma CPU oracle when ``--live-baseline`` ran, else the recorded
    constant.  Both denominators are always self-described in the line
    (``vs_baseline_const`` + ``baseline_live`` when measured) so readers
    comparing BENCH_r*.json to PERF.md see which oracle rate each number
    used — the live rate wanders 346-495 rays/s with host load."""
    rec = {"metric": metric, "value": round(value, 1), "unit": unit,
           "vs_baseline": round(value / (live_baseline or const_baseline), 2),
           "vs_baseline_const": round(value / const_baseline, 2)}
    if live_baseline:
        rec["vs_baseline_live"] = rec["vs_baseline"]
        rec["baseline_live"] = round(live_baseline, 1)
    rec.update(extra)
    print(json.dumps(rec))


def measure_baseline_live(budget_s: float = 3.0) -> float:
    import numpy as np

    from lomanerf_tpu.parity import oracle

    if not oracle.oracle_available():
        return LOMA_CPU_RAYS_PER_S
    rng = np.random.default_rng(0)
    ws = [rng.standard_normal(s).astype(np.float32) * 0.1 for s in PARITY_LAYERS]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in PARITY_LAYERS]
    n_rays, s = 4, PARITY_SAMPLES
    enc = rng.standard_normal((n_rays * s, 33)).astype(np.float32)
    target = rng.random((n_rays, 3)).astype(np.float32)
    t = np.linspace(2.0, 6.0, s).astype(np.float32)
    dists = np.tile(np.concatenate([t[1:] - t[:-1], [1e8]]), (n_rays, 1)).astype(
        np.float32
    )
    oracle.nerf_forward(enc, ws, bs, target, dists)
    oracle.nerf_grad(enc, ws, bs, target, dists)
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < budget_s:
        oracle.nerf_forward(enc, ws, bs, target, dists)
        oracle.nerf_grad(enc, ws, bs, target, dists)
        iters += 1
    return iters * n_rays / (time.perf_counter() - t0)


def measure_fit_baseline_live(budget_s: float = 3.0) -> float:
    import numpy as np

    from lomanerf_tpu.parity import oracle

    if not oracle.oracle_available():
        return LOMA_CPU_FIT_PX_PER_S
    rng = np.random.default_rng(0)
    ws = [rng.standard_normal(s).astype(np.float32) * 0.1 for s in FIT_LAYERS]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in FIT_LAYERS]
    n = 256  # the reference's chunk (fit_img.py:421)
    enc = rng.standard_normal((n, 22)).astype(np.float32)
    target = rng.random((n, 3)).astype(np.float32)
    oracle.mlp_fit_forward(enc, ws, bs, target)
    oracle.mlp_fit_grad(enc, ws, bs, target)
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < budget_s:
        oracle.mlp_fit_forward(enc, ws, bs, target)
        oracle.mlp_fit_grad(enc, ws, bs, target)
        iters += 1
    return iters * n / (time.perf_counter() - t0)


def bench_fit(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lomanerf_tpu.core import init_mlp
    from lomanerf_tpu.models import ImageFieldConfig
    from lomanerf_tpu.models.image_mlp import image_grid_coords
    from lomanerf_tpu.train.steps import make_image_fit_step, resolve_backend

    cfg = {"fit": ImageFieldConfig.small,
           "fit-hires": ImageFieldConfig.hires}[args.config]()
    backend = args.backend
    if backend == "auto":
        backend = resolve_backend(cfg)
    params = init_mlp(
        jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
        cfg.num_layers, cfg.filter_size, init=cfg.init,
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    n_px = cfg.img_size * cfg.img_size
    coords = image_grid_coords(cfg.img_size)
    rng = np.random.default_rng(0)
    step = make_image_fit_step(cfg, opt, backend=backend, donate=False)
    K = args.inner_steps

    @jax.jit
    def run_k(params, opt_state, target):
        def body(carry, _):
            p, s = carry
            p, s, loss = step(p, s, coords, target, None)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=K
        )
        return params, opt_state, losses[-1]

    targets = [jnp.asarray(rng.random((n_px, 3)), jnp.float32)
               for _ in range(2)]
    p, s = params, opt_state
    for t in targets:
        p, s, loss = run_k(p, s, t)
    _ = float(loss)

    times, losses_seen = [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        p, s, loss = run_k(p, s, targets[i % 2])
        lv = float(loss)
        times.append((time.perf_counter() - t0) / K)
        losses_seen.append(lv)
    assert np.isfinite(lv), "non-finite loss in benchmark"
    assert len(set(losses_seen)) == len(losses_seen), losses_seen
    px_per_s = n_px / sorted(times)[len(times) // 2]
    emit(
        f"fit2d_train_px_per_s_chip[{backend}]"
        + ("" if args.config == "fit" else "[hires]"),
        px_per_s, "px/s", LOMA_CPU_FIT_PX_PER_S,
        measure_fit_baseline_live() if args.live_baseline else None,
    )


def measure_render_baseline_live(budget_s: float = 3.0) -> float:
    """loma CPU oracle FORWARD-ONLY rays/s (the render path's honest
    baseline: the reference's eval loop calls only the forward kernel,
    train_nerf.py:558-712)."""
    import numpy as np

    from lomanerf_tpu.parity import oracle

    if not oracle.oracle_available():
        return LOMA_CPU_RENDER_RAYS_PER_S
    rng = np.random.default_rng(0)
    ws = [rng.standard_normal(s).astype(np.float32) * 0.1 for s in PARITY_LAYERS]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in PARITY_LAYERS]
    n_rays, s = 4, PARITY_SAMPLES
    enc = rng.standard_normal((n_rays * s, 33)).astype(np.float32)
    target = rng.random((n_rays, 3)).astype(np.float32)
    t = np.linspace(2.0, 6.0, s).astype(np.float32)
    dists = np.tile(np.concatenate([t[1:] - t[:-1], [1e8]]), (n_rays, 1)).astype(
        np.float32
    )
    oracle.nerf_forward(enc, ws, bs, target, dists)
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < budget_s:
        oracle.nerf_forward(enc, ws, bs, target, dists)
        iters += 1
    return iters * n_rays / (time.perf_counter() - t0)


def bench_render(args) -> None:
    """BASELINE config 5: 800x800 render (eval path, flagship MLP) rays/s
    through the PRODUCTION mesh-sharded render (parallel/render_step.py):
    the frame's ray chunks sharded over a data mesh of all local devices
    (one chip here — the all-gather is a no-op on a 1-device axis, so this
    measures the per-chip slice of the pod render), reassembled in-program
    by tiled all_gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lomanerf_tpu.core import init_mlp
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.parallel import data_mesh, shard_ray_chunks, \
        sharded_render_fn

    cfg = NeRFConfig.full()
    n = args.rays or 800 * 800
    # rays per render dispatch; the production render path scans chunks
    # inside one jit.  The s-major render kernels take O(N) ray bytes and
    # write (N, 128), so chunks far larger than the historical 16384 fit
    # HBM comfortably.
    chunk = args.render_chunk
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels,
                      cfg.out_channels, cfg.num_layers, cfg.filter_size,
                      init=cfg.init)
    mesh = data_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    oc, dc, _ = shard_ray_chunks(
        mesh, rng.standard_normal((n, 3)), rng.standard_normal((n, 3)), chunk
    )
    n_pad = oc.shape[0] * chunk
    render = sharded_render_fn(cfg, mesh, backend="pallas")
    K = max(args.inner_steps // 4, 2)

    @jax.jit
    def run_k(salt):
        def frame(acc, i):
            # one full 800x800 frame through the sharded render; perturbed
            # origins per chained frame so the relay cannot memoize and the
            # fetched probe depends on every render
            cols = render(
                params, oc * (1.0 + salt + 1e-4 * i.astype(jnp.float32)), dc
            )
            return acc + jnp.mean(cols), None

        acc, _ = jax.lax.scan(frame, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return acc

    _ = float(run_k(jnp.float32(0.0)))
    _ = float(run_k(jnp.float32(0.3)))
    times, seen = [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        v = float(run_k(jnp.float32(0.05 * (i + 1))))
        times.append((time.perf_counter() - t0) / K)
        seen.append(v)
    assert len(set(seen)) == len(seen), seen
    rays_per_s = n_pad / sorted(times)[len(times) // 2]
    # metric key kept STABLE across rounds (driver-contract continuity);
    # the mesh size rides in a side field
    emit(
        "nerf_render_rays_per_s_chip[pallas][800x800,full]",
        rays_per_s, "rays/s", LOMA_CPU_RENDER_RAYS_PER_S,
        measure_render_baseline_live() if args.live_baseline else None,
        mesh_devices=n_dev,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=0,
                    help="rays per step (default: per-config)")
    ap.add_argument("--config", default="small",
                    choices=["small", "single64", "full", "fit", "fit-hires",
                             "pod-render"],
                    help="config ladder entry (small = reference parity; "
                         "fit/fit-hires imply --task fit)")
    ap.add_argument("--steps", type=int, default=10, help="timed outer calls")
    ap.add_argument("--inner-steps", dest="inner_steps", type=int, default=20,
                    help="train steps chained inside one jit per outer call")
    ap.add_argument(
        "--backend", default="auto", choices=["auto", "jnp", "pallas", "pallas-remat"],
        help="compute path for the train step",
    )
    ap.add_argument(
        "--live-baseline", action="store_true",
        help="re-measure the loma CPU baseline instead of the recorded value",
    )
    ap.add_argument(
        "--render-chunk", type=int, default=160000,
        help="rays per render dispatch for --config pod-render "
             "(800x800 = 4 chunks at the default)",
    )
    args = ap.parse_args()
    if args.config in ("fit", "fit-hires"):
        bench_fit(args)
        return
    if args.config == "pod-render":
        bench_render(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.train.steps import make_single_chip_train_step

    cfg = NeRFConfig.preset(args.config)
    backend = args.backend
    if backend == "auto":
        # v5e: fused pallas train kernels beat the XLA-fused jnp step across
        # the config ladder (PERF.md); resolve from the ACTUAL config so any
        # future config-dependent dispatch is honored.
        from lomanerf_tpu.train.steps import resolve_backend

        backend = resolve_backend(cfg)
    if not args.rays:
        # keep per-step sample count comparable across the ladder
        args.rays = {"small": 262144, "single64": 65536, "full": 16384}[
            args.config]
    params = init_mlp(
        jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
        cfg.num_layers, cfg.filter_size, init=cfg.init,
    )
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    n = args.rays

    def make_batch():
        o = jnp.asarray(rng.standard_normal((n, 3)), dtype=jnp.float32)
        d = jnp.asarray(rng.standard_normal((n, 3)), dtype=jnp.float32)
        _, t_vals, dists = sample_along_rays(
            o, d, cfg.near, cfg.far, cfg.num_samples
        )
        target = jnp.asarray(rng.random((n, 3)), dtype=jnp.float32)
        return o, d, t_vals, dists, target

    # Measurement integrity in this environment (see PERF.md):
    # * the device relay memoizes execution on (executable, input buffer
    #   ids) -> donate=False and DISTINCT batches cycled across calls,
    # * block_until_ready does not reliably fence, and a host fetch costs a
    #   fixed ~32 ms relay round-trip -> K train steps are chained inside
    #   one jit (params carry forces every step to really execute; the
    #   final loss depends on all of them) and ONE float(loss) fetch per
    #   call amortizes the RTT to ~32/K ms.
    step = make_single_chip_train_step(cfg, opt, backend=backend,
                                       donate=False)
    K = args.inner_steps

    @jax.jit
    def run_k(params, opt_state, batch):
        def body(carry, _):
            p, s = carry
            p, s, loss = step(p, s, *batch)  # jit-of-jit inlines
            return (p, s), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=K
        )
        return params, opt_state, losses[-1]

    batches = [make_batch() for _ in range(2)]
    # warmup / compile
    p, s = params, opt_state
    for b in batches:
        p, s, loss = run_k(p, s, b)
    _ = float(loss)

    times, losses_seen = [], []
    for i in range(args.steps):
        b = batches[i % len(batches)]
        t0 = time.perf_counter()
        p, s, loss = run_k(p, s, b)
        lv = float(loss)
        times.append((time.perf_counter() - t0) / K)
        losses_seen.append(lv)
    assert np.isfinite(lv), "non-finite loss in benchmark"
    # params evolve, so repeated calls must yield distinct losses (a relay
    # cache hit would repeat one)
    assert len(set(losses_seen)) == len(losses_seen), losses_seen
    rays_per_s = args.rays / sorted(times)[len(times) // 2]

    emit(
        f"nerf_train_rays_per_s_chip[{backend}]"
        + ("" if args.config == "small" else f"[{args.config}]"),
        rays_per_s, "rays/s", LOMA_CPU_RAYS_PER_S,
        measure_baseline_live() if args.live_baseline else None,
    )


if __name__ == "__main__":
    main()
