"""Headline benchmark: NeRF train-step rays/sec on one chip (fwd+bwd).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline = the reference loma CPU implementation (gcc -O2, serial C) running
the same parity workload (30 samples/ray, MLP 33->30->30->4, fwd+grad per
chunk of 4 rays).  Measured live when /root/reference + gcc are present
(~350 rays/s on this host); otherwise a recorded constant is used.  The
reference publishes no numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

# Recorded loma CPU oracle throughput on this machine (see --live-baseline).
LOMA_CPU_RAYS_PER_S = 350.0

PARITY_SAMPLES = 30
PARITY_LAYERS = [(33, 30), (30, 30), (30, 4)]


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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144, help="rays per step")
    ap.add_argument("--steps", type=int, default=10, help="timed steps")
    ap.add_argument(
        "--backend", default="auto", choices=["auto", "jnp", "pallas", "pallas-remat"],
        help="compute path for the train step",
    )
    ap.add_argument(
        "--live-baseline", action="store_true",
        help="re-measure the loma CPU baseline instead of the recorded value",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.train.steps import make_single_chip_train_step

    backend = args.backend
    if backend == "auto":
        # v5e, 262144 rays/step, back-to-back: fused pallas train kernel
        # (transposed layout) 3.06 Mrays/s vs XLA-fused jnp 1.65 Mrays/s.
        from lomanerf_tpu.train.steps import resolve_backend

        backend = resolve_backend(NeRFConfig.small())

    cfg = NeRFConfig.small()  # the reference parity workload
    params = init_mlp(
        jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
        cfg.num_layers, cfg.filter_size,
    )
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    n = args.rays
    origins = jnp.asarray(rng.standard_normal((n, 3)), dtype=jnp.float32)
    directions = jnp.asarray(rng.standard_normal((n, 3)), dtype=jnp.float32)
    _, t_vals, dists = sample_along_rays(
        origins, directions, cfg.near, cfg.far, cfg.num_samples
    )
    target = jnp.asarray(rng.random((n, 3)), dtype=jnp.float32)

    # donate=False: the device relay in this environment memoizes execution
    # on (executable, input buffer ids); donated carries cycle between two
    # buffers and later steps silently return cached results, faking
    # 100-1000x speedups.  Without donation every step's params are fresh
    # buffers, so each step really executes.
    step = make_single_chip_train_step(cfg, opt, backend=backend,
                                       donate=False)
    # warmup / compile
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, origins, directions,
                                       t_vals, dists, target)
    jax.block_until_ready((params, opt_state, loss))

    # Per-step host sync via float(loss): block_until_ready does not reliably
    # fence through this environment's device relay, but fetching each step's
    # (distinct) loss value cannot be faked.  The ~20 ms RPC round-trip is
    # amortized by the large default batch.
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, origins,
                                       directions, t_vals, dists, target)
        lv = float(loss)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(lv), "non-finite loss in benchmark"
    rays_per_s = args.rays / sorted(times)[len(times) // 2]

    baseline = measure_baseline_live() if args.live_baseline else LOMA_CPU_RAYS_PER_S
    print(
        json.dumps(
            {
                "metric": f"nerf_train_rays_per_s_chip[{backend}]",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
