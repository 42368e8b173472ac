"""On-chip validation + microbench of the fused kernels vs the jnp path.

Run on the real TPU (no platform override):
    python scripts/tpu_validate.py [--rays 65536] [--steps 10]
Prints correctness deltas then per-step timings for jnp vs pallas backends.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.core.pipeline import nerf_loss_rays, nerf_render_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf
    from lomanerf_tpu.train.steps import make_single_chip_train_step

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = NeRFConfig.small()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)

    # --- correctness on a small batch ---
    n = 256
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
    target = jnp.asarray(rng.random((n, 3)).astype(np.float32))

    t0 = time.perf_counter()
    got = jax.jit(lambda p: fused_nerf.render_rays(p, o, d, t, dists, cfg))(params)
    got.block_until_ready()
    print(f"fused fwd compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    want = nerf_render_rays(params, o, d, t, dists,
                            cfg.num_encoding_functions, cfg.mode)
    print("fwd max abs err:", float(jnp.max(jnp.abs(got - want))), flush=True)

    t0 = time.perf_counter()
    gf = jax.jit(jax.grad(
        lambda p: fused_nerf.nerf_loss(p, o, d, t, dists, target, cfg)))(params)
    jax.block_until_ready(gf)
    print(f"fused bwd compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    gj = jax.grad(lambda p: nerf_loss_rays(p, o, d, t, dists, target,
                                           cfg.num_encoding_functions,
                                           cfg.mode))(params)
    errs = [float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gj))]
    print("grad max abs errs:", [f"{e:.2e}" for e in errs], flush=True)

    # --- timing: full train step, both backends ---
    N = args.rays
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
    target = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    opt = optax.adam(5e-4)

    for backend in ("jnp", "pallas"):
        params_b = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                            cfg.num_layers, cfg.filter_size)
        opt_state = opt.init(params_b)
        step = make_single_chip_train_step(cfg, opt, backend=backend,
                                           donate=False)
        t0 = time.perf_counter()
        params_b, opt_state, loss = step(params_b, opt_state, o, d, t, dists,
                                         target)
        jax.block_until_ready(loss)
        print(f"[{backend}] compile+first {time.perf_counter()-t0:.1f}s "
              f"loss {float(loss):.1f}", flush=True)
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            params_b, opt_state, loss = step(params_b, opt_state, o, d, t,
                                             dists, target)
            _ = float(loss)  # hard host sync
            times.append(time.perf_counter() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]
        print(f"[{backend}] per-step best {best*1e3:.2f} ms / median "
              f"{med*1e3:.2f} ms -> {N/best/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
