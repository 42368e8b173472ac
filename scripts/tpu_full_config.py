"""Full-config (8x256 MLP, 128 spp) timing: jnp vs fused pallas.

Per-step float(loss) sync (unfakeable through the relay).  Run alone.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--backends", default="jnp,pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.train.steps import make_single_chip_train_step

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = NeRFConfig.full()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)
    N = args.rays
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
    target = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    opt = optax.adam(5e-4)

    for backend in args.backends.split(","):
        p = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                     cfg.num_layers, cfg.filter_size)
        st = opt.init(p)
        step = make_single_chip_train_step(cfg, opt, backend=backend,
                                           donate=False)
        try:
            t0 = time.perf_counter()
            p, st, loss = step(p, st, o, d, t, dists, target)
            lv = float(loss)
            print(f"[{backend}] compile+first {time.perf_counter()-t0:.1f}s "
                  f"loss {lv:.1f}", flush=True)
        except Exception as e:
            print(f"[{backend}] FAILED: {str(e)[:300]}", flush=True)
            continue
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            p, st, loss = step(p, st, o, d, t, dists, target)
            lv = float(loss)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"[{backend}] per-step median {med*1e3:.1f} ms -> "
              f"{N/med/1e3:.1f} Krays/s (loss {lv:.2f})", flush=True)


if __name__ == "__main__":
    main()
