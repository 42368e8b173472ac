"""Ablate the fused forward kernel to locate the parity-config bottleneck.

Each variant times 64k-ray forwards with per-call host sync and cycling
input buffers (defeats the relay's (executable, buffer-ids) memoization).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = NeRFConfig.small()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)
    N = args.rays

    # several distinct input sets so every call uses fresh buffers
    batches = []
    for k in range(3):
        o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
        _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far,
                                        cfg.num_samples)
        batches.append((o, d, t, dists))

    variants = [
        ("full fp32", dict()),
        ("no_sin", dict(kw_ablate="no_sin")),
        ("no_composite", dict(kw_ablate="no_composite")),
        ("no_mlp", dict(kw_ablate="no_mlp")),
        ("no_sin+no_composite", dict(kw_ablate="no_sin,no_composite")),
        ("bf16", dict(compute_dtype="bfloat16")),
        ("tile64 fp32", dict(tile_rays=64)),
    ]
    for name, kw in variants:
        fn = jax.jit(lambda o, d, t, dd, kw=tuple(sorted(kw.items())):
                     fused_nerf.render_rays(params, o, d, t, dd, cfg,
                                            **dict(kw)))
        try:
            out = fn(*batches[0])
            _ = float(out[0, 0])
        except Exception as e:
            print(f"{name:24s} FAILED {str(e)[:120]}", flush=True)
            continue
        times = []
        for i in range(args.iters):
            b = batches[i % len(batches)]
            t0 = time.perf_counter()
            out = fn(*b)
            _ = float(out[0, 0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"{name:24s} {med*1e3:8.2f} ms  {N/med/1e6:6.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
