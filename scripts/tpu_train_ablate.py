"""Ablation timing of the fused TRAIN kernels on the real chip.

Memoization-proof: cycles K distinct input sets and fetches float(loss)
per call, so the device relay cannot serve cached executions
(see CLAUDE.md "Benchmark integrity").
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
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--nsets", type=int, default=3)
    ap.add_argument("--filter", default="",
                    help="substring filter on case labels")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.core.pipeline import nerf_loss_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = NeRFConfig.small()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)
    N = args.rays
    sets = []
    for _ in range(args.nsets):
        o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
        _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far,
                                        cfg.num_samples)
        target = jnp.asarray(rng.random((N, 3)).astype(np.float32))
        sets.append((o, d, t, dists, target))

    def timeit(make_fn, label):
        try:
            fn = jax.jit(make_fn)
            for s in sets:  # compile + warm
                jax.block_until_ready(fn(params, *s))
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:160]}", flush=True)
            return
        ts = []
        for i in range(args.reps * len(sets)):
            s = sets[i % len(sets)]
            t0 = time.perf_counter()
            out = fn(params, *s)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: {med*1e3:8.2f} ms  ({N/med/1e6:5.2f} Mrays/s)",
              flush=True)

    # transposed fused train kernel: full and ablations
    cases = [
        (128, True, "float32", ""),
        (128, True, "float32", "enc_only"),
        (128, True, "float32", "no_bwd"),
        (128, True, "float32", "no_scans"),
        (128, True, "float32", "no_mlp_bwd"),
        (128, "high", "float32", ""),
        (128, False, "float32", ""),
        (128, False, "bfloat16", ""),
        (256, True, "float32", ""),
    ]
    for R, hp, cdt, ab in cases:
        label = f"T R={R:3d} hp={hp} {cdt:8s} ablate={ab or 'none'}"
        if args.filter and args.filter not in label:
            continue
        def mk(p, o, d, t, di, tg, R=R, hp=hp, cdt=cdt, ab=ab):
            t2 = jnp.broadcast_to(t, (o.shape[0], cfg.num_samples))
            di2 = jnp.broadcast_to(di, (o.shape[0], cfg.num_samples))
            return jax.value_and_grad(
                lambda q: fused_nerf._nerf_train_loss_T(
                    q, o, d, t2, di2, tg, cfg, R, hp, cdt, 40, ab)
            )(p)
        timeit(mk, label)


if __name__ == "__main__":
    main()
