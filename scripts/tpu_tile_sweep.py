"""Transposed-train-kernel ray-tile sweep (real chip).

The round-2 stage split attributed 17.3 ms (38%) of the parity step to
"launch + DMA + encoding".  At the default tile (R=128 -> 2048 grid tiles
per 262144-ray step) a fixed per-tile cost of a few us would account for
most of that stage, so this sweep times the FULL train step and the
enc_only ablation across tiles, RTT-amortized exactly like bench.py.

Usage: python scripts/tpu_tile_sweep.py [--rays 262144] [--tiles 64,128,256,512,1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--tiles", default="128,256,512")
    ap.add_argument("--ablate", default="none,enc_only")
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"],
                    help="matmul precision for the fp32 kernels")
    ap.add_argument("--layout", default="smajor",
                    choices=["smajor", "raymajor"])
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
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
    tg = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    K = args.inner
    if args.layout == "smajor":
        hp = args.precision if args.precision != "highest" else True

        def make_loss(tile, ab_arg):
            return lambda w, oo: fused_nerf._nerf_train_loss_S(
                w, oo, d, t, dists, tg, cfg, tile, hp, "float32", 40,
                ab_arg)
    else:
        t2 = jnp.broadcast_to(t, (N, cfg.num_samples))
        dists2 = jnp.broadcast_to(dists, (N, cfg.num_samples))

        def make_loss(tile, ab_arg):
            return lambda w, oo: fused_nerf._nerf_train_loss_T(
                w, oo, d, t2, dists2, tg, cfg, tile, True, "float32", 40,
                ab_arg)

    for tile in [int(x) for x in args.tiles.split(",")]:
        for ab in args.ablate.split(","):
            ab_arg = "" if ab == "none" else ab

            loss_fn = make_loss(tile, ab_arg)

            @jax.jit
            def run_k(salt, loss_fn=loss_fn):
                def body(acc, _):
                    loss, _ = jax.value_and_grad(
                        lambda w: loss_fn(w, o * (1.0 + acc))
                    )(params)
                    return acc + jnp.float32(1e-4) + loss * 1e-20, loss

                _, losses = jax.lax.scan(body, salt, None, length=K)
                return losses[-1]

            try:
                _ = float(run_k(jnp.float32(0.0)))
                _ = float(run_k(jnp.float32(0.5)))
            except Exception as e:
                # full message: Mosaic VMEM errors carry the requested vs
                # available byte counts — the budget arithmetic we record
                print(f"tile {tile:5d} {ab:9s}: FAILED {str(e)[:3000]}",
                      flush=True)
                continue
            ts, seen = [], []
            for i in range(args.outer):
                t0 = time.perf_counter()
                lv = float(run_k(jnp.float32(0.1 * (i + 1))))
                ts.append((time.perf_counter() - t0) / K)
                seen.append(lv)
            assert len(set(seen)) == len(seen), (tile, ab, seen)
            med = sorted(ts)[len(ts) // 2]
            n_tiles = -(-N // tile)
            print(f"tile {tile:5d} ({n_tiles:5d} grid) {ab:9s}: "
                  f"{med*1e3:7.2f} ms/step  ({N/med/1e6:6.2f} Mrays/s)",
                  flush=True)


if __name__ == "__main__":
    main()
