"""Stage split of the flagship (8x256, bf16, S=128) RENDER kernel.

The pod-render rung runs at ~600 K rays/s (~38% of bf16 MXU on fwd FLOPs)
while the train kernel sustains ~61% — and the chunk sweep
(artifacts/r4_render_chunk.log) showed dispatch overhead is nil, so the
gap is intra-kernel.  This times the fused W render forward with stage
ablations:

    enc_only -> launch + DMA + in-kernel pointgen + encode
    no_comp  -> + MLP forward
    no_sel   -> + compositing scans
    none     -> + per-ray selector reduction (full kernel)

Run solo (one TPU client at a time).
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
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--ablate", default="enc_only,no_comp,no_sel,none")
    ap.add_argument("--tiles", default="",
                    help="comma-separated R_W overrides (default: the "
                         "pick_tile_rays choice)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf, pallas_utils as pu

    print("backend:", jax.default_backend(), flush=True)
    cfg = NeRFConfig.full()
    S = cfg.num_samples
    rng = np.random.default_rng(215)
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels,
                      cfg.out_channels, cfg.num_layers, cfg.filter_size)
    N = args.rays
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, S)

    widths = [cfg.in_channels] + [cfg.filter_size] * (cfg.num_layers - 1) + [4]
    pw = pu.round_up(max(widths + [128]), 128)
    itemsize = 2
    R_def = pu.pick_tile_rays(S, pw, n_live_buffers=cfg.num_layers + 4,
                              itemsize=itemsize)
    tiles = ([int(x) for x in args.tiles.split(",")] if args.tiles
             else [R_def])
    print(f"pw={pw} default R_W={R_def} tiles={tiles}", flush=True)
    w_stack, b_stack = pu.stack_padded_params(params, pw)
    K = args.inner

    for R_W in tiles:
      for ab in args.ablate.split(","):
        render = fused_nerf._make_render_fns_W(
            cfg.num_layers, R_W, S, pw, 3, cfg.num_encoding_functions,
            cfg.mode, False, "bfloat16", "" if ab == "none" else ab,
        )
        rays_rm, _, _ = fused_nerf._rm_smajor_ray_layout(o, d, R_W)
        t_row = jnp.repeat(jnp.asarray(t, jnp.float32),
                           R_W).reshape(R_W * S, 1)
        d_row = jnp.repeat(jnp.asarray(dists, jnp.float32),
                           R_W).reshape(R_W * S, 1)

        @jax.jit
        def run_k(salt, render=render, rays_rm=rays_rm):
            def body(acc, i):
                out = render(w_stack, b_stack,
                             rays_rm * (1.0 + salt
                                        + 1e-4 * i.astype(jnp.float32)),
                             t_row, d_row)
                return acc + jnp.mean(out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.int32))
            return acc

        try:
            _ = float(run_k(jnp.float32(0.0)))
            _ = float(run_k(jnp.float32(0.3)))
        except Exception as e:
            print(f"R={R_W:3d} {ab:9s}: FAILED {str(e)[:3000]}", flush=True)
            continue
        ts, seen = [], []
        for i in range(args.outer):
            t0 = time.perf_counter()
            v = float(run_k(jnp.float32(0.05 * (i + 1))))
            ts.append((time.perf_counter() - t0) / K)
            seen.append(v)
        assert len(set(seen)) == len(seen), (ab, seen)
        med = sorted(ts)[len(ts) // 2]
        print(f"R={R_W:3d} {ab:9s}: {med*1e3:7.2f} ms/chunk "
              f"({N/med/1e3:7.1f} Krays/s)", flush=True)


if __name__ == "__main__":
    main()
