"""Perf sweep of the fused NeRF kernels on the real chip.

Times forward-only and loss+grad separately, across tile sizes and matmul
precision, against the jnp baseline.  Chunked async timing (block every
chunk) so dispatch RPC noise amortizes.
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
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.core.pipeline import nerf_loss_rays, nerf_render_rays
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
    target = jnp.asarray(rng.random((N, 3)).astype(np.float32))

    def timeit(fn, label):
        try:
            out = fn()  # compile
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:200]}", flush=True)
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.chunk):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.chunk)
        print(f"{label}: {best*1e3:8.2f} ms -> {N/best/1e6:7.2f} Mrays/s",
              flush=True)

    # jnp baselines
    jnp_fwd = jax.jit(lambda: nerf_render_rays(
        params, o, d, t, dists, cfg.num_encoding_functions, cfg.mode))
    timeit(jnp_fwd, "jnp fwd (highest)")
    jnp_grad = jax.jit(lambda: jax.grad(
        lambda p: nerf_loss_rays(p, o, d, t, dists, target,
                                 cfg.num_encoding_functions, cfg.mode)
    )(params))
    timeit(jnp_grad, "jnp loss+grad (highest)")

    def jnp_fwd_fast():
        with jax.default_matmul_precision("default"):
            return nerf_render_rays(params, o, d, t, dists,
                                    cfg.num_encoding_functions, cfg.mode)
    timeit(jax.jit(jnp_fwd_fast), "jnp fwd (default prec)")

    def jnp_grad_fast():
        with jax.default_matmul_precision("default"):
            return jax.grad(
                lambda p: nerf_loss_rays(p, o, d, t, dists, target,
                                         cfg.num_encoding_functions, cfg.mode)
            )(params)
    timeit(jax.jit(jnp_grad_fast), "jnp loss+grad (default prec)")

    # fused kernels
    for tile in (16, 32, 64):
        for hp in (True, False):
            tag = f"tile={tile} {'highest' if hp else 'default'}"
            fwd = jax.jit(lambda tile=tile, hp=hp: fused_nerf.render_rays(
                params, o, d, t, dists, cfg, tile_rays=tile,
                highest_precision=hp))
            timeit(fwd, f"pallas fwd  {tag}")
            grad = jax.jit(lambda tile=tile, hp=hp: jax.grad(
                lambda p: fused_nerf.nerf_loss(
                    p, o, d, t, dists, target, cfg, tile_rays=tile,
                    highest_precision=hp))(params))
            timeit(grad, f"pallas grad {tag}")


if __name__ == "__main__":
    main()
