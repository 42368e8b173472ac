"""Speed-of-light stage timing of the transposed train kernel (real chip).

RTT-amortized: K ablation steps are chained inside one jit via lax.scan
with an evolving params carry (each step's loss feeds a tiny param
perturbation, so the relay cannot memoize and every step really executes);
ONE float fetch per outer call.  This is the same measurement discipline as
bench.py (see PERF.md "measurement integrity").

Stages (ablate hooks in ops/fused_nerf._nerf_train_kernel_T):
    enc_only    launch + DMA + positional encoding
    no_bwd      + MLP forward + compositing + loss
    no_mlp_bwd  + compositing backward
    none        + MLP backward (the full train step)
    no_scans    full step minus all segmented scans (scan cost)
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
    ap.add_argument("--tile", type=int, default=0,
                    help="ray tile (0 = per-layout default: smajor 128, "
                         "raymajor 64)")
    ap.add_argument("--layout", default="smajor",
                    choices=["smajor", "raymajor"],
                    help="smajor = in-kernel point generation (production); "
                         "raymajor = XLA-side row prep (stratified path)")
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
    tile = args.tile or (128 if args.layout == "smajor" else 64)
    if args.layout == "smajor":
        def loss_fn(w, oo, ab_arg):
            return fused_nerf._nerf_train_loss_S(
                w, oo, d, t, dists, tg, cfg, tile, True, "float32", 40,
                ab_arg)
    else:
        t2 = jnp.broadcast_to(t, (N, cfg.num_samples))
        dists2 = jnp.broadcast_to(dists, (N, cfg.num_samples))

        def loss_fn(w, oo, ab_arg):
            return fused_nerf._nerf_train_loss_T(
                w, oo, d, t2, dists2, tg, cfg, tile, True, "float32", 40,
                ab_arg)

    results = {}
    for ab in ["enc_only", "no_bwd", "no_mlp_bwd", "none", "no_scans"]:
        ab_arg = "" if ab == "none" else ab

        @jax.jit
        def run_k(salt, ab_arg=ab_arg):
            def body(acc, _):
                # perturb the POINTS through the carry: every chained step's
                # loss differs (even ablations whose loss ignores params),
                # and the final fetched loss structurally depends on all of
                # them, so neither XLA nor the relay can elide a step
                loss, _ = jax.value_and_grad(
                    lambda w: loss_fn(w, o * (1.0 + acc), ab_arg)
                )(params)
                return acc + jnp.float32(1e-4) + loss * 1e-20, loss

            _, losses = jax.lax.scan(body, salt, None, length=K)
            return losses[-1]

        try:
            _ = float(run_k(jnp.float32(0.0)))
            _ = float(run_k(jnp.float32(0.5)))
        except Exception as e:
            print(f"{ab}: FAILED {str(e)[:160]}", flush=True)
            continue
        ts, seen = [], []
        for i in range(args.outer):
            t0 = time.perf_counter()
            lv = float(run_k(jnp.float32(0.1 * (i + 1))))
            ts.append((time.perf_counter() - t0) / K)
            seen.append(lv)
        assert len(set(seen)) == len(seen), (ab, seen)
        med = sorted(ts)[len(ts) // 2]
        results[ab] = med
        print(f"{ab:10s}: {med*1e3:7.2f} ms/step  "
              f"({N/med/1e6:6.2f} Mrays/s)", flush=True)

    if "none" in results:
        full = results["none"]
        print("\nstage deltas (of full %.2f ms):" % (full * 1e3))
        for ab, label in [("enc_only", "encode+DMA floor"),
                          ("no_bwd", "fwd+loss (adds)"),
                          ("no_mlp_bwd", "+comp bwd (adds)"),
                          ("no_scans", "scan cost (full-no_scans)")]:
            if ab in results:
                if ab == "no_scans":
                    v = full - results[ab]
                else:
                    v = results[ab]
                print(f"  {label:28s} {v*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
