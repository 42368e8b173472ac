"""Round-5: stage-split the PARITY rung at its production tier.

RTT-amortized additive floors of the s-major single-pass train kernel at
bf16x3 "high" (the NeRFConfig.small() production tier; the round-2/3
tables were at fp32 HIGHEST).  262,144 rays, S=30, MLP 33->30->30->4.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 10

def main():
    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf, pallas_utils as pu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = NeRFConfig.small()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)
    N = 262144
    S = cfg.num_samples
    widths = [cfg.in_channels] + [w.shape[1] for w in params["w"]]
    ps = pu.round_up(max(max(widths), 8), 8)
    R = fused_nerf._pick_tile_S(S, ps, len(params["w"]), 4, n_bufs=6)
    print(f"ps={ps} R={R}", flush=True)
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t1, dists1 = sample_along_rays(o, d, cfg.near, cfg.far, S)
    target = jnp.asarray(rng.random((N, 3)).astype(np.float32))

    def timeit(step_fn, label, carry0):
        @jax.jit
        def run_k(carry, salt):
            def body(c, i):
                return step_fn(c, salt + 1e-4 * i.astype(jnp.float32))
            c, probes = jax.lax.scan(body, carry,
                                     jnp.arange(K, dtype=jnp.int32))
            return c, probes[-1]
        try:
            for s0 in (0.0, 0.5):
                _, p0 = run_k(carry0, jnp.float32(s0))
                _ = float(jnp.asarray(p0).ravel()[0])
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:160]}", flush=True)
            return
        ts, seen = [], []
        for i in range(8):
            t0 = time.perf_counter()
            _, p = run_k(carry0, jnp.float32(0.05 * (i + 1)))
            v = float(jnp.asarray(p).ravel()[0])
            ts.append((time.perf_counter() - t0) / K)
            seen.append(v)
        assert len(set(seen)) > len(seen) // 2, (label, seen)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: {med*1e3:8.2f} ms  ({N/med/1e6:5.2f} Mrays/s)",
              flush=True)

    for ab in ("", "enc_only", "no_scans", "no_bwd", "no_mlp_bwd"):
        def step(carry, salt, ab=ab):
            p = carry
            loss, grads = jax.value_and_grad(
                lambda q: fused_nerf._nerf_train_loss_S(
                    q, o * (1.0 + salt), d, t1, dists1, target, cfg, R,
                    "high", "float32", ps, ab)
            )(p)
            p = jax.tree.map(lambda a, g: a - 1e-7 * g, p, grads)
            return p, loss
        timeit(step, f"parity S R={R} high ablate={ab or 'none'}", params)

if __name__ == "__main__":
    main()
