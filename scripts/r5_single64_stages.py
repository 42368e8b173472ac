"""Round-5: stage-split the single64 rung (VERDICT r4 next #8).

RTT-amortized (K steps chained in one jit via lax.scan, params carried so
every step executes; one float fetch per call — bench.py's method; the
first version of this script paid the ~32 ms relay RTT per sample and was
discarded).  Configuration: S=64, MLP 33->64x3->4, transposed single-pass
kernel, bf16x3 "high" tier, direct-layout prep — the production single64
path.  Also times the XLA input prep alone.
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
    cfg = NeRFConfig.single_view_64()
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, 4,
                      cfg.num_layers, cfg.filter_size)
    N = 65536
    S = cfg.num_samples
    widths = [cfg.in_channels] + [w.shape[1] for w in params["w"]]
    ps = pu.round_up(max(max(widths), 8), 8)
    R = fused_nerf._pick_tile_T(S, ps, len(params["w"]), 4, n_bufs=6)
    print(f"ps={ps} R={R}", flush=True)
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t1, dists1 = sample_along_rays(o, d, cfg.near, cfg.far, S)
    target = jnp.asarray(rng.random((N, 3)).astype(np.float32))

    def timeit(step_fn, label, carry0):
        """step_fn(carry, salt_i) -> (carry, probe); K chained in one jit."""
        @jax.jit
        def run_k(carry, salt):
            def body(c, i):
                return step_fn(c, salt + 1e-4 * i.astype(jnp.float32))
            c, probes = jax.lax.scan(body, carry,
                                     jnp.arange(K, dtype=jnp.int32))
            return c, probes[-1]
        try:
            _, p0 = run_k(carry0, jnp.float32(0.0))
            _ = float(jnp.asarray(p0).ravel()[0])
            _, p0 = run_k(carry0, jnp.float32(0.5))
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
        # defeat relay memoization: a cached run would repeat ONE value;
        # tiny-lr fp32 loss drift may still collide a pair by luck
        assert len(set(seen)) > len(seen) // 2, (label, seen)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: {med*1e3:8.2f} ms  ({N/med/1e6:5.2f} Mrays/s)",
              flush=True)

    # XLA prep alone (salt-perturbed origins force re-execution)
    def prep_step(c, salt):
        t2 = jnp.broadcast_to(t1, (N, S))
        di2 = jnp.broadcast_to(dists1, (N, S))
        ptsT, distsT, _, pad = fused_nerf._transposed_ray_layout(
            o * (1.0 + salt) + c, d, t2, di2, S, R)
        # keep dists/target live but scaled down: the 1e8 dists
        # sentinel otherwise swamps fp32 resolution of the salt term
        probe = jnp.mean(jnp.abs(ptsT)) + 1e-9 * (
            jnp.mean(distsT) + jnp.mean(pad(target)))
        return c + probe * 1e-12, probe
    timeit(prep_step, "prep only (pts^T/dists^T/tgt pad)", jnp.float32(0.0))

    for ab in ("", "enc_only", "no_scans", "no_bwd", "no_mlp_bwd"):
        def step(carry, salt, ab=ab):
            p = carry
            t2 = jnp.broadcast_to(t1, (N, S))
            di2 = jnp.broadcast_to(dists1, (N, S))
            loss, grads = jax.value_and_grad(
                lambda q: fused_nerf._nerf_train_loss_T(
                    q, o * (1.0 + salt), d, t2, di2, target, cfg, R,
                    "high", "float32", ps, ab)
            )(p)
            p = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
            return p, loss
        timeit(step, f"single64 T R={R} high ablate={ab or 'none'}", params)

if __name__ == "__main__":
    main()
