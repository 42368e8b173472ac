"""Weak-scaling efficiency of the sharded NeRF train step (BASELINE's
">85% rays/s scaling 1 chip -> N" target, BASELINE.md:28).

Runs the SAME shard_map train step on a 1-device mesh and an N-device mesh
with rays scaled proportionally (weak scaling: fixed rays/device), and
reports rays/s and efficiency = (rays_N / rays_1) / N.

On real multi-chip TPU this is the BASELINE measurement; on one chip it
degenerates to N=1.  On CPU it exercises the harness over the virtual
device mesh (xla_force_host_platform_device_count) — a correctness check
of the measurement path, not a hardware number (host cores are shared, so
CPU "efficiency" is meaningless and the report says so).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --rays-per-dev 4096
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(n_dev, rays_per_dev, cfg, inner, outer, backend):
    import jax
    import jax.numpy as jnp
    import optax

    from lomanerf_tpu.core import init_mlp, sample_along_rays
    from lomanerf_tpu.parallel import RayBatch, make_mesh, make_train_step, \
        shard_batch

    mesh = make_mesh(dp=n_dev, tp=1, devices=jax.devices()[:n_dev])
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels,
                      cfg.out_channels, cfg.num_layers, cfg.filter_size)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, mesh, params, opt_state, tp=False,
                           backend=backend, donate=False,
                           uniform_depths=True)
    n = rays_per_dev * n_dev
    rng = np.random.default_rng(0)

    def batch(salt):
        o = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32) + salt
        d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far,
                                        cfg.num_samples)
        tg = jnp.asarray(rng.random((n, 3)), jnp.float32)
        return shard_batch(mesh, RayBatch(o, d, t, dists, tg))

    import jax as _j

    @_j.jit
    def run_k(params, opt_state, b):
        def body(carry, _):
            p, s = carry
            p, s, loss = step(p, s, b)
            return (p, s), loss

        (params, opt_state), losses = _j.lax.scan(
            body, (params, opt_state), None, length=inner)
        return params, opt_state, losses[-1]

    bs = [batch(0.0), batch(0.5)]
    p, s = params, opt_state
    for b in bs:
        p, s, loss = run_k(p, s, b)
    _ = float(loss)
    ts, seen = [], []
    for i in range(outer):
        t0 = time.perf_counter()
        p, s, loss = run_k(p, s, bs[i % 2])
        lv = float(loss)
        ts.append((time.perf_counter() - t0) / inner)
        seen.append(lv)
    assert len(set(seen)) == len(seen), seen
    return n / sorted(ts)[len(ts) // 2]


def measure_render(n_dev, rays_per_dev, cfg, inner, outer, backend,
                   chunk=None):
    """Weak-scaling of the mesh-sharded RENDER step (BASELINE config 5:
    rays sharded across the mesh, frame reassembled by all_gather —
    parallel/render_step.py)."""
    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import init_mlp
    from lomanerf_tpu.parallel import data_mesh, shard_ray_chunks, \
        sharded_render_fn

    mesh = data_mesh(jax.devices()[:n_dev])
    params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels,
                      cfg.out_channels, cfg.num_layers, cfg.filter_size,
                      init=cfg.init)
    n = rays_per_dev * n_dev
    chunk = chunk or max(rays_per_dev // 2, 128)
    rng = np.random.default_rng(0)
    oc, dc, _ = shard_ray_chunks(
        mesh, rng.standard_normal((n, 3)), rng.standard_normal((n, 3)),
        chunk)
    n_pad = oc.shape[0] * chunk
    render = sharded_render_fn(cfg, mesh, backend=backend)

    @jax.jit
    def run_k(salt):
        def frame(acc, i):
            cols = render(
                params, oc * (1.0 + salt + 1e-4 * i.astype(jnp.float32)), dc
            )
            return acc + jnp.mean(cols), None

        acc, _ = jax.lax.scan(frame, jnp.float32(0.0),
                              jnp.arange(inner, dtype=jnp.int32))
        return acc

    _ = float(run_k(jnp.float32(0.0)))
    _ = float(run_k(jnp.float32(0.3)))
    ts, seen = [], []
    for i in range(outer):
        t0 = time.perf_counter()
        v = float(run_k(jnp.float32(0.05 * (i + 1))))
        ts.append((time.perf_counter() - t0) / inner)
        seen.append(v)
    assert len(set(seen)) == len(seen), seen
    return n_pad / sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays-per-dev", type=int, default=8192)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--rung", default="train", choices=["train", "render"],
                    help="train step weak-scaling, or the mesh-sharded "
                         "render (BASELINE config 5) — the day N>=2 chips "
                         "exist, one command per rung produces both "
                         "scaling numbers")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu BEFORE the first device query: the ambient
    # sitecustomize imports jax pinned at the real TPU, so the env var alone
    # is too late (CLAUDE.md) — mirror __graft_entry__.dryrun_multichip
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from lomanerf_tpu.models import NeRFConfig

    cfg = NeRFConfig.small() if args.rung == "train" else NeRFConfig.full()
    fn = measure if args.rung == "train" else measure_render
    n_dev = jax.device_count()
    platform = jax.devices()[0].platform
    r1 = fn(1, args.rays_per_dev, cfg, args.inner, args.outer, args.backend)
    if n_dev == 1:
        print(json.dumps({"rung": args.rung, "devices": 1,
                          "rays_per_s": round(r1, 1),
                          "note": "single device; scaling needs N>1"}))
        return
    rN = fn(n_dev, args.rays_per_dev, cfg, args.inner, args.outer,
            args.backend)
    eff = (rN / r1) / n_dev
    print(json.dumps({
        "rung": args.rung,
        "devices": n_dev,
        "rays_per_s_1dev": round(r1, 1),
        "rays_per_s_Ndev": round(rN, 1),
        "weak_scaling_efficiency": round(eff, 3),
        "hardware_number": platform == "tpu",
        "note": ("" if platform == "tpu" else
                 "virtual CPU mesh shares host cores; harness check only"),
    }))


if __name__ == "__main__":
    main()
