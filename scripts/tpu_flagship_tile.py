"""Flagship (8x256 bf16 S=128) train-kernel ray-tile probe.

pick_tile_rays' conservative 6 MB budget picks R=8 (rows=1024).  This
monkeypatches the choice to try larger tiles — if Mosaic compiles them,
bigger matmuls amortize per-tile fixed cost (4 us of 28 us/tile).
Run solo.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lomanerf_tpu.core import init_mlp, sample_along_rays
from lomanerf_tpu.models import NeRFConfig
from lomanerf_tpu.ops import fused_nerf, pallas_utils as pu

cfg = NeRFConfig.full()
params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size)
rng = np.random.default_rng(215)
N = 16384
o = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
_, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
tg = jnp.asarray(rng.random((N, 3)), jnp.float32)
K = 10

orig_pick = pu.pick_tile_rays
for R in (8, 16, 32):
    pu.pick_tile_rays = lambda *a, **k: R
    fused_nerf._make_train_fn_W.cache_clear()

    @jax.jit
    def run_k(salt):
        def body(acc, _):
            loss, _ = jax.value_and_grad(
                lambda w: fused_nerf.nerf_train_loss(
                    w, o * (1.0 + acc), d, t, dists, tg, cfg)
            )(params)
            return acc + jnp.float32(1e-4) + loss * 1e-20, loss
        _, losses = jax.lax.scan(body, salt, None, length=K)
        return losses[-1]

    try:
        _ = float(run_k(jnp.float32(0.0)))
        _ = float(run_k(jnp.float32(0.5)))
    except Exception as e:
        print(f"R={R:3d}: FAILED {str(e)[:600]}", flush=True)
        continue
    ts, seen = [], []
    for i in range(4):
        t0 = time.perf_counter()
        lv = float(run_k(jnp.float32(0.1 * (i + 1))))
        ts.append((time.perf_counter() - t0) / K)
        seen.append(lv)
    assert len(set(seen)) == len(seen), (R, seen)
    med = sorted(ts)[len(ts) // 2]
    print(f"R={R:3d}: {med*1e3:7.2f} ms/step ({N/med/1e3:7.1f} Krays/s)",
          flush=True)
pu.pick_tile_rays = orig_pick
