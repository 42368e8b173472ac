"""Can single64 (S=64, 4x64, ps=64) take the s-major kernel at R=128?

_pick_tile_S's conservative model says 21 MB > budget, but the parity
config's tile 256 (est 11 MB) compiles fine — the model is ~2x
conservative.  This forces the s-major kernel for single64 and times it
against the production dispatch (transposed ray-major).  Run solo.
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
from lomanerf_tpu.ops import fused_nerf

cfg = NeRFConfig.single_view_64()
params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size)
rng = np.random.default_rng(215)
N = 65536
o = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
_, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
tg = jnp.asarray(rng.random((N, 3)), jnp.float32)
K = 10

def timeit(tag, loss_fn):
    @jax.jit
    def run_k(salt):
        def body(acc, _):
            loss, _ = jax.value_and_grad(
                lambda w: loss_fn(w, o * (1.0 + acc)))(params)
            return acc + jnp.float32(1e-4) + loss * 1e-20, loss
        _, losses = jax.lax.scan(body, salt, None, length=K)
        return losses[-1]
    try:
        _ = float(run_k(jnp.float32(0.0)))
        _ = float(run_k(jnp.float32(0.5)))
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:500]}", flush=True)
        return
    ts, seen = [], []
    for i in range(4):
        t0 = time.perf_counter()
        lv = float(run_k(jnp.float32(0.1 * (i + 1))))
        ts.append((time.perf_counter() - t0) / K)
        seen.append(lv)
    assert len(set(seen)) == len(seen), (tag, seen)
    med = sorted(ts)[len(ts) // 2]
    print(f"{tag}: {med*1e3:7.2f} ms/step ({N/med/1e6:5.2f} Mrays/s)",
          flush=True)

timeit("dispatch (transposed T)",
       lambda w, oo: fused_nerf.nerf_train_loss(w, oo, d, t, dists, tg, cfg))
timeit("forced s-major R=128",
       lambda w, oo: fused_nerf._nerf_train_loss_S(
           w, oo, d, t, dists, tg, cfg, 128,
           getattr(cfg, "precision", "highest"), "float32", 64))
timeit("forced s-major R=128 remat_enc",
       lambda w, oo: fused_nerf._nerf_train_loss_S(
           w, oo, d, t, dists, tg, cfg, 128,
           getattr(cfg, "precision", "highest"), "float32", 64,
           "remat_enc"))
timeit("forced s-major R=64",
       lambda w, oo: fused_nerf._nerf_train_loss_S(
           w, oo, d, t, dists, tg, cfg, 64,
           getattr(cfg, "precision", "highest"), "float32", 64))
timeit("forced s-major R=64 remat_enc",
       lambda w, oo: fused_nerf._nerf_train_loss_S(
           w, oo, d, t, dists, tg, cfg, 64,
           getattr(cfg, "precision", "highest"), "float32", 64,
           "remat_enc"))
