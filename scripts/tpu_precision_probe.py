"""On-chip accuracy + speed of the matmul-precision tiers for the narrow
(parity-shape) s-major train kernel.

fp32 HIGHEST is the parity mode (allclose to the loma oracle); this
measures what "high" (bf16x3) and "default" (single bf16 pass) buy in
step time and cost in gradient accuracy, all vs HIGHEST on the same
batch.  Run solo.
"""
import json
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

cfg = NeRFConfig.small()
params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size)
rng = np.random.default_rng(0)
n = 8192
o = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
_, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
tg = jnp.asarray(rng.random((n, 3)), jnp.float32)

def run(prec):
    f = jax.jit(jax.value_and_grad(
        lambda p: fused_nerf._nerf_train_loss_S(
            p, o, d, t, dists, tg, cfg, 128, prec, "float32", 40)))
    loss, g = f(params)
    return float(loss), jax.device_get(g)

base_loss, base_g = run(True)
print(json.dumps({"tier": "highest", "loss": base_loss}))
for tier in ("high", "default"):
    loss, g = run(tier)
    rel = max(
        float(np.max(np.abs(a - b) / (np.abs(b).max() + 1e-12)))
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(base_g))
    )
    print(json.dumps({
        "tier": tier,
        "loss": loss,
        "loss_rel_err": abs(loss - base_loss) / abs(base_loss),
        "grad_max_rel_err_vs_gradmax": rel,
    }))
