"""On-chip check: stratified training now matches the uniform fast path.

Round 3 left --stratified and --pipeline native/numpy on the slow round-2
layouts (per-ray (N, S) depths paid ~15.5 ms/262k-ray XLA input prep).
Round 4 folds the per-ray comb-shift jitter into the ORIGINS, so depths
stay (S,) and every mode takes the s-major kernels.  This measures the
parity-config train step (262,144 rays, S=30, 33->30->30->4) for:

  * uniform:     unjittered batch (the round-3 27.0 ms path)
  * stratified:  per-ray offsets folded into origins (same shapes)

and asserts the stratified step is within 10% of uniform (VERDICT r3 #2
done-criterion), plus a correctness probe: fused loss at folded origins ==
jnp pipeline at explicit per-ray depths.

Run solo (one TPU client at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lomanerf_tpu.core import init_mlp, sample_along_rays, \
    stratified_ray_offsets
from lomanerf_tpu.core.pipeline import nerf_loss_rays
from lomanerf_tpu.models import NeRFConfig
from lomanerf_tpu.ops import fused_nerf
from lomanerf_tpu.train.steps import make_single_chip_train_step

cfg = NeRFConfig.small()
N, S = 262144, cfg.num_samples
params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size)
opt = optax.adam(5e-4)
opt_state = opt.init(params)
rng = np.random.default_rng(0)


def make_batch(stratified, key):
    o = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    if stratified:
        dt = stratified_ray_offsets(key, N, cfg.near, cfg.far, S)
        o = o + d * dt[:, None]
    _, t_vals, dists = sample_along_rays(o, d, cfg.near, cfg.far, S)
    tgt = jnp.asarray(rng.random((N, 3)), jnp.float32)
    return o, d, t_vals, dists, tgt


step = make_single_chip_train_step(cfg, opt, backend="pallas", donate=False)
K = 20


@jax.jit
def run_k(params, opt_state, batch):
    def body(carry, _):
        p, s = carry
        p, s, loss = step(p, s, *batch)
        return (p, s), loss
    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), None, length=K)
    return params, opt_state, losses[-1]


def time_mode(tag, stratified):
    batches = [make_batch(stratified, jax.random.PRNGKey(17 + i))
               for i in range(2)]
    p, s = params, opt_state
    for b in batches:
        p, s, loss = run_k(p, s, b)
    _ = float(loss)
    times, seen = [], []
    for i in range(8):
        t0 = time.perf_counter()
        p, s, loss = run_k(p, s, batches[i % 2])
        lv = float(loss)
        times.append((time.perf_counter() - t0) / K)
        seen.append(lv)
    assert len(set(seen)) == len(seen), seen
    ms = sorted(times)[len(times) // 2] * 1e3
    print(json.dumps({"mode": tag, "ms_per_step": round(ms, 2),
                      "rays_per_s": round(N / ms * 1e3, 1)}))
    return ms


# correctness probe first (tiny): folded-origin fused loss == jnp pipeline
# at explicit per-ray depths
n = 256
o = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
tgt = jnp.asarray(rng.random((n, 3)), jnp.float32)
dt = stratified_ray_offsets(jax.random.PRNGKey(3), n, cfg.near, cfg.far, S)
_, t_base, dists = sample_along_rays(o, d, cfg.near, cfg.far, S)
lf = fused_nerf.nerf_train_loss(params, o + d * dt[:, None], d, t_base,
                                dists, tgt, cfg)
lj = nerf_loss_rays(params, o, d, t_base[None] + dt[:, None],
                    jnp.broadcast_to(dists, (n, S)), tgt,
                    cfg.num_encoding_functions, cfg.mode)
err = abs(float(lf) - float(lj)) / abs(float(lj))
print(json.dumps({"probe": "stratified_fused_vs_jnp_perray",
                  "rel_err": float(f"{err:.2e}")}))
assert err < 1e-4, err

ms_u = time_mode("uniform", False)
ms_s = time_mode("stratified", True)
ratio = ms_s / ms_u
print(json.dumps({"stratified_over_uniform": round(ratio, 4),
                  "within_10pct": bool(ratio < 1.10)}))
assert ratio < 1.10, ratio
print("STRATIFIED CHECK PASSED")
