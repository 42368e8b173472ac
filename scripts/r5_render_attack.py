"""Round-5 pod-render attack (VERDICT r4 next #2): ablate tile size and
grid semantics on the flagship render forward.  Variants selected by argv:
  base | r16 | par | r16par
Timed like bench.py's render rung (RTT-amortized scan of frames)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "base"

import jax, jax.numpy as jnp
from lomanerf_tpu.core import init_mlp
from lomanerf_tpu.models import NeRFConfig
from lomanerf_tpu.ops import fused_nerf, pallas_utils as pu

if "r16" in variant:
    _orig = pu.pick_tile_rays
    pu.pick_tile_rays = lambda *a, **k: 16
if "par" in variant:
    _tc = pu.tiled_call
    def _tc_par(kernel, n_tiles, in_specs, out_specs, out_shape, cost=None,
                parallel=False):
        # forward-only experiment: render forward has one (non-list)
        # out_spec; train/backward have list outputs (dW accumulation)
        fwd_only = not isinstance(out_shape, (list, tuple))
        return _tc(kernel, n_tiles, in_specs, out_specs, out_shape, cost,
                   parallel=fwd_only)
    pu.tiled_call = _tc_par

cfg = NeRFConfig.full()
n = 65536
chunk = 65536
from lomanerf_tpu.core import sample_along_rays
params = init_mlp(jax.random.PRNGKey(0), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size, init=cfg.init)
rng = np.random.default_rng(0)
o = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
_, tv, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)

K = 6

@jax.jit
def run_k(salt):
    def frame(acc, i):
        col = fused_nerf.render_rays(
            params, o * (1.0 + salt + 1e-4 * i.astype(jnp.float32)), d,
            tv, dists, cfg)
        return acc + jnp.mean(col), None
    acc, _ = jax.lax.scan(frame, jnp.float32(0.0),
                          jnp.arange(K, dtype=jnp.int32))
    return acc

_ = float(run_k(jnp.float32(0.0)))
_ = float(run_k(jnp.float32(0.3)))
times, seen = [], []
for i in range(8):
    t0 = time.perf_counter()
    v = float(run_k(jnp.float32(0.05 * (i + 1))))
    times.append((time.perf_counter() - t0) / K)
    seen.append(v)
assert len(set(seen)) == len(seen), seen
ms = sorted(times)[len(times) // 2] * 1e3
print(f"variant {variant}: {ms:.2f} ms / {n} rays = {n / (ms / 1e3) / 1e3:.0f} K rays/s")
