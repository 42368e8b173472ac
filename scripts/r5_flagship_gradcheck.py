"""Round-5 diagnostic: do the flagship (8x256, S=128, standard-mode, bf16)
fused-kernel gradients match the jnp pipeline, and do a few Adam steps
reduce the loss?  Runs on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp, optax

from lomanerf_tpu.core import init_mlp, sample_along_rays
from lomanerf_tpu.train.steps import nerf_loss_fn
from lomanerf_tpu.models import NeRFConfig
from lomanerf_tpu.ops import fused_nerf

cfg = NeRFConfig.full()
n = 256
params = init_mlp(jax.random.PRNGKey(215), cfg.in_channels, cfg.out_channels,
                  cfg.num_layers, cfg.filter_size)
rng = np.random.default_rng(0)
o = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
_, tv, dists = sample_along_rays(o, d, cfg.near, cfg.far, cfg.num_samples)
tgt = jnp.asarray(rng.random((n, 3)), jnp.float32)

loss_p, grads_p = jax.jit(jax.value_and_grad(
    lambda p: fused_nerf.nerf_train_loss(p, o, d, tv, dists, tgt, cfg)))(params)
loss_j, grads_j = jax.jit(jax.value_and_grad(
    lambda p: nerf_loss_fn(p, o, d, tv, dists, tgt, cfg, "jnp")))(params)
print("loss pallas", float(loss_p), "jnp", float(loss_j))
lp, lj = jax.tree.leaves(grads_p), jax.tree.leaves(grads_j)
for i, (a, b) in enumerate(zip(lp, lj)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    na, nb = np.abs(a).max(), np.abs(b).max()
    err = np.abs(a - b).max() / (nb + 1e-12)
    print(f"leaf {i} shape {a.shape} |pallas|max {na:.3e} |jnp|max {nb:.3e} relerr {err:.3e}")

# does the fused path even train? 50 Adam steps on one batch (should overfit)
opt = optax.adam(5e-4)

@jax.jit
def run50(p, s):
    def body(carry, _):
        p, s = carry
        l, g = jax.value_and_grad(
            lambda p: fused_nerf.nerf_train_loss(p, o, d, tv, dists, tgt, cfg))(p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), l
    (p, s), ls = jax.lax.scan(body, (p, s), None, length=50)
    return p, s, ls

p, s, ls = run50(params, opt.init(params))
ls = np.asarray(ls)
print("fused adam losses:", ls[::5], "first", ls[0], "last", ls[-1])

@jax.jit
def run50j(p, s):
    def body(carry, _):
        p, s = carry
        l, g = jax.value_and_grad(
            lambda p: nerf_loss_fn(p, o, d, tv, dists, tgt, cfg, "jnp"))(p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), l
    (p, s), ls = jax.lax.scan(body, (p, s), None, length=50)
    return p, s, ls

p2, s2, ls2 = run50j(params, opt.init(params))
ls2 = np.asarray(ls2)
print("jnp adam losses:", ls2[::5], "first", ls2[0], "last", ls2[-1])
