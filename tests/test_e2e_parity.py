"""End-to-end training-loop parity vs the reference (oracle-driven).

Replays the reference's exact fit_img.py training procedure — per chunk:
grad with the previous loss as the adjoint seed (fit_img.py:497), SGD
update (512-513), then forward loss with the UPDATED weights (515-530) —
through the loma oracle, and runs our jitted image-fit step with
--parity-seed semantics on the same data.  Weights must track allclose
across steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lomanerf_tpu.core import positional_encoding
from lomanerf_tpu.models import ImageFieldConfig
from lomanerf_tpu.parity import oracle
from lomanerf_tpu.train import loma_sgd
from lomanerf_tpu.train.steps import make_image_fit_step

pytestmark = pytest.mark.skipif(
    not oracle.oracle_available(), reason="reference loma compiler not present"
)


def test_train_nerf_training_loop_parity(rng):
    """Replay the reference's NeRF training procedure (train_nerf.py:
    275-499) — per chunk: forward loss at CURRENT weights, grad with
    ``_dreturn = losses[-1]`` (the loss just computed, 477), then the
    double-bias-corrected Adam update (133-161) — via the oracle, and track
    the weight trajectory with our jitted loss-seeded vjp step + loma_adam."""
    import optax

    from lomanerf_tpu.core.pipeline import nerf_loss
    from lomanerf_tpu.train import loma_adam

    n_rays, chunk, S, steps, lr = 8, 4, 6, 3, 5e-4
    sizes = [(33, 30), (30, 30), (30, 4)]
    ws = [rng.standard_normal(s).astype(np.float32) * 0.3 for s in sizes]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in sizes]
    pts = rng.standard_normal((n_rays, S, 3)).astype(np.float32)
    enc = np.asarray(positional_encoding(jnp.asarray(pts), 5))  # (N, S, 33)
    target = rng.random((n_rays, 3)).astype(np.float32)
    t = np.linspace(2.0, 6.0, S).astype(np.float32)
    dists = np.tile(np.concatenate([t[1:] - t[:-1], [1e8]]),
                    (n_rays, 1)).astype(np.float32)

    # --- reference procedure via the oracle + its Adam formula ---
    ws_o = [w.copy() for w in ws]
    bs_o = [b.copy() for b in bs]
    m_w = [np.zeros_like(w) for w in ws]
    v_w = [np.zeros_like(w) for w in ws]
    m_b = [np.zeros_like(b) for b in bs]
    v_b = [np.zeros_like(b) for b in bs]
    tstep = 0
    b1, b2, eps = 0.9, 0.999, 1e-8
    for _ in range(steps):
        for lo in range(0, n_rays, chunk):
            sl = slice(lo, lo + chunk)
            enc_c = enc[sl].reshape(-1, 33)
            loss = oracle.nerf_forward(enc_c, ws_o, bs_o, target[sl],
                                       dists[sl])[0]
            d_ws, d_bs, _ = oracle.nerf_grad(enc_c, ws_o, bs_o, target[sl],
                                             dists[sl], seed=loss)
            # reference AdamOptimizer.update (train_nerf.py:143-161):
            # double bias correction, t incremented per chunk call
            tstep += 1
            lr_t = lr * (np.sqrt(1 - b2**tstep) / (1 - b1**tstep))

            def adam(p, g, m, v):
                m[:] = b1 * m + (1 - b1) * g
                v[:] = b2 * v + (1 - b2) * g * g
                m_hat = m / (1 - b1**tstep)
                v_hat = v / (1 - b2**tstep)
                return p - lr_t * m_hat / (np.sqrt(v_hat) + eps)

            ws_o = [adam(p, g, m, v) for p, g, m, v in
                    zip(ws_o, d_ws, m_w, v_w)]
            bs_o = [adam(p, g, m, v) for p, g, m, v in
                    zip(bs_o, d_bs, m_b, v_b)]

    # --- our loop: jitted loss-seeded vjp + loma_adam ---
    params = {"w": [jnp.asarray(w) for w in ws],
              "b": [jnp.asarray(b) for b in bs]}
    opt = loma_adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, enc_c, tgt_c, dists_c):
        loss, vjp = jax.vjp(
            lambda p: nerf_loss(p, enc_c, dists_c, tgt_c, mode="loma"),
            params,
        )
        (grads,) = vjp(loss)  # the reference's loss-valued _dreturn seed
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    je, jt_, jd = jnp.asarray(enc), jnp.asarray(target), jnp.asarray(dists)
    for _ in range(steps):
        for lo in range(0, n_rays, chunk):
            sl = slice(lo, lo + chunk)
            params, opt_state, _ = step(params, opt_state, je[sl], jt_[sl],
                                        jd[sl])

    for got, want in zip(params["w"], ws_o):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-4)
    for got, want in zip(params["b"], bs_o):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-4)


def test_fit_image_training_loop_parity(rng):
    img_size, chunk, steps, lr = 16, 64, 3, 1e-3
    n_px = img_size * img_size
    sizes = [(22, 16), (16, 16), (16, 3)]
    ws = [rng.standard_normal(s).astype(np.float32) * 0.3 for s in sizes]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in sizes]
    c = np.linspace(0, 1, img_size, dtype=np.float32)
    ii, jj = np.meshgrid(c, c)
    coords = np.stack([ii.ravel(), jj.ravel()], axis=-1)
    enc = np.asarray(positional_encoding(jnp.asarray(coords), 5))
    target = rng.random((n_px, 3)).astype(np.float32)

    # --- reference procedure via the oracle ---
    ws_o = [w.copy() for w in ws]
    bs_o = [b.copy() for b in bs]
    prev_loss = 0.0
    for _ in range(steps):
        for lo in range(0, n_px, chunk):
            sl = slice(lo, lo + chunk)
            d_ws, d_bs, _ = oracle.mlp_fit_grad(
                enc[sl], ws_o, bs_o, target[sl], seed=prev_loss
            )
            ws_o = [w - lr * g for w, g in zip(ws_o, d_ws)]
            bs_o = [b - lr * g for b, g in zip(bs_o, d_bs)]
            prev_loss = oracle.mlp_fit_forward(enc[sl], ws_o, bs_o, target[sl])

    # --- our jitted step with the same seed/update/loss ordering ---
    # (grad at seed, update, then loss of UPDATED params: our step computes
    # loss and grad at the same params, so emulate the reference ordering by
    # feeding the seed stream explicitly and reading next step's loss)
    cfg = ImageFieldConfig(img_size=img_size)
    params = {"w": [jnp.asarray(w) for w in ws],
              "b": [jnp.asarray(b) for b in bs]}
    opt = loma_sgd(lr)
    opt_state = opt.init(params)
    step = make_image_fit_step(cfg, opt, donate=False)
    jc = jnp.asarray(coords)
    jt = jnp.asarray(target)
    prev = 0.0
    for _ in range(steps):
        for lo in range(0, n_px, chunk):
            sl = slice(lo, lo + chunk)
            params, opt_state, loss_pre = step(params, opt_state, jc[sl],
                                               jt[sl], prev)
            # reference's recorded loss is POST-update on the same chunk
            from lomanerf_tpu.models import ImageFieldModel

            prev = float(
                ImageFieldModel(cfg).loss(params, jc[sl], jt[sl])
            )

    for got, want in zip(params["w"], ws_o):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-4)
    for got, want in zip(params["b"], bs_o):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-4)
