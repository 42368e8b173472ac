"""Unit tests for core jnp ops against plain-numpy formulations.

Mirrors the reference's tier-1 test shape (loma_public/tests/test.py): small
inputs, analytic/numpy expected values.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lomanerf_tpu.core import (
    accumulate_color,
    encoded_dim,
    get_rays,
    init_mlp,
    mlp_apply,
    normalized_intrinsics,
    positional_encoding,
    psnr,
    render_weights,
    sample_along_rays,
    sum_mse,
)


def test_positional_encoding_block_layout(rng):
    """Layout must match the reference: per-function blocks, identity first
    (pos_encoding.py:20-32)."""
    x = rng.standard_normal((7, 2)).astype(np.float32)
    n = 5
    out = np.asarray(positional_encoding(jnp.asarray(x), num_functions=n))
    assert out.shape == (7, encoded_dim(2, n))
    # identity block
    np.testing.assert_allclose(out[:, :2], x, rtol=1e-6)
    # reproduce the reference's transpose/reshape layout in numpy
    blocks = [x]
    for i in range(n):
        blocks.append(np.sin((2.0**i) * x))
        blocks.append(np.cos((2.0**i) * x))
    ref = np.transpose(np.array(blocks), (1, 0, 2)).reshape(7, -1)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_positional_encoding_3d_shape(rng):
    x = rng.standard_normal((4, 30, 3)).astype(np.float32)
    out = positional_encoding(jnp.asarray(x), num_functions=5)
    assert out.shape == (4, 30, 33)


def test_mlp_apply_matches_numpy(rng):
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, 22, 3, num_layers=3, filter_size=16)
    x = rng.standard_normal((11, 22)).astype(np.float32)
    y = np.asarray(mlp_apply(params, jnp.asarray(x), head="sigmoid"))
    # numpy oracle (mlp_utils.evaluate_mlp semantics)
    h = x
    ws = [np.asarray(w) for w in params["w"]]
    bs = [np.asarray(b) for b in params["b"]]
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b[None, :]
        if i < len(ws) - 1:
            h = np.maximum(h, 0)
        else:
            h = 1.0 / (1.0 + np.exp(-h))
    np.testing.assert_allclose(y, h, rtol=2e-5, atol=2e-6)


def test_mlp_rgba_head(rng):
    key = jax.random.PRNGKey(1)
    params = init_mlp(key, 33, 4, num_layers=3, filter_size=30)
    x = rng.standard_normal((9, 33)).astype(np.float32)
    y = np.asarray(mlp_apply(params, jnp.asarray(x), head="rgba"))
    # density channel is ReLU'd, colors sigmoid'd
    assert (y[:, 3] >= 0).all()
    assert ((y[:, :3] > 0) & (y[:, :3] < 1)).all()


def test_render_weights_loma_inclusive(rng):
    """The loma mode uses INCLUSIVE cumprod with T[0] forced to 1
    (scripts/nerf.py:226-258)."""
    sigma = np.abs(rng.standard_normal((3, 6))).astype(np.float32)
    dists = np.abs(rng.standard_normal((3, 6))).astype(np.float32) + 0.1
    w = np.asarray(render_weights(jnp.asarray(sigma), jnp.asarray(dists), mode="loma"))
    a = 1.0 - np.exp(-sigma * dists)
    c = 1.0 - a + 1e-10
    t = np.cumprod(c, axis=-1)
    t[:, 0] = 1.0
    np.testing.assert_allclose(w, a * t, rtol=1e-5)


def test_render_weights_standard_exclusive(rng):
    sigma = np.abs(rng.standard_normal((3, 6))).astype(np.float32)
    dists = np.full((3, 6), 0.5, dtype=np.float32)
    w = np.asarray(
        render_weights(jnp.asarray(sigma), jnp.asarray(dists), mode="standard")
    )
    a = 1.0 - np.exp(-sigma * dists)
    c = 1.0 - a + 1e-10
    t = np.concatenate([np.ones((3, 1)), np.cumprod(c, axis=-1)[:, :-1]], axis=-1)
    np.testing.assert_allclose(w, a * t, rtol=1e-5)


def test_accumulate_color(rng):
    w = rng.random((5, 4)).astype(np.float32)
    rgb = rng.random((5, 4, 3)).astype(np.float32)
    out = np.asarray(accumulate_color(jnp.asarray(w), jnp.asarray(rgb)))
    np.testing.assert_allclose(out, (w[..., None] * rgb).sum(axis=1), rtol=1e-6)


def test_get_rays_matches_reference_semantics(rng):
    """Reproduce train_nerf.get_rays in numpy and compare."""
    size = 8
    focal = 1.2
    K = np.asarray(normalized_intrinsics(focal))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32
    )
    c2w[:3, 3] = [0.5, -1.0, 2.0]
    o, d = get_rays(size, size, jnp.asarray(K), jnp.asarray(c2w))
    coord = np.linspace(0, 1, size)
    i, j = np.meshgrid(coord, coord, indexing="xy")
    i, j = i.flatten(), j.flatten()
    dirs = np.stack(
        [(i - 0.5) / focal, -(j - 0.5) / focal, -np.ones_like(i)], axis=-1
    )
    dirs = dirs @ c2w[:3, :3].T
    np.testing.assert_allclose(np.asarray(d), dirs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o), np.tile(c2w[:3, 3], (size * size, 1)), rtol=1e-6
    )
    # directions deliberately NOT normalized (reference quirk #4)
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    assert not np.allclose(norms, 1.0)


def test_sample_along_rays_dists_sentinel():
    o = jnp.zeros((4, 3))
    d = jnp.ones((4, 3))
    pts, t, dists = sample_along_rays(o, d, near=2.0, far=6.0, num_samples=30)
    assert pts.shape == (4, 30, 3)
    # unjittered depths are shared by every ray: (S,) — the fused kernels'
    # per-ray-uniform contract
    assert t.shape == (30,) and dists.shape == (30,)
    np.testing.assert_allclose(np.asarray(dists[-1]), 1e8)
    np.testing.assert_allclose(
        np.asarray(dists[:-1]), np.full(29, 4.0 / 29.0), rtol=1e-5
    )
    # stratified jitter keeps samples within bins
    pts2, t2, _ = sample_along_rays(
        o, d, near=2.0, far=6.0, num_samples=30, key=jax.random.PRNGKey(0)
    )
    assert t2.shape == (4, 30)
    assert (np.asarray(t2) >= 2.0).all() and (np.asarray(t2) <= 6.0 + 4.0 / 30).all()


def test_sum_mse_and_psnr(rng):
    a = rng.random((5, 3)).astype(np.float32)
    b = rng.random((5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(sum_mse(jnp.asarray(a), jnp.asarray(b))),
        ((a - b) ** 2).sum(),
        rtol=1e-6,
    )
    expected = 20 * np.log10(1.0 / np.sqrt(((a - b) ** 2).mean()))
    np.testing.assert_allclose(
        float(psnr(jnp.asarray(a), jnp.asarray(b))), expected, rtol=1e-5
    )


def test_generate_random_rays_normalized(rng):
    """The alternative random-pixel sampler (ray_sampling.py:4-41 parity):
    unit directions, origins at the camera translations."""
    import jax

    from lomanerf_tpu.core import generate_random_rays

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    cams = jnp.asarray(np.stack([c2w, c2w]))
    o, d = generate_random_rays(jax.random.PRNGKey(0), (32, 32), 17, cams)
    assert o.shape == (34, 3) and d.shape == (34, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o), np.tile([1, 2, 3], (34, 1)))
