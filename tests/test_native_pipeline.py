"""Native C++ ray-batch pipeline tests: numpy-parity + semantics."""

import numpy as np
import pytest

from lomanerf_tpu.data.native import RayBatchPipeline, load_native


def _toy_dataset(rng, v=3, size=8):
    poses = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    for i in range(v):
        th = 2 * np.pi * i / v
        poses[i, :3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32,
        )
        poses[i, :3, 3] = [np.cos(th) * 4, np.sin(th) * 4, 0.5]
    images = rng.random((v, size, size, 3)).astype(np.float32)
    return poses, images


def test_numpy_fallback_batches(rng):
    poses, images = _toy_dataset(rng)
    pipe = RayBatchPipeline(poses, images, focal=1.2, n_rays=32,
                            num_samples=8, near=2.0, far=6.0, seed=7,
                            force_numpy=True)
    o, d, toff, tgt = pipe.next_batch()
    assert o.shape == (32, 3) and toff.shape == (32,)
    # unjittered: zero offsets; static depth comb with the 1e8 sentinel
    np.testing.assert_array_equal(toff, 0.0)
    assert pipe.t_base.shape == (8,) and pipe.dists.shape == (8,)
    np.testing.assert_allclose(pipe.t_base,
                               np.linspace(2.0, 6.0, 8), rtol=1e-6)
    np.testing.assert_allclose(pipe.dists[:-1], 4.0 / 7, rtol=1e-6)
    assert pipe.dists[-1] == 1e8
    # all origins equal (one view per batch) and match some pose translation
    assert np.allclose(o, o[0])
    assert any(np.allclose(o[0], poses[i, :3, 3]) for i in range(3))
    # targets are real pixels from the chosen view's image
    assert tgt.min() >= 0 and tgt.max() <= 1


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
def test_native_matches_numpy(rng):
    poses, images = _toy_dataset(rng)
    kw = dict(focal=1.2, n_rays=64, num_samples=10, near=2.0, far=6.0,
              seed=42, queue_depth=2, stratified=True)
    nat = RayBatchPipeline(poses, images, n_threads=1, **kw)
    ref = RayBatchPipeline(poses, images, force_numpy=True, **kw)
    assert nat.is_native
    np.testing.assert_allclose(nat.t_base, ref.t_base, rtol=1e-7)
    np.testing.assert_allclose(nat.dists, ref.dists, rtol=1e-7)
    # single producer thread -> identical deterministic batch sequence
    for _ in range(3):
        got = nat.next_batch()
        want = ref.next_batch()
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)
    nat.close()


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
def test_native_stratified_and_throughput(rng):
    poses, images = _toy_dataset(rng)
    S = 32
    pipe = RayBatchPipeline(poses, images, focal=1.2, n_rays=4096,
                            num_samples=S, near=2.0, far=6.0, seed=1,
                            stratified=True, n_threads=4, queue_depth=4)
    bin_w = 4.0 / S
    toff_prev = None
    for _ in range(8):
        o, d, toff, tgt = pipe.next_batch()
        assert np.isfinite(o).all() and np.isfinite(toff).all()
        # offsets land within one stratum width; per-ray depths t_base+toff
        # stay inside [near, far + bin]
        assert (toff >= 0).all() and (toff <= bin_w + 1e-6).all()
        # stratified jitter: offsets vary across rays and across batches
        assert np.unique(toff).size > 1
        if toff_prev is not None:
            assert not np.array_equal(toff, toff_prev)
        toff_prev = toff
    pipe.close()
