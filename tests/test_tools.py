"""Tests for observability utils, video assembly, and model helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lomanerf_tpu.utils import cost_analysis, dump_hlo, print_lowered


def test_dump_hlo_and_cost(tmp_path):
    def f(x):
        return jnp.sin(x) @ x.T

    x = jnp.ones((8, 8))
    text = dump_hlo(f, x, path=str(tmp_path / "hlo.txt"))
    assert "fusion" in text or "dot" in text or "HloModule" in text
    assert os.path.exists(tmp_path / "hlo.txt")
    lowered = print_lowered(f, x)
    assert "stablehlo" in lowered or "func" in lowered
    cost = cost_analysis(f, x)
    assert cost is None or isinstance(cost, dict)


def test_make_video_from_frames(tmp_path):
    from PIL import Image

    from lomanerf_tpu.train import make_video

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):
        arr = (np.random.default_rng(i).random((16, 16, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(frames / f"{i}.png")
    out = tmp_path / "out.mp4"
    make_video.main(["--frames", str(frames), "--out", str(out), "--fps", "5"])
    gif = tmp_path / "out.gif"  # falls back to gif without ffmpeg
    written = out if out.exists() else gif
    assert written.exists() and written.stat().st_size > 0


def test_render_image_chunked(rng):
    """Model-level chunked full-image render (the reference's eval loop)."""
    from lomanerf_tpu.core import normalized_intrinsics
    from lomanerf_tpu.models import NeRFConfig, NeRFModel

    cfg = NeRFConfig(num_samples=4, filter_size=8)
    model = NeRFModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    K = normalized_intrinsics(1.1)
    img = model.render_image(params, K, jnp.eye(4), img_size=8, chunk=16)
    assert img.shape == (8, 8, 3)
    assert bool(jnp.isfinite(img).all())
