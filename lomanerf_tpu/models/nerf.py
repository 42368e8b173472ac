"""NeRF model family: a radiance-field MLP + volume renderer.

Configs cover the BASELINE.json ladder:
  * ``small()``   — the reference parity config: 3 layers x width 30,
    pos-enc n=5 (in 33), 30 samples/ray, near/far 2/6
    (/root/reference/train_nerf.py:189-203)
  * ``single_view_64()`` — 64 samples/ray, 4-layer MLP (BASELINE config #3)
  * ``full()``    — 8 layers x width 256, 128 samples/ray (BASELINE #4/#5)

The model is functional: ``init`` makes a params pytree, ``render_rays`` /
``loss`` evaluate it.  ``backend="jnp"`` uses the semantic core;
``backend="pallas"`` routes to the fused TPU kernels in ``lomanerf_tpu.ops``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from lomanerf_tpu.core import encoding, losses, mlp, pipeline, rays


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    num_layers: int = 3
    filter_size: int = 30
    out_channels: int = 4
    num_encoding_functions: int = 5
    num_samples: int = 30
    near: float = 2.0
    far: float = 6.0
    mode: str = "loma"  # transmittance mode: "loma" (reference parity) | "standard"
    init: str = "he"
    dtype: Any = jnp.float32  # parameter dtype
    compute_dtype: str = "float32"  # kernel matmul dtype ("bfloat16" = perf)
    precision: str = "highest"  # jnp-path matmul precision ("default" = perf;
    # HIGHEST-precision wide graphs also compile pathologically slowly)

    @property
    def jnp_precision(self):
        import jax

        return {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[self.precision]

    @property
    def in_channels(self) -> int:
        return encoding.encoded_dim(3, self.num_encoding_functions)

    # ---- the BASELINE.json config ladder ----
    @staticmethod
    def preset(name: str) -> "NeRFConfig":
        """Ladder preset by name — the ONE registry the drivers
        (train_nerf --preset, make_video --preset) and bench share."""
        return {
            "small": NeRFConfig.small,
            "single64": NeRFConfig.single_view_64,
            "full": NeRFConfig.full,
        }[name]()

    @staticmethod
    def small() -> "NeRFConfig":
        # production precision for the parity-shape config: "high" (bf16x3
        # 3-pass matmuls — Mosaic lacks Precision.HIGH, ops.fused_nerf
        # emulates it) passes the oracle-parity gate at the gate's own
        # tolerances (tests/test_parity_oracle.py::
        # test_nerf_fused_high_tier_grad_parity; on-chip grads within
        # ~1e-4 of fp32 HIGHEST, artifacts/r4_precision_tiers.log) at
        # 27.2 -> 20.0 ms per 262k-ray step.  Plain NeRFConfig() keeps
        # precision="highest" for exact-arithmetic parity work.
        return NeRFConfig(precision="high")

    @staticmethod
    def single_view_64() -> "NeRFConfig":
        return NeRFConfig(num_layers=4, filter_size=64, num_samples=64,
                          precision="high")

    @staticmethod
    def full() -> "NeRFConfig":
        # init="nerf": deep radiance MLPs at plain He init start with a
        # dead density head ~half the time (all-zero gradients — see
        # core.mlp.init_mlp and artifacts/r5_flagship_gradcheck.log); the
        # fog-start init trains (r5_headinit_check2.log: loss 287 -> 1.5
        # over 300 fused-bf16 Adam steps on one batch)
        return NeRFConfig(
            num_layers=8, filter_size=256, num_samples=128, mode="standard",
            compute_dtype="bfloat16", precision="default", init="nerf",
        )


class NeRFModel:
    def __init__(self, config: NeRFConfig, backend: str = "jnp"):
        self.config = config
        if backend == "auto":
            from lomanerf_tpu.train.steps import resolve_backend

            backend = resolve_backend(config, backend)
        self.backend = backend
        self._render_steps = {}  # mesh -> jitted sharded render step

    def init(self, key: jax.Array) -> mlp.Params:
        c = self.config
        return mlp.init_mlp(
            key,
            c.in_channels,
            c.out_channels,
            c.num_layers,
            c.filter_size,
            init=c.init,
            dtype=c.dtype,
        )

    def sample(self, origins, directions, key: Optional[jax.Array] = None):
        c = self.config
        return rays.sample_along_rays(
            origins, directions, c.near, c.far, c.num_samples, key=key
        )

    def render_rays(self, params, origins, directions, t_vals, dists) -> jnp.ndarray:
        c = self.config
        if self.backend == "pallas":
            from lomanerf_tpu.ops import fused_nerf

            return fused_nerf.render_rays(
                params, origins, directions, t_vals, dists, c
            )
        return pipeline.nerf_render_rays(
            params,
            origins,
            directions,
            t_vals,
            dists,
            num_functions=c.num_encoding_functions,
            mode=c.mode,
        )

    def loss(self, params, origins, directions, t_vals, dists, target) -> jnp.ndarray:
        pred = self.render_rays(params, origins, directions, t_vals, dists)
        return losses.sum_mse(pred, target)

    def render_image(
        self, params, K, c2w, img_size: int, chunk: int = 4096, mesh=None
    ) -> jnp.ndarray:
        """Chunked full-image render (the reference renders view 2 every 25
        iters chunk-by-chunk, train_nerf.py:558-712).

        All chunks run inside ONE jit via ``lax.scan``: a Python chunk loop
        pays one dispatch round-trip per chunk (~32 ms through this
        environment's device relay — 157 sequential RTTs for an 800x800
        render), whereas the scan costs a single dispatch.

        With ``mesh``, the chunk list is sharded over the mesh's ``data``
        axis (BASELINE config 5: rays sharded across chips/hosts) and the
        frame reassembled by a tiled all-gather — see
        ``parallel.render_step``."""
        if mesh is not None:
            from lomanerf_tpu.parallel import render_step

            step = self._render_steps.get(mesh)
            if step is None:
                step = render_step.make_render_step(
                    self.config, mesh, backend=self.backend
                )
                self._render_steps[mesh] = step
            return render_step.sharded_render_image(
                params, K, c2w, img_size, mesh, step, chunk=chunk
            )
        o, d = rays.get_rays(img_size, img_size, K, c2w)
        n = o.shape[0]
        pad = (-n) % chunk
        oc = jnp.pad(o, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        dc = jnp.pad(d, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        cols = _render_chunks(self.config, self.backend, params, oc, dc)
        return cols[:n].reshape(img_size, img_size, 3)


def render_chunk(config: NeRFConfig, backend: str, params, o, d):
    """Render one (chunk, 3) ray block: sample depths, then the fused TPU
    render kernel (``backend="pallas"``) or the jnp pipeline.  Shared by the
    single-device chunk scan below and the mesh-sharded render step
    (parallel/render_step.py)."""
    _, tv, dists = rays.sample_along_rays(
        o, d, config.near, config.far, config.num_samples
    )
    if backend == "pallas":
        from lomanerf_tpu.ops import fused_nerf

        return fused_nerf.render_rays(params, o, d, tv, dists, config)
    return pipeline.nerf_render_rays(
        params, o, d, tv, dists,
        num_functions=config.num_encoding_functions,
        mode=config.mode,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _render_chunks(config: NeRFConfig, backend: str, params, oc, dc):
    """Scan the per-chunk render over all (num_chunks, chunk, 3) ray blocks
    inside one compiled program (one device dispatch per image)."""

    def body(_, od):
        o, d = od
        return None, render_chunk(config, backend, params, o, d)

    _, cols = jax.lax.scan(body, None, (oc, dc))
    return cols.reshape(-1, 3)


def count_params(params: mlp.Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
