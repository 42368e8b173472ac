"""Fused Pallas TPU kernels (forward + hand-derived VJPs)."""

from lomanerf_tpu.ops import fused_mlp, fused_nerf, pallas_utils  # noqa: F401
