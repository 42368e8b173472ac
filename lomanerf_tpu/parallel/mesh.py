"""Device mesh construction + multi-host initialization.

TPU-native replacement for the reference's entire parallelism surface (the
``@simd``/``atomic_add``/tasksys.cpp stack, SURVEY.md §2.2): rays are data-
parallel across a ``Mesh`` axis, optionally with a tensor-parallel axis for
wide-MLP configs; gradient reduction is ``lax.psum`` over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh.

    ``dp=None`` uses all remaining devices for data parallelism.  The data
    axis is the outer (slowest) axis so that the model axis maps to
    nearest-neighbor ICI links on real slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"dp*tp={dp * tp} exceeds {n} devices")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D all-data-parallel mesh."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("data",))


def initialize_multihost(coordinator: Optional[str] = None) -> None:
    """Multi-host init (jax.distributed).  No-op on a single host / when the
    environment already initialized (e.g. TPU pod runtime)."""
    if jax.process_count() > 1:
        return
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def ray_sharding(mesh: Mesh, axis: str = "data"):
    """Shard the leading (ray) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of per-host arrays with rays sharded on ``axis``."""
    s = ray_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
