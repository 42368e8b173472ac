"""Metrics + image logging.

The reference logs scalar loss to wandb and saves matplotlib triptychs
(target / prediction / loss-or-PSNR curve) to ``logs_2d|logs_3d/*.png``
(fit_img.py:545-558, train_nerf.py:686-700).  Here: same triptychs, a JSONL
metrics stream (always on), and wandb only if installed (it is not baked
into this image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import numpy as np

try:
    import wandb as _wandb

    _HAVE_WANDB = True
except ImportError:  # pragma: no cover
    _HAVE_WANDB = False


class MetricsLogger:
    """JSONL (+ optional wandb) metrics stream.

    Multi-host: only process 0 writes (``primary_only``, default on) —
    every other process gets a no-op logger, so SPMD drivers can log
    unconditionally without N hosts racing on one file."""

    def __init__(self, log_dir: str, project: Optional[str] = None,
                 use_wandb: bool = False, primary_only: bool = True):
        from lomanerf_tpu.parallel import is_primary

        self.active = is_primary() or not primary_only
        self.log_dir = log_dir
        self._f = None
        self._wandb = None
        if not self.active:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_wandb and _HAVE_WANDB:  # pragma: no cover
            self._wandb = _wandb
            self._wandb.init(project=project or "lomanerf-tpu")

    def log(self, step: int, **metrics) -> None:
        if not self.active:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def log_image(self, step: int, key: str, image) -> None:
        """Forward a rendered figure/array/path to wandb (the reference
        logs its triptych figures, train_nerf.py:710 / fit_img.py:557);
        no-op without wandb or on non-primary processes."""
        if not self.active or self._wandb is None:  # pragma: no cover
            return
        self._wandb.log({key: self._wandb.Image(image)},
                        step=step)  # pragma: no cover

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()


def save_triptych(
    path: str,
    target: np.ndarray,
    prediction: np.ndarray,
    curve: Sequence[float],
    curve_label: str = "loss",
) -> None:
    """Target | prediction | metric-curve panel, like the reference's logs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 3, figsize=(15, 5))
    ax[0].imshow(np.clip(np.asarray(target), 0, 1))
    ax[0].set_title("Target")
    ax[1].imshow(np.clip(np.asarray(prediction), 0, 1))
    ax[1].set_title("Prediction")
    ax[2].plot(list(curve))
    ax[2].set_title(curve_label)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
