"""Checkpoint / resume (orbax-backed).

The reference's save path is commented out and there is no resume anywhere
(train_nerf.py:559-564, SURVEY.md §5) — this is the actually-wired version:
params + optimizer state + step, with keep-N rotation and latest-step
restore.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with a numpy fallback."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = None
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        state = {"params": params, "opt_state": opt_state}
        if self._mgr is not None:
            # orbax saves are COLLECTIVE in multi-host (every process
            # participates; orbax itself writes from the right hosts)
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        elif jax.process_index() == 0:  # pragma: no cover - numpy fallback
            # the non-collective fallback writes from process 0 only
            flat, _ = jax.tree.flatten(state)
            np.savez(
                os.path.join(self.directory, f"ckpt_{step}.npz"),
                *[np.asarray(x) for x in flat],
            )

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [
            int(f[5:-4])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]
        return max(steps) if steps else None

    def restore(
        self, params_like: Any, opt_state_like: Any, step: Optional[int] = None
    ) -> Tuple[Any, Any, int]:
        """Restore (params, opt_state, step); shapes/dtypes from the
        ``*_like`` templates."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {"params": params_like, "opt_state": opt_state_like}
        if self._mgr is not None:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:  # pragma: no cover
            flat, treedef = jax.tree.flatten(template)
            data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
            restored = jax.tree.unflatten(
                treedef, [data[k] for k in data.files]
            )
        return restored["params"], restored["opt_state"], step

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
