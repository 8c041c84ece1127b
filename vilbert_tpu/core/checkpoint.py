"""Checkpoint save/restore (orbax).

Rebuilds the reference's two artifact kinds (SURVEY.md §5, train_tasks.py:
612-635): weights-only ``pytorch_model_<ep>.bin`` → params-only checkpoint;
full ``pytorch_ckpt_latest.tar`` → params + optimizer state + step + host
state (stop controllers, logger) in one orbax step directory. Resume restores
all of it (train_tasks.py:463-481).

Pretrained-weight import from actual reference .bin files goes through
vilbert_tpu.core.importer (the from_pretrained equivalent).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin orbax wrapper with a host-state side channel."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        state: Any,
        *,
        host_state: Optional[Dict[str, Any]] = None,
        wait: bool = True,
    ) -> None:
        ocp = _ocp()
        args = {"state": ocp.args.StandardSave(state)}
        if host_state is not None:
            args["host"] = ocp.args.JsonSave(host_state)
        self.mngr.save(step, args=ocp.args.Composite(**args))
        if wait:
            self.mngr.wait_until_finished()

    def restore(
        self, state_template: Any, *, step: Optional[int] = None
    ) -> Tuple[Any, Optional[Dict[str, Any]], int]:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        assert step is not None, f"no checkpoint in {self.directory}"
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
            ),
        )
        host = None
        host_path = os.path.join(self.directory, str(step), "host")
        if os.path.isdir(host_path):
            restored_h = self.mngr.restore(
                step, args=ocp.args.Composite(host=ocp.args.JsonRestore())
            )
            host = restored_h["host"]
        # A checkpoint saved under a different state-dtype configuration
        # (e.g. --bf16_adam_state toggled between save and resume) restores
        # with the SAVED dtypes; convert every leaf to the template's dtype
        # so the resumed run behaves exactly as configured (ADVICE r4:
        # nothing validated or converted on resume).
        state = jax.tree.map(
            lambda t, r: (
                r.astype(t.dtype)
                if hasattr(t, "dtype") and hasattr(r, "dtype")
                and hasattr(r, "astype") and r.dtype != t.dtype
                else r
            ),
            state_template, restored["state"],
        )
        return state, host, step

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def close(self):
        self.mngr.close()


def save_params(path: str, params: Any) -> None:
    """Weights-only artifact (reference pytorch_model_<ep>.bin equivalent):
    a flat .npz keyed by dotted param path — dependency-light and portable."""
    from vilbert_tpu.core.importer import _flatten

    flat = {k: np.asarray(v) for k, v in _flatten(jax.device_get(params)).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> Dict[str, Any]:
    from vilbert_tpu.core.importer import _unflatten

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def load_pretrained_torch(path: str, target_params: Any, **kwargs):
    """from_pretrained equivalent over a reference .bin checkpoint
    (utils.py:831-1032): returns (params, report)."""
    from vilbert_tpu.core.importer import (
        import_torch_state_dict,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    return import_torch_state_dict(sd, target_params, **kwargs)
