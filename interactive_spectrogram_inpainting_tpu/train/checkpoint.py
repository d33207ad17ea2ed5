"""Checkpoint/resume with the reference's conventions, on orbax.

Reference behavior (``utils/training/checkpoint.py:6-31``,
``train_vqvae.py:957-985``, ``train_autoregressive_model.py:725-753``):
a typed dict {model, epoch, optimizer, scheduler-step, validation_loss,
validation_metrics}, rolling saves every ``save_frequency`` epochs, a
``-best_performing`` copy on validation improvement, resume restoring all
state, plus JSON sidecars of CLI args and model constructor kwargs.

Here: one orbax ``CheckpointManager`` per run directory with ``latest`` +
``best`` retention, and the same JSON sidecar files so inference-side
tools can rebuild preprocessing exactly (reference ``extract_code.py:
167-172``, ``sample.py:483-489``, ``flask_server.py:237-243``).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Mapping, Optional, Union

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: Union[str, pathlib.Path],
                 save_frequency: int = 1):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_frequency = int(save_frequency)
        self._manager = ocp.CheckpointManager(
            self.directory / "checkpoints",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=3, create=True))
        self._best_manager = ocp.CheckpointManager(
            self.directory / "best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True))
        self.best_validation_loss = np.inf
        self._load_best_marker()

    # -- sidecars ------------------------------------------------------------
    def store_command_line_parameters(self, args: Mapping[str, Any]) -> None:
        with open(self.directory / "command_line_parameters.json", "w") as f:
            json.dump({k: v for k, v in dict(args).items()
                       if _json_safe(v)}, f, indent=4, default=str)

    def store_model_parameters(self, kwargs_json: str,
                               name: str = "model_parameters.json") -> None:
        (self.directory / name).write_text(kwargs_json)

    def _load_best_marker(self):
        marker = self.directory / "best_validation_loss.json"
        if marker.exists():
            self.best_validation_loss = json.loads(
                marker.read_text())["validation_loss"]

    # -- save / restore ------------------------------------------------------
    def save(self, epoch: int, state, validation_loss: Optional[float] = None,
             validation_metrics: Optional[Dict[str, float]] = None) -> bool:
        """Rolling save; returns True if this became the best checkpoint."""
        if epoch % self.save_frequency == 0:
            self._manager.save(epoch, args=ocp.args.StandardSave(state))
        is_best = (validation_loss is not None
                   and validation_loss < self.best_validation_loss)
        if is_best:
            self.best_validation_loss = float(validation_loss)
            self._best_manager.save(epoch, args=ocp.args.StandardSave(state),
                                    force=True)
            payload = {"validation_loss": float(validation_loss),
                       "epoch": int(epoch)}
            if validation_metrics:
                payload["validation_metrics"] = {
                    k: float(v) for k, v in validation_metrics.items()}
            (self.directory / "best_validation_loss.json").write_text(
                json.dumps(payload, indent=4))
        self._manager.wait_until_finished()
        self._best_manager.wait_until_finished()
        return is_best

    def latest_epoch(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, abstract_state, epoch: Optional[int] = None):
        """Restore (state, epoch); ``abstract_state`` is a matching pytree
        of arrays or ShapeDtypeStructs."""
        step = epoch if epoch is not None else self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")
        state = self._manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state))
        return state, step

    def restore_best(self, abstract_state):
        step = self._best_manager.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no best checkpoint under {self.directory}")
        return self._best_manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state)), step

    def close(self):
        self._manager.close()
        self._best_manager.close()


def _json_safe(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False
