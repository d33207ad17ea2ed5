"""Metrics/observability plane (TensorBoard-equivalent).

The reference logs scalars + rich media to TensorBoard
(``train_vqvae.py:101-130,236-258``; SURVEY.md section 5.5). Here:
JSONL scalar logs always (cheap, greppable, machine-readable), mirrored
to TensorBoard when the package is importable. Metric names match the
reference (vqvae_loss, reconstruction_*, latent_loss,
perplexity_top/bottom, prediction loss/accuracy) so dashboards carry
over. Writes happen on process 0 only.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Mapping, Optional, Union

import jax
import numpy as np


class MetricsWriter:
    def __init__(self, directory: Union[str, pathlib.Path],
                 enabled: bool = True):
        self.enabled = enabled and jax.process_index() == 0
        self.directory = pathlib.Path(directory)
        self._tb = None
        if self.enabled:
            self.directory.mkdir(parents=True, exist_ok=True)
            self._file = open(self.directory / "metrics.jsonl", "a")
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(self.directory))
            except Exception:
                self._tb = None

    def scalars(self, tag_prefix: str, values: Mapping[str, float],
                step: int) -> None:
        if not self.enabled:
            return
        record = {"step": int(step), "time": time.time(),
                  **{f"{tag_prefix}/{k}": float(np.asarray(v))
                     for k, v in values.items()}}
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{tag_prefix}/{k}",
                                    float(np.asarray(v)), step)

    def audio(self, tag: str, audio: np.ndarray, step: int,
              sample_rate: int = 16000) -> None:
        if not self.enabled:
            return
        from ..data.wav import write_wav
        media = self.directory / "media"
        media.mkdir(exist_ok=True)
        write_wav(media / f"{tag.replace('/', '_')}-{step}.wav",
                  np.asarray(audio), sample_rate)
        if self._tb is not None:
            import torch
            self._tb.add_audio(tag, torch.from_numpy(
                np.asarray(audio).reshape(1, -1)), step,
                sample_rate=sample_rate)

    def image(self, tag: str, image: np.ndarray, step: int) -> None:
        if not self.enabled:
            return
        media = self.directory / "media"
        media.mkdir(exist_ok=True)
        np.save(media / f"{tag.replace('/', '_')}-{step}.npy",
                np.asarray(image))

    def close(self) -> None:
        if self.enabled:
            self._file.close()
            if self._tb is not None:
                self._tb.close()
