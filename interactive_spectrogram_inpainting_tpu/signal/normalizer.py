"""Dataset-level channel normalization (GANSynth DataNormalizer equivalent).

Mirrors the behavior of ``GANsynth_pytorch.normalizer.DataNormalizer`` as
used by the reference (``vqvae/vqvae.py:218-226``,
``train_vqvae.py:645-676``): per-channel affine rescaling of the
(log-magnitude, IF) spectrogram channels computed from dataset statistics,
serialized to/from a JSON statistics file.

The GANSynth convention: given dataset statistics (min/max of log-magnitude,
max absolute IF), rescale so magnitude lies in [-s_a..] via
``s_a * x + s_b`` per channel. Normalization must be exactly invertible
(``denormalize(normalize(x)) == x``) because the decoder output is
denormalized before the inverse spectrogram transform.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Mapping, Union

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DataNormalizerStatistics:
    min_logmag: float
    max_logmag: float
    min_IF: float
    max_IF: float

    @property
    def __dict__armored(self):  # pragma: no cover
        return dataclasses.asdict(self)


class DataNormalizer:
    """Per-channel affine normalization to [-1, 1] ranges, GANSynth-style.

    logmag channel: a = 2/(max-min), b = -(max+min)/(max-min)
    IF channel:     a = 2/(max-min), b = -(max+min)/(max-min)
    """

    def __init__(self, statistics: Union[DataNormalizerStatistics,
                                         Mapping[str, float]]):
        if isinstance(statistics, Mapping):
            statistics = DataNormalizerStatistics(**statistics)
        self.statistics = statistics
        s = statistics
        mag_range = max(s.max_logmag - s.min_logmag, 1e-8)
        if_range = max(s.max_IF - s.min_IF, 1e-8)
        self._a = np.asarray(
            [2.0 / mag_range, 2.0 / if_range], dtype=np.float32)
        self._b = np.asarray(
            [-(s.max_logmag + s.min_logmag) / mag_range,
             -(s.max_IF + s.min_IF) / if_range], dtype=np.float32)

    def normalize(self, spec_and_IF: jnp.ndarray) -> jnp.ndarray:
        """[..., 2, F, T] -> normalized."""
        a = jnp.asarray(self._a).reshape((2, 1, 1))
        b = jnp.asarray(self._b).reshape((2, 1, 1))
        return spec_and_IF * a + b

    def denormalize(self, spec_and_IF: jnp.ndarray) -> jnp.ndarray:
        a = jnp.asarray(self._a).reshape((2, 1, 1))
        b = jnp.asarray(self._b).reshape((2, 1, 1))
        return (spec_and_IF - b) / a

    # -- statistics computation & persistence -------------------------------
    @staticmethod
    def compute_statistics(spectrogram_batches) -> DataNormalizerStatistics:
        """Scan an iterable of [B, 2, F, T] batches for channel ranges."""
        min_logmag = np.inf
        max_logmag = -np.inf
        min_if = np.inf
        max_if = -np.inf
        for batch in spectrogram_batches:
            batch = np.asarray(batch)
            min_logmag = min(min_logmag, float(batch[:, 0].min()))
            max_logmag = max(max_logmag, float(batch[:, 0].max()))
            min_if = min(min_if, float(batch[:, 1].min()))
            max_if = max(max_if, float(batch[:, 1].max()))
        return DataNormalizerStatistics(min_logmag, max_logmag, min_if, max_if)

    def dump_statistics(self, path: Union[str, pathlib.Path]) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self.statistics), f, indent=4)

    @classmethod
    def load_statistics(cls, path: Union[str, pathlib.Path]) -> "DataNormalizer":
        with open(path) as f:
            return cls(DataNormalizerStatistics(**json.load(f)))
