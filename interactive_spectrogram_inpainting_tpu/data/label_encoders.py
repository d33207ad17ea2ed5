"""Per-modality label encoders with the reference's JSON schema.

Mirrors ``interactive_spectrogram_inpainting/utils/datasets/label_encoders.py:8-26``:
each conditioning modality (``pitch``, ``instrument_family_str``, ...) maps
class values to contiguous integer indices; the full mapping set is dumped
to / loaded from a single ``label_encoders.json`` file whose schema is
``{modality_name: [class_0, class_1, ...]}`` (sklearn ``classes_`` lists),
keeping stored files interchangeable with the reference pipeline.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Iterable, List, Mapping, Sequence, Union

import numpy as np


class LabelEncoder:
    """sklearn-compatible minimal label encoder (sorted unique classes)."""

    def __init__(self, classes: Sequence = ()):  # noqa: D401
        self.classes_ = list(classes)
        self._index = {c: i for i, c in enumerate(self.classes_)}

    def fit(self, values: Iterable) -> "LabelEncoder":
        self.classes_ = sorted(set(values), key=lambda v: (str(type(v)), v))
        try:
            self.classes_ = sorted(set(values))
        except TypeError:
            pass
        self._index = {c: i for i, c in enumerate(self.classes_)}
        return self

    def transform(self, values: Iterable) -> np.ndarray:
        try:
            return np.asarray([self._index[v] for v in values], dtype=np.int64)
        except KeyError as e:
            raise ValueError(f"unseen label {e.args[0]!r}") from e

    def inverse_transform(self, indices: Iterable[int]) -> List:
        return [self.classes_[int(i)] for i in indices]

    def fit_transform(self, values: Iterable) -> np.ndarray:
        return self.fit(values).transform(values)

    def __len__(self) -> int:
        return len(self.classes_)


def dump_label_encoders(label_encoders: Mapping[str, LabelEncoder],
                        path: Union[str, pathlib.Path]) -> None:
    payload = {name: list(encoder.classes_)
               for name, encoder in label_encoders.items()}
    with open(path, "w") as f:
        json.dump(payload, f, indent=4)


def load_label_encoders(path: Union[str, pathlib.Path]
                        ) -> Dict[str, LabelEncoder]:
    with open(path) as f:
        payload = json.load(f)
    return {name: LabelEncoder(classes) for name, classes in payload.items()}
