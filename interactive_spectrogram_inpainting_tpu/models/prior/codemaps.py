"""Codemap <-> sequence flattening orders, as static index permutations.

Behavioral equivalent of
``interactive_spectrogram_inpainting/priors/codemaps_helpers.py:7-243``.
The reference implements these with chains of torch ``unfold``/``permute``
calls; here each scan order is a precomputed numpy permutation applied as a
single gather — trivially jittable, layout-free, and self-inverting.

Scan orders (frequency-first, low frequencies first):
- ``Simple``: sequence position ``j`` holds codemap cell
  ``(f = j % F, t = j // F)`` — time-major frames, frequencies fastest.
- ``ZigZag`` (for the upsampling prior): the target codemap is cut into
  ``(pf, pt)`` patches, one per source cell; patches appear in the source's
  scan order and cells within a patch are again frequency-first:
  ``j = ((t_s * F_src + f_s) * pt + pt_i) * pf + pf_i`` holds cell
  ``(f_s * pf + pf_i, t_s * pt + pt_i)``. This aligns each target patch
  directly under the source code that conditions it, which is what makes
  the aligned decoder cross-attention meaningful
  (reference ``codemaps_helpers.py:108-243``).

Verified against the reference's round-trip test
(``tests/check_relative_transformer.py``), including its expected
first-patch ordering.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class CodemapsHelper:
    """Flatten [B, F, T(, E)] codemaps to [B, F*T(, E)] sequences and back."""

    def __init__(self, frequencies: int, duration: int):
        self.frequencies = int(frequencies)
        self.duration = int(duration)
        self.sequence_length = self.frequencies * self.duration
        self.predict_frequencies_first = True
        self.predict_low_frequencies_first = True
        # flat codemap index (f * T + t) of each sequence position
        self._gather = self._build_gather()
        self._scatter = np.argsort(self._gather)

    # subclasses define the permutation
    def _build_gather(self) -> np.ndarray:
        raise NotImplementedError

    def to_sequence(self, codemap: jnp.ndarray) -> jnp.ndarray:
        """[B, F, T] or [B, F, T, E] -> [B, L] or [B, L, E]."""
        batch = codemap.shape[0]
        trailing = codemap.shape[3:]
        flat = codemap.reshape((batch, self.sequence_length) + trailing)
        return jnp.take(flat, jnp.asarray(self._gather), axis=1)

    def to_time_frequency_map(self, sequence: jnp.ndarray,
                              permute_output_as_logits: bool = False
                              ) -> jnp.ndarray:
        """[B, L(, E)] -> [B, F, T(, E)]; with logits flag -> [B, E, F, T]
        (the reference's torch-logits layout,
        ``codemaps_helpers.py:52-54``)."""
        batch = sequence.shape[0]
        trailing = sequence.shape[2:]
        unperm = jnp.take(sequence, jnp.asarray(self._scatter), axis=1)
        out = unperm.reshape(
            (batch, self.frequencies, self.duration) + trailing)
        if trailing and permute_output_as_logits:
            out = jnp.moveaxis(out, -1, 1)
        return out

    @property
    def flatten_permutation(self) -> np.ndarray:
        """[L] flat codemap index (``f * T + t``) of each sequence
        position — the host-side numpy permutation equivalent of
        :meth:`to_sequence` (``seq = codemap.reshape(-1)[perm]``).
        Public so host-side code (e.g. the server's mask-bound
        computation) can flatten without a device round trip."""
        return self._gather

    def positions(self) -> np.ndarray:
        """[L, 2] (f, t) cell of each sequence position (host-side)."""
        f = self._gather // self.duration
        t = self._gather % self.duration
        return np.stack([f, t], axis=1)


class SimpleCodemapsHelper(CodemapsHelper):
    def _build_gather(self) -> np.ndarray:
        j = np.arange(self.sequence_length)
        f = j % self.frequencies
        t = j // self.frequencies
        return f * self.duration + t


class ZigZagCodemapsHelper(CodemapsHelper):
    def __init__(self, frequencies: int, duration: int,
                 patch_frequencies: int, patch_duration: int):
        self.patch_frequencies = int(patch_frequencies)
        self.patch_duration = int(patch_duration)
        if frequencies % patch_frequencies or duration % patch_duration:
            raise ValueError("patch sizes must divide the codemap shape")
        super().__init__(frequencies, duration)

    def _build_gather(self) -> np.ndarray:
        pf, pt = self.patch_frequencies, self.patch_duration
        f_src = self.frequencies // pf
        j = np.arange(self.sequence_length)
        pf_i = j % pf
        rest = j // pf
        pt_i = rest % pt
        rest = rest // pt
        f_s = rest % f_src
        t_s = rest // f_src
        f = f_s * pf + pf_i
        t = t_s * pt + pt_i
        return f * self.duration + t
