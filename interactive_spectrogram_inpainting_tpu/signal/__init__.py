from .spectrogram import (
    SpectrogramsHelper,
    MelSpectrogramsHelper,
    get_spectrograms_helper,
    make_masked_phase_transform,
)
from .normalizer import DataNormalizer, DataNormalizerStatistics

__all__ = [
    "SpectrogramsHelper",
    "MelSpectrogramsHelper",
    "get_spectrograms_helper",
    "make_masked_phase_transform",
    "DataNormalizer",
    "DataNormalizerStatistics",
]
