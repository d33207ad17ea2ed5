"""Plotting helpers (utils/visualization.py + gansynthplots equivalents).

Codemap matshow grids and mel-magnitude/IF figure batches as used by the
trainers' TensorBoard dumps (reference ``train_vqvae.py:373-427``,
``train_autoregressive_model.py:290-346``). All functions return
matplotlib figures (Agg backend) and never require a display.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_codemap(codemap: np.ndarray, n_class: int, title: str = ""):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(4, 3))
    im = ax.matshow(np.asarray(codemap), vmin=0, vmax=n_class - 1,
                    cmap="viridis")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax)
    return fig


def plot_mel_representations_batch(log_melspecs: np.ndarray,
                                   mel_IFs: np.ndarray,
                                   hop_length: int = 512,
                                   fs_hz: int = 16000):
    """Grid of (log-mel magnitude, IF) image pairs
    (GANsynth_pytorch.utils.plots equivalent, used at
    ``train_vqvae.py:419-423``)."""
    plt = _plt()
    n = len(log_melspecs)
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6), squeeze=False)
    for i in range(n):
        axes[0][i].imshow(log_melspecs[i], origin="lower", aspect="auto",
                          cmap="magma")
        axes[1][i].imshow(mel_IFs[i], origin="lower", aspect="auto",
                          cmap="twilight")
        axes[0][i].set_axis_off()
        axes[1][i].set_axis_off()
    axes[0][0].set_title("log-mel magnitude")
    axes[1][0].set_title("IF")
    fig.tight_layout()
    return fig


def plot_prediction_success_map(target: np.ndarray, predicted: np.ndarray,
                                mask: Optional[np.ndarray] = None):
    """4-shade success map: correct/incorrect x masked/unmasked
    (reference ``train_autoregressive_model.py:308-346``)."""
    plt = _plt()
    correct = (np.asarray(target) == np.asarray(predicted)).astype(int)
    shades = correct.copy()
    if mask is not None:
        shades = correct + 2 * np.asarray(mask).astype(int)
    fig, axes = plt.subplots(1, 3, figsize=(10, 3))
    axes[0].matshow(target, cmap="viridis")
    axes[0].set_title("target")
    axes[1].matshow(predicted, cmap="viridis")
    axes[1].set_title("predicted")
    im = axes[2].matshow(shades, cmap="RdYlGn", vmin=0, vmax=3)
    axes[2].set_title("success map")
    for ax in axes:
        ax.set_axis_off()
    fig.colorbar(im, ax=axes[2])
    return fig


def code_usage_histogram(codemaps: Sequence[np.ndarray], n_class: int):
    """Codebook usage counts (Inference.ipynb code-usage analysis)."""
    counts = np.zeros(n_class, dtype=np.int64)
    for cm in codemaps:
        counts += np.bincount(np.asarray(cm).reshape(-1),
                              minlength=n_class)
    return counts


def plot_code_usage(counts: np.ndarray, title: str = "codebook usage"):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.bar(np.arange(len(counts)), np.sort(counts)[::-1], width=1.0)
    ax.set_yscale("symlog")
    ax.set_title(f"{title} (used: {(counts > 0).sum()}/{len(counts)})")
    ax.set_xlabel("codes (sorted by usage)")
    return fig
