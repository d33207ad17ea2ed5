"""Persistent XLA compilation cache for the CLIs.

Every entry point (server, trainers, extractor, sampling CLI) calls
:func:`enable_persistent_compilation_cache` before building any jit.
On remote-compile backends a cold compile of the full-size serving or
training programs takes minutes per specialization; with the persistent
cache a later process pays only an executable reload (measured 15-230 s
for the largest serving buckets, ~5 s for typical programs).

The reference has no analogue (PyTorch eager recompiles nothing); this
is TPU/XLA-specific operational plumbing.

Resolution order:
1. ``JAX_COMPILATION_CACHE_DIR`` env var (jax's own knob) — if the user
   set it, jax already honors it and we leave it alone;
2. ``ISI_JAX_CACHE_DIR`` env var;
3. ``~/.cache/interactive_spectrogram_inpainting_tpu/jax``.
"""
import os
import pathlib

import jax

_DEFAULT = pathlib.Path.home() / ".cache" / \
    "interactive_spectrogram_inpainting_tpu" / "jax"


def enable_persistent_compilation_cache() -> str:
    """Point jax at a persistent on-disk compilation cache; returns the
    directory used. Never raises: an unwritable directory just leaves
    the cache disabled (jax logs the failure lazily)."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    path = os.environ.get("ISI_JAX_CACHE_DIR", str(_DEFAULT))
    try:
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - unwritable cache dir
        pass
    return path
