"""Persistent-compilation-cache plumbing for the CLIs."""

import os

import jax

from interactive_spectrogram_inpainting_tpu.utils.jax_cache import (
    enable_persistent_compilation_cache)


def test_env_var_wins_and_is_untouched(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jaxenv"))
    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_compilation_cache() == str(tmp_path / "jaxenv")
    # jax honors its own env var; the helper must not override the config
    assert jax.config.jax_compilation_cache_dir == before


def test_isi_env_var_creates_and_sets(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    target = tmp_path / "isi_cache"
    monkeypatch.setenv("ISI_JAX_CACHE_DIR", str(target))
    assert enable_persistent_compilation_cache() == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_all_clis_enable_the_cache():
    """Every CLI main() must call the helper before building jits."""
    import inspect
    from interactive_spectrogram_inpainting_tpu.serve import server
    from interactive_spectrogram_inpainting_tpu.train import (train_prior,
                                                              train_vqvae)
    from interactive_spectrogram_inpainting_tpu.extract import extract_codes
    from interactive_spectrogram_inpainting_tpu.sampling import cli
    for mod in (server, train_prior, train_vqvae, extract_codes, cli):
        src = inspect.getsource(mod.main)
        assert "enable_persistent_compilation_cache()" in src, mod.__name__
