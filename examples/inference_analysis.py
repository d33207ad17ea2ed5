"""Research analysis driver (Inference.ipynb equivalent).

The reference's ``Inference.ipynb`` performs: reconstruction QA
(original vs VQ-VAE round trip, per-criterion metrics), codebook usage
histograms, latent interpolation between two sounds, and code corruption
probes, exporting paper figures and audio. This script runs the same
analyses headlessly over a directory of wavs.

Usage:
    python examples/inference_analysis.py \
        --vqvae_model_parameters_path RUN/vqvae-model_parameters.json \
        --vqvae_weights_path RUN/vqvae-weights.msgpack \
        --vqvae_training_parameters_path RUN/command_line_parameters.json \
        --audio_paths a.wav b.wav --output_directory analysis/
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from interactive_spectrogram_inpainting_tpu.data.wav import write_wav
from interactive_spectrogram_inpainting_tpu.models.vqvae.vqvae import (
    VQVAE, from_parameters_and_weights)
from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
    get_spectrograms_helper)
from interactive_spectrogram_inpainting_tpu.train.losses import (
    make_ddsp_loss, make_jukebox_loss, mse_loss)
from interactive_spectrogram_inpainting_tpu.utils.visualization import (
    code_usage_histogram, plot_code_usage, plot_mel_representations_batch)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vqvae_model_parameters_path", required=True)
    p.add_argument("--vqvae_weights_path", required=True)
    p.add_argument("--vqvae_training_parameters_path", required=True)
    p.add_argument("--audio_paths", nargs="+", required=True)
    p.add_argument("--output_directory", default="analysis")
    p.add_argument("--interpolation_steps", type=int, default=5)
    args = p.parse_args(argv)

    out = pathlib.Path(args.output_directory)
    out.mkdir(parents=True, exist_ok=True)

    with open(args.vqvae_training_parameters_path) as f:
        training_params = json.load(f)
    helper = get_spectrograms_helper(**training_params)
    model, variables = from_parameters_and_weights(
        args.vqvae_model_parameters_path, args.vqvae_weights_path)

    ddsp = make_ddsp_loss()
    jukebox = make_jukebox_loss()

    specs = []
    for path in args.audio_paths:
        specs.append(helper.from_wavfile(path)[0])
    specs = jnp.stack(specs)

    # 1. reconstruction QA with the reference's metric trio
    dec, diff, perp_t, perp_b, id_t, id_b = model.apply(variables, specs)
    audio_orig = np.asarray(helper.to_audio(specs))
    audio_rec = np.asarray(helper.to_audio(dec))
    metrics = {
        "mse": float(mse_loss(dec, specs)),
        "spectral_ddsp": float(ddsp(jnp.asarray(audio_rec),
                                    jnp.asarray(audio_orig))),
        "spectral_jukebox": float(jukebox(jnp.asarray(audio_rec),
                                          jnp.asarray(audio_orig))),
        "perplexity_top": float(perp_t),
        "perplexity_bottom": float(perp_b),
    }
    (out / "reconstruction_metrics.json").write_text(
        json.dumps(metrics, indent=2))
    for i, path in enumerate(args.audio_paths):
        stem = pathlib.Path(path).stem
        write_wav(out / f"{stem}-original.wav", audio_orig[i],
                  helper.fs_hz)
        write_wav(out / f"{stem}-reconstruction.wav", audio_rec[i],
                  helper.fs_hz)
    fig = plot_mel_representations_batch(
        np.concatenate([np.asarray(specs)[:, 0], np.asarray(dec)[:, 0]]),
        np.concatenate([np.asarray(specs)[:, 1], np.asarray(dec)[:, 1]]),
        hop_length=helper.hop_length, fs_hz=helper.fs_hz)
    fig.savefig(out / "reconstructions.png")

    # 2. code-usage histograms
    for name, ids, n in (("top", id_t, model.config.n_embed_t),
                         ("bottom", id_b, model.config.n_embed_b)):
        counts = code_usage_histogram([np.asarray(ids)], n)
        plot_code_usage(counts, f"{name} codebook").savefig(
            out / f"code_usage_{name}.png")

    # 3. latent interpolation between the first two sounds
    if len(args.audio_paths) >= 2:
        (qt, qb, *_rest) = model.apply(variables, specs[:2],
                                       method=VQVAE.encode)
        alphas = np.linspace(0, 1, args.interpolation_steps)
        frames = []
        for a in alphas:
            qt_i = (1 - a) * qt[0:1] + a * qt[1:2]
            qb_i = (1 - a) * qb[0:1] + a * qb[1:2]
            dec_i = model.apply(variables, qt_i, qb_i,
                                method=VQVAE.decode)
            frames.append(np.asarray(helper.to_audio(dec_i))[0])
        write_wav(out / "interpolation.wav", np.concatenate(frames),
                  helper.fs_hz)

    # 4. code-corruption probe: random +/-1 on bottom codes
    rng = np.random.default_rng(0)
    corrupted_b = (np.asarray(id_b)
                   + rng.integers(-1, 2, np.asarray(id_b).shape)) \
        % model.config.n_embed_b
    dec_corrupt = model.apply(variables, id_t,
                              jnp.asarray(corrupted_b),
                              method=VQVAE.decode_code)
    write_wav(out / "corrupted_codes.wav",
              np.asarray(helper.to_audio(dec_corrupt)).reshape(-1),
              helper.fs_hz)

    print(json.dumps(metrics, indent=2))
    print("analysis written to", out)
    return metrics


if __name__ == "__main__":
    main()
