"""Batch audio restyling through the VQ-VAE (process_audio.ipynb
equivalent): run arbitrary wavs through encode -> quantize -> decode,
using the model as an "effect", and write the processed audio.

Usage:
    python examples/process_audio.py \
        --vqvae_model_parameters_path ... --vqvae_weights_path ... \
        --vqvae_training_parameters_path ... \
        --input_wavs in/*.wav --output_directory processed/
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from interactive_spectrogram_inpainting_tpu.data.wav import write_wav
from interactive_spectrogram_inpainting_tpu.models.vqvae.vqvae import (
    from_parameters_and_weights)
from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
    get_spectrograms_helper)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vqvae_model_parameters_path", required=True)
    p.add_argument("--vqvae_weights_path", required=True)
    p.add_argument("--vqvae_training_parameters_path", required=True)
    p.add_argument("--input_wavs", nargs="+", required=True)
    p.add_argument("--output_directory", default="processed")
    args = p.parse_args(argv)

    out = pathlib.Path(args.output_directory)
    out.mkdir(parents=True, exist_ok=True)
    with open(args.vqvae_training_parameters_path) as f:
        training_params = json.load(f)
    helper = get_spectrograms_helper(**training_params)
    model, variables = from_parameters_and_weights(
        args.vqvae_model_parameters_path, args.vqvae_weights_path)

    for path in args.input_wavs:
        spec = helper.from_wavfile(path)
        dec, *_ = model.apply(variables, spec)
        audio = np.asarray(helper.to_audio(dec))[0]
        target = out / (pathlib.Path(path).stem + "-vqvae.wav")
        write_wav(target, audio, helper.fs_hz)
        print("wrote", target)


if __name__ == "__main__":
    main()
