"""Sampling CLI (sample.py equivalent).

Reference (``/root/reference/sample.py:393-639``): load VQ-VAE + top +
bottom priors from (params JSON, weights) pairs, optionally encode
conditioning/constraint audio, sample top -> bottom -> decode -> write
wav + codemap plots + spectrogram/IF PNGs, persisting the CLI args JSON.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import uuid
from datetime import datetime
from typing import Iterable, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.label_encoders import load_label_encoders
from ..data.wav import write_wav
from ..models.prior.transformer import (
    from_parameters_and_weights as prior_from_parameters_and_weights)
from ..models.vqvae.vqvae import VQVAE, from_parameters_and_weights
from ..signal.spectrogram import get_spectrograms_helper
from .sample import sample_model as _sample_model


def sample_model(*args, use_predictive_sampling=False, **kwargs):
    """CLI wrapper: with predictive sampling, print the reference's
    per-run telemetry (correct-prediction ratio + achieved relative
    speedup, reference ``sample.py:335-342``)."""
    if not use_predictive_sampling:
        return _sample_model(*args, **kwargs)
    code, diag = _sample_model(*args, use_predictive_sampling=True,
                               return_diagnostics=True, **kwargs)
    num_forwards = int(diag["num_forwards"])
    num_steps = int(diag["num_steps"])
    ratio = 1.0 - num_forwards / num_steps
    print(f"Ratio of correct predictions: {ratio:.2f}"
          f" ===> Relative speedup: "
          f"{num_steps / max(num_forwards, 1):.2f}")
    return code


def make_conditioning_tensors(class_conditioning: Mapping,
                              label_encoders) -> Mapping[str, jnp.ndarray]:
    """str/int/range values -> encoded label arrays
    (reference ``sample.py:68-103``)."""
    out = {}
    for modality, value in class_conditioning.items():
        encoder = label_encoders[modality]
        if isinstance(value, (tuple, list)) and len(value) == 2:
            lo, hi = int(value[0]), int(value[1])
            assert lo < hi, "provide an increasing range"
            encoded = encoder.transform(list(range(lo, hi)))
        else:
            if modality == "pitch":
                value = int(value)
            encoded = encoder.transform([value])
        out[modality] = jnp.asarray(encoded)
    return out


def plot_codes(top_codes: np.ndarray, bottom_codes: np.ndarray,
               n_class_top: int, n_class_bottom: int, output_path):
    """Codemap grid figure (reference ``sample.py:350-390``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_maps = len(top_codes)
    fig, axes = plt.subplots(2, num_maps, figsize=(2 * num_maps, 4),
                             squeeze=False)
    for i in range(num_maps):
        axes[0][i].matshow(top_codes[i], vmin=0, vmax=n_class_top - 1,
                           cmap="viridis")
        axes[1][i].matshow(bottom_codes[i], vmin=0,
                           vmax=n_class_bottom - 1, cmap="viridis")
        for ax in (axes[0][i], axes[1][i]):
            ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(output_path)
    plt.close(fig)


def key_value(arg: str):
    key, value = arg.split(",", 1)
    if len(value.split("...")) == 2:
        value = value.split("...")
    return key, value


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--vqvae_training_parameters_path", required=True)
    parser.add_argument("--vqvae_model_parameters_path", required=True)
    parser.add_argument("--vqvae_weights_path", required=True)
    parser.add_argument("--prediction_top_parameters_path", required=True)
    parser.add_argument("--prediction_top_weights_path", required=True)
    parser.add_argument("--prediction_bottom_parameters_path",
                        required=True)
    parser.add_argument("--prediction_bottom_weights_path", required=True)
    parser.add_argument("--class_conditioning", type=key_value, nargs="*",
                        default=[])
    parser.add_argument("--class_conditioning_top", type=key_value,
                        nargs="*", default=[])
    parser.add_argument("--class_conditioning_bottom", type=key_value,
                        nargs="*", default=[])
    parser.add_argument("--keep_same_top", action="store_true")
    parser.add_argument("--label_encoders_path", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top_p_sampling_p", type=float, default=0.0)
    parser.add_argument("--top_k_sampling_k", type=int, default=0)
    parser.add_argument("--sample_rate_hz", type=int, default=16000)
    parser.add_argument("--condition_top_audio_path", type=str,
                        default=None)
    parser.add_argument("--constraint_top_audio_path", type=str,
                        default=None)
    parser.add_argument("--constraint_top_num_timesteps", type=int,
                        default=None)
    parser.add_argument("--use_predictive_sampling", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output_directory", type=str, default="./")
    args = parser.parse_args(argv)

    run_id = (datetime.now().strftime("%Y%m%d-%H%M%S-")
              + str(uuid.uuid4())[:6])
    print("Sample ID:", run_id)
    output_dir = pathlib.Path(args.output_directory).expanduser().absolute()
    output_dir.mkdir(parents=True, exist_ok=True)

    vqvae_model, vqvae_variables = from_parameters_and_weights(
        args.vqvae_model_parameters_path, args.vqvae_weights_path)
    model_top, vars_top = prior_from_parameters_and_weights(
        args.prediction_top_parameters_path,
        args.prediction_top_weights_path)
    model_bottom, vars_bottom = prior_from_parameters_and_weights(
        args.prediction_bottom_parameters_path,
        args.prediction_bottom_weights_path)

    with open(args.vqvae_training_parameters_path) as f:
        vqvae_training_parameters = json.load(f)
    spectrograms_helper = get_spectrograms_helper(
        **vqvae_training_parameters)

    label_encoders = (load_label_encoders(args.label_encoders_path)
                      if args.label_encoders_path else {})

    if args.class_conditioning_top:
        assert args.class_conditioning_bottom
        cc_top = dict(args.class_conditioning_top)
        cc_bottom = dict(args.class_conditioning_bottom)
    else:
        cc_top = cc_bottom = dict(args.class_conditioning)
    cc_top_tensors = make_conditioning_tensors(cc_top, label_encoders)
    cc_bottom_tensors = make_conditioning_tensors(cc_bottom,
                                                  label_encoders)

    seed = args.seed if args.seed is not None else np.random.SeedSequence(
    ).entropy % (2 ** 31)
    rng = jax.random.PRNGKey(int(seed))
    rng_top, rng_bottom = jax.random.split(rng)

    initial_code = None
    top_code = None
    if args.condition_top_audio_path:
        spec = spectrograms_helper.from_wavfile(
            args.condition_top_audio_path)
        (_, _, _, cond_top, cond_bottom, *_rest) = vqvae_model.apply(
            vqvae_variables, spec, method=VQVAE.encode)
        top_code = jnp.broadcast_to(cond_top,
                                    (args.batch_size,) + cond_top.shape[1:])
        initial_code = jnp.broadcast_to(
            cond_bottom, (args.batch_size,) + cond_bottom.shape[1:])
    elif args.constraint_top_audio_path:
        # Fix the first (num_timesteps - 1) TIME columns of the top
        # codemap from the encoded audio and generate the rest — the
        # reference CLI exposes this (sample.py:438-439,535-551) but its
        # sample_model constraint path raises NotImplementedError
        # (sample.py:194-195; its [:, :k-1] slice also hits the
        # frequency axis, not time — we implement the documented
        # intent, "fixes the top-left part of the generated codemap").
        # Our sampler's mask+initial_code inpainting covers it directly.
        assert args.constraint_top_num_timesteps is not None, (
            "--constraint_top_audio_path requires "
            "--constraint_top_num_timesteps")
        spec = spectrograms_helper.from_wavfile(
            args.constraint_top_audio_path)
        (_, _, _, cons_top, *_rest) = vqvae_model.apply(
            vqvae_variables, spec, method=VQVAE.encode)
        shape = tuple(model_top.config.shape)
        keep = max(0, min(args.constraint_top_num_timesteps - 1, shape[1]))
        init_top = jnp.zeros((1,) + shape, jnp.int32)
        init_top = init_top.at[..., :keep].set(
            jnp.asarray(cons_top, jnp.int32)[..., :shape[0], :keep])
        resample = np.ones(shape, bool)
        resample[:, :keep] = False
        top_code = sample_model(
            model_top, vars_top, rng_top, 1,
            temperature=args.temperature,
            class_conditioning=cc_top_tensors,
            initial_code=init_top, mask=resample[None],
            top_p_sampling_p=args.top_p_sampling_p,
            top_k_sampling_k=args.top_k_sampling_k,
            use_predictive_sampling=args.use_predictive_sampling)
        top_code = jnp.broadcast_to(
            top_code, (args.batch_size,) + top_code.shape[1:])
    else:
        batch_size_top = 1 if args.keep_same_top else args.batch_size
        top_code = sample_model(
            model_top, vars_top, rng_top, batch_size_top,
            temperature=args.temperature,
            class_conditioning=cc_top_tensors,
            top_p_sampling_p=args.top_p_sampling_p,
            top_k_sampling_k=args.top_k_sampling_k,
            use_predictive_sampling=args.use_predictive_sampling)
        if args.keep_same_top:
            top_code = jnp.broadcast_to(
                top_code, (args.batch_size,) + top_code.shape[1:])

    bottom_code = sample_model(
        model_bottom, vars_bottom, rng_bottom, args.batch_size,
        temperature=args.temperature, condition=top_code,
        class_conditioning=cc_bottom_tensors, initial_code=initial_code,
        top_p_sampling_p=args.top_p_sampling_p,
        top_k_sampling_k=args.top_k_sampling_k,
        use_predictive_sampling=args.use_predictive_sampling)

    decoded = vqvae_model.apply(vqvae_variables, top_code, bottom_code,
                                method=VQVAE.decode_code)
    audio = np.asarray(spectrograms_helper.to_audio(decoded))

    with open(output_dir / f"{run_id}-command_line_parameters.json",
              "w") as f:
        json.dump(dict(vars(args), seed=int(seed)), f, indent=4,
                  default=str)
    plot_codes(np.asarray(top_code), np.asarray(bottom_code),
               model_top.config.n_class, model_bottom.config.n_class,
               output_dir / f"{run_id}-codemaps.png")
    write_wav(output_dir / f"{run_id}.wav", audio.reshape(-1),
              args.sample_rate_hz)

    # spectrogram + IF channel images
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    decoded_np = np.asarray(decoded)
    for channel, name in enumerate(["spectrogram",
                                    "instantaneous_frequency"]):
        fig, axes = plt.subplots(1, len(decoded_np),
                                 figsize=(3 * len(decoded_np), 4),
                                 squeeze=False)
        for i in range(len(decoded_np)):
            axes[0][i].imshow(decoded_np[i, channel], origin="lower",
                              aspect="auto", cmap="viridis")
            axes[0][i].set_axis_off()
        fig.savefig(output_dir / f"{run_id}-{name}.png")
        plt.close(fig)
    print("wrote", output_dir / f"{run_id}.wav")
    return output_dir / f"{run_id}.wav"


if __name__ == "__main__":
    main()
