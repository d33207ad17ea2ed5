"""Batched codemap extraction (extract_code.py equivalent).

Reference (``/root/reference/extract_code.py``): DDP-encode every NSynth
split through a trained VQ-VAE (NCCL init + DDP wrap,
``extract_code.py:86-92,229-235``) and pickle ``CodeRow``s into LMDB,
with a decode-back sanity check at the end. Here: ``extract_split``
builds a ``('data',)`` mesh and device_puts every audio batch sharded
over it, so the jitted encode runs data-parallel across all attached
chips (SPMD replaces DDP); results are written into the fixed-stride
``CodemapStore``. The decode-back check (stored codes -> audio wav) is
kept (reference ``extract_code.py:267-300``) — it is the pipeline's
end-to-end integrity probe.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time
from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.codemap_store import CodemapDataset, CodemapStoreWriter
from ..data.label_encoders import dump_label_encoders
from ..data.loader import BatchLoader
from ..data.nsynth import NSynth
from ..data.wav import write_wav
from ..models.vqvae import VQVAE
from ..models.vqvae.vqvae import from_parameters_and_weights
from ..parallel.mesh import data_sharding, make_mesh
from ..signal.spectrogram import (get_spectrograms_helper,
                                  make_masked_phase_transform)


def extract_split(model: VQVAE, variables, spectrograms_helper,
                  dataset: NSynth, store_directory, batch_size: int = 128,
                  categorical_fields: Sequence[str] = (
                      "pitch", "instrument_family_str"),
                  n_devices_data: Optional[int] = None) -> int:
    """Encode a dataset split into a CodemapStore; returns record count.

    Batches are sharded over a ``('data',)`` mesh (the DDP replacement,
    reference ``extract_code.py:229-235``): pass ``n_devices_data`` to
    pin the mesh size, default = largest device count dividing the batch.
    """
    if n_devices_data is None:
        n_devices_data = len(jax.devices())
        while batch_size % n_devices_data:
            n_devices_data -= 1
    mesh = make_mesh(n_data=n_devices_data, n_model=1)
    batch_sharding = data_sharding(mesh)

    # masked-phase input transform: a thresholded model was TRAINED on
    # spectrograms with sub-threshold IF zeroed, so extraction must feed
    # it the same view (reference extract_code.py:179-181 builds this
    # exact transform from the stored model parameters)
    min_magnitude = model.config.output_spectrogram_min_magnitude
    input_transform = (make_masked_phase_transform(min_magnitude)
                       if min_magnitude is not None else None)

    @jax.jit
    def encode(audio):
        spec = spectrograms_helper.to_spectrogram(audio)
        if input_transform is not None:
            spec = input_transform(spec)
        return model.apply(variables, spec, method=VQVAE.encode_codes_only)

    # probe codemap shapes with one batch
    probe = jnp.zeros((1, dataset.num_samples), jnp.float32)
    id_t, id_b = encode(probe)
    top_shape, bottom_shape = id_t.shape[1:], id_b.shape[1:]

    loader = BatchLoader(dataset, batch_size, shuffle=False,
                         drop_last=False)
    written = 0
    with CodemapStoreWriter(
            store_directory, top_shape, bottom_shape,
            attribute_fields=list(categorical_fields),
            label_encoders=dataset.label_encoders,
            n_class=(model.config.n_embed_t
                     if model.config.n_embed_t == model.config.n_embed_b
                     else None),
            n_class_top=model.config.n_embed_t,
            n_class_bottom=model.config.n_embed_b) as writer:
        index = 0
        for batch in loader:
            audio = np.asarray(batch[0])
            labels = batch[1:]
            n = audio.shape[0]
            if n < batch_size:  # pad to the compiled shape
                audio = np.concatenate(
                    [audio, np.zeros((batch_size - n,) + audio.shape[1:],
                                     audio.dtype)])
            id_t, id_b = encode(
                jax.device_put(jnp.asarray(audio), batch_sharding))
            id_t = np.asarray(id_t)[:n]
            id_b = np.asarray(id_b)[:n]
            attributes = {field: np.asarray(labels[i])
                          for i, field in enumerate(categorical_fields)}
            names = dataset.names[index: index + n]
            writer.append_batch(id_t, id_b, attributes, names)
            index += n
            written += n
    return written


def decode_back_sanity_check(model: VQVAE, variables, spectrograms_helper,
                             store_directory, output_wav_path,
                             num_samples: int = 4,
                             audio_samples: Optional[int] = None) -> None:
    """Read a random stored batch, decode to audio, write a wav
    (reference ``extract_code.py:267-300``)."""
    dataset = CodemapDataset(store_directory)
    idx = np.random.default_rng(0).choice(
        len(dataset), size=min(num_samples, len(dataset)), replace=False)
    tops, bottoms, _ = dataset.read_batch(idx)

    @jax.jit
    def decode(tops, bottoms):
        return model.apply(variables, tops, bottoms,
                           method=VQVAE.decode_code)

    spec = decode(jnp.asarray(tops), jnp.asarray(bottoms))
    audio = np.asarray(spectrograms_helper.to_audio(
        spec, num_samples=audio_samples))
    write_wav(output_wav_path, audio.reshape(-1),
              spectrograms_helper.fs_hz)


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    # cross-host rendezvous (no-op single-process); extraction shards
    # over the data axis the same way the trainers do
    from ..parallel.distributed import initialize_multihost
    initialize_multihost()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vqvae_model_parameters_path", type=str, required=True)
    p.add_argument("--vqvae_weights_path", type=str, required=True)
    p.add_argument("--vqvae_training_parameters_path", type=str,
                   required=True)
    p.add_argument("--dataset_audio_directory_paths", type=str, nargs="+",
                   required=True)
    p.add_argument("--named_dataset_json_data_paths", type=str, nargs="+",
                   required=True,
                   help="name=path pairs, e.g. train=/x/examples.json")
    p.add_argument("--output_directory", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128,
                   help="encode is dispatch-bound on small batches "
                        "(measured v5e-1: 122 specs/s at B=8, 1038 at "
                        "the reference's B=64, 1463 at B=128, 2223 at "
                        "B=256); default raised from the reference's 64")
    p.add_argument("--valid_pitch_range", type=int, nargs=2,
                   default=[24, 84])
    p.add_argument("--categorical_fields", type=str, nargs="*",
                   default=["pitch", "instrument_family_str"],
                   help="attribute fields stored per codemap "
                        "(reference extract_code.py:104-105)")
    p.add_argument("--also_write_lmdb", action="store_true",
                   help="additionally emit a reference-consumable LMDB "
                        "environment next to each store (<split>_lmdb)")
    args = p.parse_args(argv)

    with open(args.vqvae_training_parameters_path) as f:
        training_parameters = json.load(f)
    spectrograms_helper = get_spectrograms_helper(**training_parameters)
    model, variables = from_parameters_and_weights(
        args.vqvae_model_parameters_path, args.vqvae_weights_path)

    for spec_pair in args.named_dataset_json_data_paths:
        name, json_path = spec_pair.split("=", 1)
        dataset = NSynth(
            args.dataset_audio_directory_paths, json_path,
            valid_pitch_range=tuple(args.valid_pitch_range),
            categorical_field_list=list(args.categorical_fields),
            sample_rate=training_parameters.get("fs_hz", 16000),
            duration_seconds=training_parameters.get(
                "dataset_duration_seconds", 4.0))
        store_dir = pathlib.Path(args.output_directory) / name
        t0 = time.time()
        count = extract_split(model, variables, spectrograms_helper,
                              dataset, store_dir,
                              batch_size=args.batch_size,
                              categorical_fields=tuple(
                                  args.categorical_fields))
        print(f"{name}: {count} codemaps in {time.time() - t0:.1f}s "
              f"-> {store_dir}")
        decode_back_sanity_check(
            model, variables, spectrograms_helper, store_dir,
            store_dir / "vqvae_codes_extraction_samples.wav",
            audio_samples=dataset.num_samples)
        if args.also_write_lmdb:
            from ..data.lmdb_compat import (store_to_lmdb,
                                            validate_environment)
            lmdb_dir = pathlib.Path(args.output_directory) / f"{name}_lmdb"
            n = store_to_lmdb(store_dir, lmdb_dir)
            # structural audit of every page we just wrote (format
            # invariants real liblmdb would trip over; see
            # lmdb_compat.validate_environment)
            stats = validate_environment(lmdb_dir, strict_size=True)
            print(f"{name}: {n} rows -> LMDB {lmdb_dir} "
                  f"(audit: {stats['entries']} entries, "
                  f"{stats['pages']} pages OK)")


if __name__ == "__main__":
    main()
