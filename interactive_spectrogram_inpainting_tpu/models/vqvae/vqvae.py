"""Two-level hierarchical VQ-VAE-2 (top/bottom codemaps) — TPU-native.

Behavioral equivalent of the reference ``VQVAE``
(``interactive_spectrogram_inpainting/vqvae/vqvae.py:36-342``): encoder
chain ``enc_b -> enc_t -> 1x1 -> quantize_t -> dec_t -> concat(enc_b) ->
1x1 -> quantize_b``; decode upsamples the top quantized map to bottom
resolution and decodes the concatenation. Public tensors use the
reference's channel-first ``[B, 2, F, T]`` convention at the API boundary;
all internal compute is NHWC (TPU-preferred layout).

Serialization keeps the reference's two-file contract
(``vqvae.py:304-342``): constructor kwargs as JSON + weights blob, via
``VQVAEConfig`` (same JSON key names) and flax msgpack bytes.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, List, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import serialization

from ...signal.normalizer import DataNormalizer
from ...signal.spectrogram import make_masked_phase_transform
from .bottleneck import QuantizedBottleneck, UnquantizedBottleneck
from .encoder_decoder import Decoder, Encoder, UpsampleStack


def _log2_int(x: int) -> int:
    n = int(x)
    if n <= 0 or n & (n - 1):
        raise ValueError(f"resolution factor {x} must be a power of two")
    return n.bit_length() - 1


@dataclasses.dataclass
class VQVAEConfig:
    """Constructor kwargs, JSON-round-trippable with the reference's key
    names (``vqvae.py:65-122``). ``in_channel`` defaults to 2 (mag + IF):
    the reference's default of 3 is an upstream quirk never used in
    practice."""

    in_channel: int = 2
    num_hidden_channels: int = 128
    n_res_block: int = 2
    num_residual_channels: int = 32
    embed_dim: int = 64
    num_embeddings: Union[int, List[int]] = 512
    decay: float = 0.99
    groups: int = 1
    use_local_kernels: bool = False
    output_spectrogram_min_magnitude: Optional[float] = None
    resolution_factors: Mapping[str, int] = dataclasses.field(
        default_factory=lambda: {"bottom": 4, "top": 2})
    embeddings_initial_variance: float = 1.0
    normalizer_statistics: Optional[Mapping[str, float]] = None
    corruption_weights: Mapping[str, Optional[List[float]]] = (
        dataclasses.field(default_factory=lambda: {"top": None,
                                                   "bottom": None}))
    adapt_quantized_durations: bool = True
    disable_quantization: bool = False
    restarts_usage_threshold: float = 1.0
    # fastai-XResNet/skip-free-UNet alternative encoders/decoders
    # (reference --use_resnet path, encoder_decoder.py:344-447)
    use_resnet: bool = False
    resnet_layers_per_downsampling_block: int = 4
    resnet_expansion: int = 1
    use_pallas_lookup: bool = False

    @property
    def n_embed_t(self) -> int:
        n = self.num_embeddings
        return int(n if isinstance(n, int) else n[0])

    @property
    def n_embed_b(self) -> int:
        n = self.num_embeddings
        return int(n if isinstance(n, int) else n[1])

    @property
    def total_resolution_factor(self) -> int:
        return (int(self.resolution_factors["bottom"])
                * int(self.resolution_factors["top"]))

    def codemap_shapes(self, spec_shape: Tuple[int, int]
                       ) -> Dict[str, Tuple[int, int]]:
        """(F, T) spectrogram -> {'top': (f, t), 'bottom': (f, t)}."""
        f, t = spec_shape
        rb = int(self.resolution_factors["bottom"])
        rt = int(self.resolution_factors["top"])
        return {"bottom": (f // rb, t // rb),
                "top": (f // (rb * rt), t // (rb * rt))}

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=4)

    @classmethod
    def from_json(cls, blob: Union[str, Mapping[str, Any]]) -> "VQVAEConfig":
        d = dict(json.loads(blob) if isinstance(blob, str) else blob)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class VQVAE(nn.Module):
    """Flax module; use ``encode`` / ``decode`` / ``decode_code`` via
    ``apply(..., method=...)`` or the ``__call__`` training path."""

    config: VQVAEConfig

    def setup(self):
        cfg = self.config
        bottleneck_kwargs = dict(
            dim=cfg.embed_dim,
            decay=cfg.decay,
            embeddings_initial_variance=cfg.embeddings_initial_variance,
            restart_threshold=cfg.restarts_usage_threshold,
            use_pallas_lookup=cfg.use_pallas_lookup,
        )
        bottleneck_cls = (UnquantizedBottleneck if cfg.disable_quantization
                          else QuantizedBottleneck)
        corruption = dict(cfg.corruption_weights or {})

        if cfg.use_resnet:
            from .resnet import get_xresnet_unet
            encoders, decoders = get_xresnet_unet(
                cfg.in_channel, cfg.resolution_factors,
                cfg.num_hidden_channels, cfg.embed_dim,
                cfg.resnet_layers_per_downsampling_block,
                cfg.resnet_expansion)
            self.enc_b = encoders["bottom"]
            self.enc_t = encoders["top"]
        else:
            self.enc_b = Encoder(
                channel=cfg.num_hidden_channels,
                n_res_block=cfg.n_res_block,
                res_channel=cfg.num_residual_channels,
                resolution_factor=int(cfg.resolution_factors["bottom"]),
                groups=cfg.groups,
                use_local_kernels=cfg.use_local_kernels)
            self.enc_t = Encoder(
                channel=cfg.num_hidden_channels,
                n_res_block=cfg.n_res_block,
                res_channel=cfg.num_residual_channels,
                resolution_factor=int(cfg.resolution_factors["top"]),
                groups=cfg.groups,
                use_local_kernels=cfg.use_local_kernels)
        self.quantize_conv_t = nn.Conv(cfg.embed_dim, (1, 1))
        self.quantize_t = bottleneck_cls(
            n_embed=cfg.n_embed_t,
            corruption_weights=corruption.get("top"),
            **bottleneck_kwargs)
        if cfg.use_resnet:
            self.dec_t = decoders["top"]
        else:
            self.dec_t = Decoder(
                out_channel=cfg.embed_dim,
                channel=cfg.num_hidden_channels,
                n_res_block=cfg.n_res_block,
                res_channel=cfg.num_residual_channels,
                resolution_factor=int(cfg.resolution_factors["top"]),
                groups=cfg.groups,
                use_local_kernels=cfg.use_local_kernels)
        self.quantize_conv_b = nn.Conv(cfg.embed_dim, (1, 1))
        self.quantize_b = bottleneck_cls(
            n_embed=cfg.n_embed_b,
            corruption_weights=corruption.get("bottom"),
            **bottleneck_kwargs)
        self.upsample_top_to_bottom = UpsampleStack(
            channel=cfg.embed_dim,
            num_doublings=_log2_int(int(cfg.resolution_factors["top"])),
            use_local_kernels=cfg.use_local_kernels)
        if cfg.use_resnet:
            self.dec = decoders["bottom"]
        else:
            self.dec = Decoder(
                out_channel=cfg.in_channel,
                channel=cfg.num_hidden_channels,
                n_res_block=cfg.n_res_block,
                res_channel=cfg.num_residual_channels,
                resolution_factor=int(cfg.resolution_factors["bottom"]),
                groups=cfg.groups,
                use_local_kernels=cfg.use_local_kernels)

        self.normalizer = (DataNormalizer(cfg.normalizer_statistics)
                           if cfg.normalizer_statistics else None)
        self.output_transform = (
            make_masked_phase_transform(cfg.output_spectrogram_min_magnitude)
            if cfg.output_spectrogram_min_magnitude is not None else None)

    # -- forward paths ------------------------------------------------------
    def __call__(self, input: jnp.ndarray, train: bool = False):
        """[B, C, F, T] -> (dec, diff, perplexity_t, perplexity_b, id_t, id_b)
        (reference ``vqvae.py:245-249`` ordering)."""
        (quant_t, quant_b, diff, id_t, id_b,
         perplexity_t, perplexity_b) = self.encode(input, train=train)
        dec = self.decode(quant_t, quant_b)
        return dec, diff, perplexity_t, perplexity_b, id_t, id_b

    def encode(self, input: jnp.ndarray, train: bool = False):
        """[B, C, F, T] -> (quant_t, quant_b, diff, id_t, id_b, perp_t,
        perp_b); quantized maps channel-first [B, D, f, t]."""
        if self.normalizer is not None:
            input = self.normalizer.normalize(input)
        x = jnp.transpose(input, (0, 2, 3, 1))  # NHWC

        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)

        qt_in = self.quantize_conv_t(enc_t)
        quant_t, diff_t, id_t, perplexity_t = self.quantize_t(
            qt_in, train=train)

        dec_t = self.dec_t(quant_t)
        cat = jnp.concatenate([dec_t, enc_b], axis=-1)
        qb_in = self.quantize_conv_b(cat)
        quant_b, diff_b, id_b, perplexity_b = self.quantize_b(
            qb_in, train=train)

        quant_t = jnp.transpose(quant_t, (0, 3, 1, 2))
        quant_b = jnp.transpose(quant_b, (0, 3, 1, 2))
        return (quant_t, quant_b, diff_t + diff_b, id_t, id_b,
                perplexity_t, perplexity_b)

    def decode(self, quant_t: jnp.ndarray, quant_b: jnp.ndarray
               ) -> jnp.ndarray:
        """Channel-first quantized maps -> [B, C, F, T] spectrogram."""
        qt = jnp.transpose(quant_t, (0, 2, 3, 1))
        qb = jnp.transpose(quant_b, (0, 2, 3, 1))
        upsampled = self.upsample_top_to_bottom(qt)
        quant = jnp.concatenate([upsampled, qb], axis=-1)
        dec = self.dec(quant)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        return self.post_process(dec)

    def decode_code(self, code_t: jnp.ndarray, code_b: jnp.ndarray
                    ) -> jnp.ndarray:
        """Integer codemaps [B, f, t] -> decoded spectrogram [B, C, F, T]."""
        quant_t = self.quantize_t.embed_code(code_t)  # [B, f, t, D]
        quant_b = self.quantize_b.embed_code(code_b)
        return self.decode(jnp.transpose(quant_t, (0, 3, 1, 2)),
                           jnp.transpose(quant_b, (0, 3, 1, 2)))

    def encode_codes_only(self, input: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, C, F, T] -> (id_t, id_b): the extract_code.py hot path."""
        _, _, _, id_t, id_b, _, _ = self.encode(input, train=False)
        return id_t, id_b

    def post_process(self, dec: jnp.ndarray) -> jnp.ndarray:
        if self.normalizer is not None:
            dec = self.normalizer.denormalize(dec)
        if self.output_transform is not None:
            dec = self.output_transform(dec)
        return dec


# -- persistence (two-file contract: params JSON + weights blob) -------------

def save_model(directory: Union[str, pathlib.Path], config: VQVAEConfig,
               variables: Mapping[str, Any],
               prefix: str = "vqvae") -> None:
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / f"{prefix}-model_parameters.json").write_text(
        config.to_json())
    (directory / f"{prefix}-weights.msgpack").write_bytes(
        serialization.to_bytes(variables))


def from_parameters_and_weights(
        parameters_json_path: Union[str, pathlib.Path],
        model_weights_path: Union[str, pathlib.Path],
) -> Tuple[VQVAE, Dict[str, Any]]:
    """Re-instantiate a stored model (reference ``vqvae.py:304-337``)."""
    config = VQVAEConfig.from_json(
        pathlib.Path(parameters_json_path).read_text())
    model = VQVAE(config)
    blob = pathlib.Path(model_weights_path).read_bytes()
    # build a matching variable skeleton, then overlay stored weights.
    # jitted: eager init on a remote/tunneled backend pays one round
    # trip per op (minutes of startup for the full model)
    f = config.total_resolution_factor
    dummy = jnp.zeros((1, config.in_channel, 2 * f, f), jnp.float32)
    skeleton = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, dummy)
    variables = serialization.from_bytes(skeleton, blob)
    return model, variables
