"""Port reference (PyTorch) VQ-VAE checkpoints into this framework.

The reference stores ``torch`` state dicts (``vqvae.py:304-337``); users
migrating from it can load those weights into the flax ``VQVAE`` with
:func:`port_vqvae_state_dict` and get bit-identical codemap assignments
(same argmin code indices) and <1e-3 reconstruction deltas — the parity
contract of ``BASELINE.json``, enforced by
``tests/test_reference_parity.py`` which runs the actual reference model.

Layout mappings (empirically validated against torch 2.x):

- ``nn.Conv2d`` weight ``[O, I/g, kH, kW]`` -> flax ``nn.Conv`` kernel
  ``[kH, kW, I/g, O]`` (pure transpose; torch convs are correlations,
  same as XLA's);
- ``nn.ConvTranspose2d(k=2s, stride=s, padding=s//2)`` weight
  ``[I, O/g, kH, kW]`` -> flax ``nn.ConvTranspose(padding='SAME')``
  kernel ``[kH, kW, I, O]`` with the spatial dims FLIPPED (torch's
  transposed conv convolves, flax's correlates);
- EMA codebook buffers (``embed [dim, n_embed]``, ``cluster_size``,
  ``embed_avg``) carry over unchanged into the ``codebook`` collection.

Only numpy is required here: pass ``{k: v.numpy() for k, v in
model.state_dict().items()}`` (no torch import in this module).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

from ..models.vqvae.vqvae import VQVAEConfig


def port_conv2d(weight: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [O, I/g, kH, kW] -> flax kernel [kH, kW, I/g, O]."""
    return np.ascontiguousarray(np.transpose(weight, (2, 3, 1, 0)))


def port_conv_transpose2d(weight: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [I, O/g, kH, kW] -> flax
    ``nn.ConvTranspose(padding='SAME', transpose_kernel=False)`` kernel
    [kH, kW, I, O] (spatially flipped)."""
    return np.ascontiguousarray(
        np.transpose(weight[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _encoder_map(n_down: int, n_res: int) -> List[Tuple[str, str, str]]:
    """(torch prefix, flax path, kind) for a RosinalityEncoder
    (reference ``encoder_decoder.py:38-126``): ``n_down`` strided convs at
    even block indices, one trailing 3x3, then ``n_res`` residual blocks
    whose convs sit at ``.conv.1`` / ``.conv.3``."""
    maps = [(f"blocks.{2 * i}", f"Conv_{i}", "conv")
            for i in range(n_down)]
    maps.append((f"blocks.{2 * n_down}", f"Conv_{n_down}", "conv"))
    base = 2 * n_down + 1
    for r in range(n_res):
        maps.append((f"blocks.{base + r}.conv.1",
                     f"ResBlock_{r}/Conv_0", "conv"))
        maps.append((f"blocks.{base + r}.conv.3",
                     f"ResBlock_{r}/Conv_1", "conv"))
    return maps


def _decoder_map(n_up: int, n_res: int) -> List[Tuple[str, str, str]]:
    """RosinalityDecoder (reference ``encoder_decoder.py:129-227``):
    3x3 conv, residual blocks, ReLU, then ``n_up`` transposed convs at
    every other block index."""
    maps = [("blocks.0", "Conv_0", "conv")]
    for r in range(n_res):
        maps.append((f"blocks.{1 + r}.conv.1",
                     f"ResBlock_{r}/Conv_0", "conv"))
        maps.append((f"blocks.{1 + r}.conv.3",
                     f"ResBlock_{r}/Conv_1", "conv"))
    base = 1 + n_res + 1  # +1 skips the ReLU
    for i in range(n_up):
        maps.append((f"blocks.{base + 2 * i}",
                     f"ConvTranspose_{i}", "convT"))
    return maps


def _n_down(resolution_factor: int) -> int:
    return {2: 1, 4: 2, 8: 3, 16: 4}[int(resolution_factor)]


def _set_path(tree: Dict[str, Any], path: str, leaf: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    assert node[parts[-1]].shape == leaf.shape, (
        f"{path}: shape {leaf.shape} != expected {node[parts[-1]].shape}")
    node[parts[-1]] = leaf.astype(np.float32)


def port_vqvae_state_dict(state_dict: Mapping[str, np.ndarray],
                          skeleton: Mapping[str, Any],
                          config: VQVAEConfig) -> Dict[str, Any]:
    """Reference ``VQVAE.state_dict()`` (as numpy) -> flax variables.

    ``skeleton`` is ``model.init(...)`` output for the matching
    :class:`VQVAEConfig`; returns a new variables dict with every conv
    kernel/bias, quantize 1x1, upsampler, and codebook buffer replaced by
    the ported reference weights.
    """
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(skeleton))
    params = variables["params"]
    codebook = variables["codebook"]

    rf_b = _n_down(config.resolution_factors["bottom"])
    rf_t = _n_down(config.resolution_factors["top"])
    module_maps = {
        "enc_b": _encoder_map(rf_b, config.n_res_block),
        "enc_t": _encoder_map(rf_t, config.n_res_block),
        "dec_t": _decoder_map(rf_t, config.n_res_block),
        "dec": _decoder_map(rf_b, config.n_res_block),
    }
    for module, maps in module_maps.items():
        for torch_prefix, flax_path, kind in maps:
            w = np.asarray(state_dict[f"{module}.{torch_prefix}.weight"])
            b = np.asarray(state_dict[f"{module}.{torch_prefix}.bias"])
            kernel = (port_conv2d(w) if kind == "conv"
                      else port_conv_transpose2d(w))
            _set_path(params, f"{module}/{flax_path}/kernel", kernel)
            _set_path(params, f"{module}/{flax_path}/bias", b)

    for name in ("quantize_conv_t", "quantize_conv_b"):
        _set_path(params, f"{name}/kernel",
                  port_conv2d(np.asarray(state_dict[f"{name}.weight"])))
        _set_path(params, f"{name}/bias",
                  np.asarray(state_dict[f"{name}.bias"]))

    n_upsample = int(np.log2(config.resolution_factors["top"]))
    for i in range(n_upsample):
        w = np.asarray(state_dict[f"upsample_top_to_bottom.{i}.weight"])
        b = np.asarray(state_dict[f"upsample_top_to_bottom.{i}.bias"])
        _set_path(params,
                  f"upsample_top_to_bottom/ConvTranspose_{i}/kernel",
                  port_conv_transpose2d(w))
        _set_path(params,
                  f"upsample_top_to_bottom/ConvTranspose_{i}/bias", b)

    for level in ("quantize_t", "quantize_b"):
        for buf in ("embed", "cluster_size", "embed_avg"):
            _set_path(codebook, f"{level}/{buf}",
                      np.asarray(state_dict[f"{level}.{buf}"]))

    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, variables)
