"""Pallas fused nearest-codebook lookup (+ EMA statistics).

The VQ bottleneck's hot op (reference ``bottleneck.py:55-61``; the
"fused distance+argmin+gather" kernel named in BASELINE.json): the XLA
path materializes an [N, K] distance matrix in HBM, then re-reads it for
argmin, one-hot, counts and embedding sums. This kernel tiles N and, per
tile, computes in VMEM:

    scores   = ||e||^2 - 2 x.e              (one MXU matmul)
    ids      = argmin_k scores
    onehot   = (iota == ids)
    quantize = onehot @ e^T                 (MXU; no dynamic gather)
    counts  += sum(onehot)                  (EMA cluster statistics)
    esum    += x^T @ onehot                 (EMA embedding sums)

so the only HBM traffic is x in, (ids, quantize) out, plus the K-sized
accumulators — the [N, K] intermediates never leave the chip. The
embedding dim is zero-padded to the 128-lane tile (distances unchanged).

Used by ``QuantizedBottleneck`` when ``use_pallas_lookup`` is on;
falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(x_ref, embed_ref, embed_sq_ref, ids_ref, quant_ref,
               counts_ref, esum_ref, *, block_n: int, n_embed: int,
               dim_padded: int):
    i = pl.program_id(0)
    x = x_ref[:]  # [block_n, dim_padded]
    embed = embed_ref[:]  # [dim_padded, K]
    xe = jnp.dot(x, embed, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    scores = embed_sq_ref[:] - 2.0 * xe  # [block_n, K]
    ids = jnp.argmin(scores, axis=1).astype(jnp.int32)
    ids_ref[:] = ids.reshape(block_n, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, n_embed), 1)
    onehot = (k_iota == ids[:, None]).astype(jnp.float32)
    quant_ref[:] = jnp.dot(onehot, embed.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        esum_ref[:] = jnp.zeros_like(esum_ref)

    counts_ref[:] = counts_ref[:] + jnp.sum(onehot, axis=0,
                                            keepdims=True)
    esum_ref[:] = esum_ref[:] + jnp.dot(
        x.T, onehot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def fused_vq_lookup(flat: jnp.ndarray, embed: jnp.ndarray,
                    block_n: int = 512,
                    interpret: Optional[bool] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray]:
    """flat [N, dim] f32, embed [dim, K] -> (ids [N] i32,
    quantized [N, dim] f32, counts [K] f32, embed_sum [dim, K] f32).

    N is padded internally to a multiple of ``block_n``; padded rows are
    excluded from counts/sums by the caller's mask... they are *included*
    in the raw outputs, so the caller slices [:N] and subtracts nothing:
    padded rows are zeros, which quantize to some code — counts/esum for
    them are corrected here before returning.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, dim = flat.shape
    k = embed.shape[1]
    dim_p = ((dim + 127) // 128) * 128
    n_p = ((n + block_n - 1) // block_n) * block_n
    x = jnp.zeros((n_p, dim_p), jnp.float32)
    x = x.at[:n, :dim].set(flat.astype(jnp.float32))
    e = jnp.zeros((dim_p, k), jnp.float32)
    e = e.at[:dim].set(embed.astype(jnp.float32))
    e_sq = jnp.sum(e * e, axis=0, keepdims=True)  # [1, K]

    grid = (n_p // block_n,)
    kernel = functools.partial(_vq_kernel, block_n=block_n, n_embed=k,
                               dim_padded=dim_p)
    ids, quant, counts, esum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, dim_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dim_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim_p, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_p, dim_p), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((dim_p, k), jnp.float32),
        ],
        interpret=interpret,
    )(x, e, e_sq)

    ids = ids[:n, 0]
    quant = quant[:n, :dim]
    counts = counts[0]
    esum = esum[:dim]
    # correct for the zero-padded rows (they all map to one code)
    n_pad = n_p - n
    if n_pad:
        pad_id = jnp.argmin(e_sq[0] - 0.0)  # nearest code to the origin
        counts = counts.at[pad_id].add(-float(n_pad))
        # zero rows contribute nothing to esum (x == 0)
    return ids, quant, counts, esum


def reference_vq_lookup(flat, embed):
    """Dense XLA equivalent."""
    flat = flat.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    xe = jnp.dot(flat, embed)
    scores = jnp.sum(embed * embed, axis=0)[None] - 2.0 * xe
    ids = jnp.argmin(scores, axis=1).astype(jnp.int32)
    onehot = jax.nn.one_hot(ids, embed.shape[1], dtype=jnp.float32)
    quant = jnp.take(embed.T, ids, axis=0)
    counts = jnp.sum(onehot, axis=0)
    esum = jnp.dot(flat.T, onehot)
    return ids, quant, counts, esum
