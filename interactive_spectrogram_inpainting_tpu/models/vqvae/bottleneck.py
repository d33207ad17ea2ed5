"""EMA vector-quantization bottlenecks (Sonnet-style), TPU-native.

Behavioral equivalent of the reference's
``interactive_spectrogram_inpainting/vqvae/bottleneck.py:30-166``
(``QuantizedBottleneck`` / ``UnquantizedBottleneck`` /
``QuantizedBottleneckWithRestarts``), re-designed for SPMD:

- codebook state (``embed``, ``cluster_size``, ``embed_avg``) lives in a
  flax ``codebook`` variable collection, updated functionally during the
  train step (``apply(..., mutable=['codebook'])``);
- under ``pjit`` with a batch-sharded input and replicated codebook, the
  one-hot count / embedding-sum reductions are *global* reductions — XLA
  inserts the cross-replica collectives, so all replicas compute identical
  EMA updates. This is strictly stronger than the reference, whose
  per-replica DDP buffers silently diverge across GPUs.
- the distance + argmin + gather lookup is a single fused expression that
  XLA maps onto the MXU (one [N, K] matmul); ``ops/vq_lookup.py`` provides
  a hand-fused Pallas kernel alternative for large codebooks.

The straight-through estimator, commitment ``diff``, usage perplexity,
training-time code corruption (random +/-1 with multinomial weights,
``bottleneck.py:63-73``) and dead-code random restarts
(``bottleneck.py:122-162``) all match the reference's semantics.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def nearest_code(flat: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||flat_n - embed[:, k]||^2 -> [N] int32.

    One MXU matmul: ||x||^2 - 2 x.e + ||e||^2 (the ||x||^2 term is constant
    in k and dropped).
    """
    x_dot_e = jnp.dot(flat, embed, preferred_element_type=jnp.float32)
    e_sq = jnp.sum(embed * embed, axis=0)
    return jnp.argmin(e_sq[None, :] - 2.0 * x_dot_e, axis=1).astype(jnp.int32)


class QuantizedBottleneck(nn.Module):
    """EMA-codebook vector quantizer.

    Call signature: ``(x [B, H, W, dim], train) ->
    (quantized [B, H, W, dim], diff scalar, ids [B, H, W] int32,
    perplexity scalar)``.
    """

    dim: int
    n_embed: int
    decay: float = 0.99
    eps: float = 1e-5
    embeddings_initial_variance: float = 1.0
    corruption_weights: Optional[List[float]] = None
    # < 1.0 enables dead-code random restarts: codes whose EMA usage share
    # falls below ``restart_threshold / n_embed`` are re-seeded from the
    # current batch (reference: QuantizedBottleneckWithRestarts).
    restart_threshold: float = 1.0
    # fused Pallas lookup (ops/vq_lookup.py): distance+argmin+quantize+
    # EMA statistics in one kernel, no [N, K] HBM intermediates.
    # Incompatible with corruption_weights (falls back to dense).
    use_pallas_lookup: bool = False

    def setup(self):
        scale = float(self.embeddings_initial_variance) ** 0.5

        def init_embed(key):
            return scale * jax.random.normal(
                key, (self.dim, self.n_embed), dtype=jnp.float32)

        self.embed = self.variable(
            "codebook", "embed",
            lambda: init_embed(self.make_rng("params")))
        self.cluster_size = self.variable(
            "codebook", "cluster_size",
            lambda: jnp.zeros((self.n_embed,), jnp.float32))
        self.embed_avg = self.variable(
            "codebook", "embed_avg", lambda: self.embed.value)

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        embed = self.embed.value  # [dim, n_embed]
        flat = x.reshape(-1, self.dim).astype(jnp.float32)

        use_fused = (self.use_pallas_lookup
                     and self.corruption_weights is None)
        if use_fused:
            from ...ops.vq_lookup import fused_vq_lookup
            ids, quantize_flat, counts, embed_sum = fused_vq_lookup(
                jax.lax.stop_gradient(flat), embed)
            probs = counts / flat.shape[0]
        else:
            ids = nearest_code(flat, embed)

        if train and self.corruption_weights is not None:
            # random +/-1 code corruption with the given weights
            # (reference bottleneck.py:63-73)
            rng = self.make_rng("corruption")
            w = jnp.asarray(self.corruption_weights, dtype=jnp.float32)
            shift = jax.random.categorical(
                rng, jnp.log(w + 1e-20), shape=ids.shape) - 1
            ids = (ids + shift) % self.n_embed

        if not use_fused:
            onehot = jax.nn.one_hot(ids, self.n_embed, dtype=jnp.float32)
            quantize_flat = jnp.take(embed.T, ids, axis=0)
            probs = jnp.mean(onehot, axis=0)
            if train:
                # global reductions: under pjit these psum over 'data'
                counts = jnp.sum(onehot, axis=0)  # [n_embed]
                embed_sum = jnp.dot(flat.T, onehot,
                                    preferred_element_type=jnp.float32)

        if train:
            new_cluster = self.decay * self.cluster_size.value \
                + (1.0 - self.decay) * counts
            new_avg = self.decay * self.embed_avg.value \
                + (1.0 - self.decay) * embed_sum
            n = jnp.sum(new_cluster)
            smoothed = ((new_cluster + self.eps)
                        / (n + self.n_embed * self.eps) * n)
            new_embed = new_avg / smoothed[None, :]

            if self.restart_threshold < 1.0:
                usage_share = new_cluster / jnp.maximum(n, 1e-8)
                dead = usage_share < (self.restart_threshold / self.n_embed)
                rng = self.make_rng("restart")
                src = jax.random.randint(
                    rng, (self.n_embed,), 0, flat.shape[0])
                random_vectors = flat[src].T  # [dim, n_embed]
                new_embed = jnp.where(dead[None, :], random_vectors, new_embed)
                new_avg = jnp.where(dead[None, :],
                                    random_vectors * (1.0 - self.decay)
                                    + self.decay * new_avg, new_avg)

            if not self.is_initializing():
                self.cluster_size.value = new_cluster
                self.embed_avg.value = new_avg
                self.embed.value = new_embed

        quantize = quantize_flat.reshape(x.shape)
        diff = jnp.mean(
            (jax.lax.stop_gradient(quantize) - x) ** 2)
        quantize = x + jax.lax.stop_gradient(quantize - x)

        perplexity = jnp.exp(
            -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-7))))
        return quantize, diff, ids.reshape(x.shape[:-1]), perplexity

    def embed_code(self, ids: jnp.ndarray) -> jnp.ndarray:
        """[...] int -> [..., dim] codebook lookup."""
        return jnp.take(self.embed.value.T, ids, axis=0)


class UnquantizedBottleneck(nn.Module):
    """Passthrough for the ``--disable_quantization`` ablation
    (reference ``bottleneck.py:107-119``)."""

    dim: int
    n_embed: int
    decay: float = 0.99
    embeddings_initial_variance: float = 1.0
    corruption_weights: Optional[List[float]] = None
    restart_threshold: float = 1.0
    use_pallas_lookup: bool = False

    def __call__(self, x: jnp.ndarray, train: bool = False):
        diff = jnp.zeros((), dtype=x.dtype)
        ids = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
        perplexity = jnp.asarray(jnp.inf, dtype=jnp.float32)
        return x, diff, ids, perplexity

    def embed_code(self, ids: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "UnquantizedBottleneck has no codebook to embed from")
