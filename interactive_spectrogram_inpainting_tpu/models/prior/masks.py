"""Training-time inpainting mask samplers for the self-conditional prior.

Behavioral equivalent of
``interactive_spectrogram_inpainting/priors/sequence_mask.py:7-82``; masks
are boolean [B, L] arrays over flattened sequences, ``True`` = masked (to
be regenerated). Functional JAX RNG instead of torch global state; every
sampler is jittable with static shapes.

``ContiguousZonesSequenceMask`` — left unimplemented in the reference
(``sequence_mask.py:80-82``) — is implemented here: it masks a contiguous
span of random length/offset, the natural mask for the server's time-range
regeneration requests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SequenceMask:
    def __init__(self, sequence_duration: int, mask_token_index: int):
        self.sequence_duration = int(sequence_duration)
        self.mask_token_index = int(mask_token_index)

    def sample_mask(self, rng: jax.Array, batch_size: int = 1) -> jnp.ndarray:
        raise NotImplementedError("subclass this")

    def apply_mask(self, rng: jax.Array, input: jnp.ndarray) -> jnp.ndarray:
        mask = self.sample_mask(rng, batch_size=input.shape[0])
        return jnp.where(mask, self.mask_token_index, input)


class BernoulliSequenceMask(SequenceMask):
    def __init__(self, probability: float, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.probability = float(probability)

    def sample_mask(self, rng, batch_size: int = 1) -> jnp.ndarray:
        return jax.random.bernoulli(
            rng, self.probability, (batch_size, self.sequence_duration))


class UniformProbabilityBernoulliSequenceMask(SequenceMask):
    """Bernoulli mask whose probability is itself uniform in [low, high]."""

    def __init__(self, low: float = 0.0, high: float = 1.0, *args, **kwargs):
        assert 0 <= low < high <= 1
        super().__init__(*args, **kwargs)
        self.low = float(low)
        self.high = float(high)

    def sample_mask(self, rng, batch_size: int = 1) -> jnp.ndarray:
        rng_p, rng_b = jax.random.split(rng)
        p = jax.random.uniform(rng_p, (), minval=self.low, maxval=self.high)
        return jax.random.bernoulli(
            rng_b, p, (batch_size, self.sequence_duration))


class UniformMaskedAmountSequenceMask(SequenceMask):
    """Mask exactly k tokens, k ~ Uniform[min_amount, L]; positions chosen
    without replacement (same k for the whole batch, like the reference)."""

    def __init__(self, min_masking_ratio: float = 0.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.min_masking_ratio = float(min_masking_ratio)
        self.min_masked_amount = int(
            jnp.ceil(self.sequence_duration * self.min_masking_ratio))

    def sample_mask(self, rng, batch_size: int = 1) -> jnp.ndarray:
        rng_k, rng_perm = jax.random.split(rng)
        k = jax.random.randint(
            rng_k, (), self.min_masked_amount, self.sequence_duration + 1)
        # rank of each position under a random per-row permutation;
        # mask the first k ranks -> exactly k masked without replacement
        scores = jax.random.uniform(
            rng_perm, (batch_size, self.sequence_duration))
        ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        return ranks < k


class ContiguousZonesSequenceMask(SequenceMask):
    """Mask one contiguous span with random offset and length."""

    def __init__(self, min_masking_ratio: float = 0.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.min_masked_amount = max(
            1, int(jnp.ceil(self.sequence_duration
                            * float(min_masking_ratio))))

    def sample_mask(self, rng, batch_size: int = 1) -> jnp.ndarray:
        rng_len, rng_off = jax.random.split(rng)
        length = jax.random.randint(
            rng_len, (batch_size,), self.min_masked_amount,
            self.sequence_duration + 1)
        offset = jax.random.randint(
            rng_off, (batch_size,), 0, self.sequence_duration)
        offset = jnp.minimum(offset, self.sequence_duration - length)
        pos = jnp.arange(self.sequence_duration)[None, :]
        return (pos >= offset[:, None]) & (pos < (offset + length)[:, None])
