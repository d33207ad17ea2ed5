"""TPU-native interactive spectrogram inpainting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
SonyCSLParis/interactive-spectrogram-inpainting (the NOTONO model backend):

- GANSynth-style invertible log-mel-magnitude + instantaneous-frequency
  spectrogram transform (``signal/``),
- hierarchical two-level VQ-VAE-2 with EMA codebooks (``models/vqvae``),
- relative-attention autoregressive transformer priors over codemaps
  (``models/prior``),
- KV-cached masked inpainting sampler (``sampling/``),
- SPMD data/model-parallel training over a ``jax.sharding.Mesh``
  (``parallel/``, ``train/``),
- an HTTP serving layer exposing the NOTONO endpoints (``serve/``).

Everything on the compute path is jittable, statically shaped, and designed
for the TPU MXU/VPU + HBM model; hot ops have Pallas kernels in ``ops/``.
"""

__version__ = "0.1.0"
