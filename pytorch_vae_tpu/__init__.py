"""pytorch_vae_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the PyTorch-VAE
framework (reference: jluuser/PyTorch-VAE).

The framework covers two capability sets:

1. The curve VQ-VAE two-stage flow (stage1 AE -> stage2 residual VQ), with the
   AE-OT latent sampling pipeline, geometric curve filtering, extraction /
   decoding tools, and a FastAPI generation service.
   (reference: models/vq_vae.py, experiment.py, run.py, scripts/, api/)
2. The classic VAE model zoo for 64x64 image data (Vanilla VAE, Beta-VAE,
   WAE-MMD, IWAE/MIWAE, BetaTC-VAE, MSSIM-VAE) driven by the same YAML config
   loop. (reference: README.md model list; BASELINE.json configs)

Design: pure-functional JAX. Model code is flax.linen; all mutable training
state (params, optimizer, EMA codebook, step counter) lives in an explicit
TrainState pytree threaded through jitted steps. Multi-chip runs use a
jax.sharding.Mesh with GSPMD (batch on the "data" axis, wide matmuls/codebook
optionally on the "model" axis); XLA inserts all collectives.
"""

__version__ = "0.1.0"
