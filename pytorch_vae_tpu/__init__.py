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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out: PVT_NO_COMPILE_CACHE=1).

    On this image every TPU compile round-trips a remote compiler
    (100-300 s for the flagship step; even the tiny OT top-2 scan paid
    ~270 s, r3 measurement) and NOTHING was cached across processes —
    every CLI invocation re-paid it. The persistent cache serializes
    executables to disk so reruns of any script (bench, extraction,
    generation, serving workers) skip compilation entirely. Backends
    that cannot serialize executables make jax skip caching with a
    warning — harmless.
    """
    import os

    if os.environ.get("PVT_NO_COMPILE_CACHE") == "1":
        return
    # CPU compiles are fast and XLA:CPU AOT entries embed machine-feature
    # sets that may not match the loading host (cpu_aot_loader warns of
    # possible SIGILL) — the cache only pays off for device backends.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/pvt_jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # never block import on cache plumbing
        pass


_enable_compilation_cache()
