"""Test configuration: force CPU with 8 virtual devices.

This is the TPU-native answer to testing multi-chip code without a pod
(SURVEY.md §4): an 8-device host-platform mesh exercises the same GSPMD
partitioning and collective paths that run over ICI on real hardware.

The driver environment pins JAX_PLATFORMS=axon (a real-TPU tunnel) and a
sitecustomize hook initializes the PJRT plugin at interpreter startup, so
env mutation alone is not enough: we both override the platform env var AND
set jax_num_cpu_devices through the config API (which takes effect any time
before the CPU backend is first used).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax without the option
    pass
