"""Abstract model interface for the zoo registry.

Mirrors the reference's `BaseVAE` contract (models/base.py:5-28):
encode / decode / sample / generate / loss_function / __call__. In this
framework models are flax modules and loss_function is a *pure function*
over the forward outputs, so it can be jit-fused into the train step.
"""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn


class BaseVAE(nn.Module):
    """Interface marker. Subclasses implement:

    - ``__call__(x, ...) -> List``: forward pass returning the argument list
      that ``loss_function`` consumes (reference convention: results list).
    - ``encode(x) -> latents``
    - ``decode(z) -> reconstruction``
    - ``sample(num_samples, key, **kwargs) -> samples`` (may raise for
      models without an unconditional prior)
    - ``generate(x, **kwargs) -> reconstruction``
    - ``loss_function(*outputs, **kwargs) -> Dict[str, Array]`` with at
      least a ``"loss"`` entry.
    """

    def encode(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def decode(self, z):  # pragma: no cover - interface
        raise NotImplementedError

    def sample(self, num_samples: int, key, **kwargs):  # pragma: no cover
        raise RuntimeError(f"{type(self).__name__} does not support sampling")

    def generate(self, x, **kwargs):  # pragma: no cover - interface
        raise NotImplementedError

    def loss_function(self, *args, **kwargs) -> Dict[str, Any]:
        raise NotImplementedError
