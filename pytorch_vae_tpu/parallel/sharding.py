"""Logical-axis -> mesh-axis sharding rules.

Model code annotates parameters with logical axes ("embed", "heads", "mlp",
"kv"; models/layers.py). These rules map them onto the physical mesh:

  - batch        -> "data"   (data parallel, the reference's DDP equivalent)
  - mlp / heads  -> "model"  (tensor parallel over FFN hidden + attn heads)
  - embed / kv   -> replicated

With model=1 every parameter is effectively replicated and the jit is pure
data parallel. The VQ codebook shards its K axis on "model" when large.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn
from flax.core import meta
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOGICAL_RULES = (
    ("batch", "data"),
    ("embed", None),
    ("mlp", "model"),
    ("heads", "model"),
    ("kv", None),
    ("vocab", "model"),
    ("codes", "model"),
)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split on the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply logical partitioning metadata -> NamedShardings and place params.

    Works on a pytree that may contain flax `Partitioned` leaves (from
    nn.with_logical_partitioning) mixed with plain arrays (replicated).
    """
    logical_specs = nn.get_partition_spec(params)
    phys_specs = nn.logical_to_mesh(logical_specs, LOGICAL_RULES)

    def place(x, spec):
        if isinstance(x, meta.Partitioned):
            x = x.value
        sh = NamedSharding(mesh, spec if spec is not None else P())
        return jax.device_put(x, sh)

    unboxed = meta.unbox(params)
    return jax.tree.map(place, unboxed, phys_specs,
                        is_leaf=lambda v: isinstance(v, meta.Partitioned))


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching `params` (boxed or unboxed)."""
    logical_specs = nn.get_partition_spec(params)
    phys_specs = nn.logical_to_mesh(logical_specs, LOGICAL_RULES)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec if spec is not None else P()),
        phys_specs,
        is_leaf=lambda v: isinstance(v, P) or v is None,
    )
