"""Device mesh construction.

The reference's only parallelism is DDP data-parallel over NCCL
(configs/stage1_ae.yaml:72-73, SURVEY.md §2.2). The TPU-native equivalent is
one jax.sharding.Mesh whose "data" axis carries the batch; an optional
"model" axis tensor-shards the wide matmuls and the codebook. XLA compiles
the collectives (grad/metric reductions ride ICI); there is no user-level
backend selection.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data x model) mesh over the available devices.

    Defaults: model=1 and data=all devices (pure data parallel, the
    reference's strategy). `dryrun` harnesses pass explicit sizes.
    """
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        assert len(devs) % model == 0, (len(devs), model)
        data = len(devs) // model
    if data * model != len(devs):
        devs = devs[: data * model]
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, axis_names)


def mesh_axis_sizes(mesh: Mesh) -> Dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))
