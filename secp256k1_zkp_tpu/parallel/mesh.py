"""Device mesh helpers for multi-chip execution.

The reference library is strictly single-threaded (SURVEY.md §2.3); all
parallel structure here is new, TPU-native design: batch ("dp") sharding
for independent sign/verify lanes and point-sharded MSM with explicit
EC-add reductions over the mesh ("pp/ep" analog, SURVEY.md §2.3.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for limb tensors / byte tensors."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
