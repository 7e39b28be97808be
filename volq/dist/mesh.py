"""Device mesh construction (SURVEY.md section 2 'parallelism strategies').

The engine's only cross-chip axes are data-parallel: screen tiles for the
render (rays never exchange data) and particle slots for the sim (gathered
before binning).  One 1-D mesh axis serves both; collectives ride ICI via
shard_map — there is no NCCL-like transport to wrap, jax's runtime is the
communication backend.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))
