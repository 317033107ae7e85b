"""Device-mesh helpers.

The reference's only parallelism is OpenMP fork-join over image rows
(SURVEY §2.5); the multi-device story here is new, TPU-native design:
images shard spatially ('sp'), frame batches shard over data ('dp'), and
the SLAM back-end shards observations/landmarks over the mesh with ICI
collectives (see vpp_tpu.slam.ba).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...], names: Tuple[str, ...],
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    grid = np.array(devs[:n]).reshape(shape)
    return Mesh(grid, names)


def shard_image_cols(mesh: Mesh, arr: jax.Array,
                     axis: str = "sp") -> jax.Array:
    """Place an (H, W...) array column-sharded over ``axis``."""
    spec = P(None, axis)
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, arr: jax.Array, axis: str = "dp") -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))
