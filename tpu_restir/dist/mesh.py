"""Device mesh setup for tile-sharded rendering.

The renderer's data parallelism (SURVEY.md §2.2 P6 / §5.8): pixel rows
shard over a 1-D mesh; scene/BVH/light tables replicate in HBM. This is
the TPU-native replacement for the reference's OpenMP scanline loops.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))
