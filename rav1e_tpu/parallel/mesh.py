"""Device mesh construction for tile/superblock sharding.

Reference analog: rayon thread pool over tiles (src/tiling/tiler.rs).  Here
tiles/superblock batches shard over a 1-D `sb` mesh axis (ICI); the GOP/host
axis (DCN) is added when multi-host lands.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "sb") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
