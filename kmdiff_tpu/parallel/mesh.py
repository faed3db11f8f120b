"""Device mesh construction.

One logical axis for now: "rows" — the k-mer row axis that every pipeline
stage shards over (counting shuffle, LRT, popstrat IRLS). The reference's
analogue is its partition thread pool (merge.hpp:259-309); on TPU the axis
rides the ICI torus via jax.sharding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROW_AXIS) -> Mesh:
    # local devices only: under multi-process (jax.distributed) the
    # pipeline parallelizes by PARTITION across processes (different data
    # per process), so the SPMD mesh must not span processes
    devs = jax.local_devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"with JAX_PLATFORMS=cpu for virtual meshes)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
