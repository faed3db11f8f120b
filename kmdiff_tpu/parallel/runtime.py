"""Session mesh runtime: the product pipeline's device-parallel switch.

The reference's execution model is a thread pool over partitions
(reference: include/kmdiff/merge.hpp:237-317); the TPU equivalent is a
jax.sharding.Mesh over the chips. This module owns the process-wide mesh
the pipeline stages consult:

  * `configure(n_devices)` — called once by the CLI commands from the
    `--devices` flag (0 = all local devices).
  * `get_mesh()` — returns the mesh, or None when only one device is in
    play (single-chip dispatches skip the shard_map wrapper — same
    kernels, no collective overhead).

With a mesh active, the merge stage key-range-shards each partition's
triples over the devices (parallel.merge_step) and the counting stage
shards the extracted k-mer stream with an all_to_all partition regroup
(parallel.count_step) — multi-chip execution is the shipped default
whenever more than one device exists, not a side path.
"""

from __future__ import annotations

import os

from kmdiff_tpu.utils.logging import logger

_requested: int | None = None
_mesh = None
_resolved = False


def configure(n_devices: int | None) -> None:
    """Set the device budget before first use. 0 or None = all local
    devices; 1 disables the mesh path."""
    global _requested, _mesh, _resolved
    _requested = n_devices
    _mesh = None
    _resolved = False


def get_mesh():
    """The session mesh, built lazily; None when running on one device.

    Resolution: an explicit `configure(n)` (the CLI always calls it; 0 =
    auto, all devices) or the KMDIFF_DEVICES env var. Library callers that
    never configure stay single-device."""
    global _mesh, _resolved
    if _resolved:
        return _mesh
    import jax

    n = _requested
    env = os.environ.get("KMDIFF_DEVICES")
    if n is None and env:
        n = int(env)
    if n is None:
        _mesh = None
        _resolved = True
        return None
    avail = len(jax.local_devices())
    if n == 0:
        n = avail
    if n > avail:
        raise ValueError(
            f"--devices {n} requested but only {avail} available "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N with "
            f"a cpu backend for virtual meshes)"
        )
    if n <= 1:
        _mesh = None
    else:
        from kmdiff_tpu.parallel.mesh import make_mesh

        _mesh = make_mesh(n)
        logger.info("device mesh: %d devices on axis 'rows'.", n)
    _resolved = True
    return _mesh
