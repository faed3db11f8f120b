"""Multi-host runtime initialization.

The reference is strictly single-node (SURVEY.md §2.3); kmdiff-tpu scales
across hosts with jax.distributed: every host runs the same program, owns a
slice of the samples during counting and a slice of the k-mer rows during
the diff, and the collectives (all_to_all regroup, psum counters/totals)
ride ICI within a slice and DCN across slices.

Host-side orchestration contract:
  * host h of H processes counts samples [h::H] and serves partition files
    for partitions p with (p % world) owned locally;
  * `init_distributed` wires the jax runtime; everything downstream uses
    the global mesh exactly like the single-host path (shard_map specs are
    identical — only the device list grows).

A 2-process CPU-mesh smoke test lives in tests/test_distributed.py
(spawned subprocesses, coordinator on localhost), standing in for real
multi-host hardware.
"""

from __future__ import annotations

import os

import jax

from kmdiff_tpu.utils.logging import logger


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (KMDIFF_COORDINATOR, KMDIFF_NUM_PROCESSES, KMDIFF_PROCESS_ID — or the
    cloud-provided defaults jax auto-detects). Returns True when a
    multi-process runtime is active."""
    coordinator = coordinator or os.environ.get("KMDIFF_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("KMDIFF_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid_env = os.environ.get("KMDIFF_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None

    if not coordinator or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed runtime: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def owned_samples(n_samples: int) -> list[int]:
    """Sample indices this host counts (round-robin by process)."""
    h, H = jax.process_index(), max(jax.process_count(), 1)
    return list(range(h, n_samples, H))


def owned_partitions(n_partitions: int) -> list[int]:
    """Partition indices this host merges/aggregates."""
    h, H = jax.process_index(), max(jax.process_count(), 1)
    return list(range(h, n_partitions, H))


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process rendezvous (DCN); no-op single-process. Used at the
    shared-filesystem handoffs: count -> diff merge -> popstrat/aggregate
    (the multi-host analogue of the reference's thread joins,
    threadpool.cpp:41-50)."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"kmdiff:{name}")


def global_sum(values: list[int]) -> list[int]:
    """Element-wise sum of per-process counters across all processes."""
    if not is_distributed():
        return list(values)
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray(values, dtype=np.int64)
    )
    return np.asarray(gathered).sum(axis=0).tolist()
