"""Two-process jax.distributed smoke test (simulated multi-host on CPU).

Spawns two subprocesses that initialize a shared runtime, build a global
2-device mesh, and psum a sharded value — the communication pattern every
multi-host stage relies on (SURVEY.md §4's missing distributed coverage).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from kmdiff_tpu.parallel.distributed import init_distributed, owned_partitions

ok = init_distributed()
assert ok, "distributed init failed"
assert jax.process_count() == 2
assert jax.device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

mesh = Mesh(np.array(jax.devices()), ("rows",))
pid = jax.process_index()

def local(x):
    return jax.lax.psum(x.sum(), "rows").reshape(1)

step = jax.jit(shard_map(local, mesh=mesh, in_specs=(P("rows"),), out_specs=P()))
# the callback receives GLOBAL indices; each process materializes only the
# shard it owns (device for row pid)
global_data = np.array([1.0, 2.0], dtype=np.float32)
arr = jax.make_array_from_callback(
    (2,),
    NamedSharding(mesh, P("rows")),
    lambda idx: global_data[idx],
)
out = step(arr)
total = float(np.asarray(out)[0])
assert total == 3.0, f"psum got {total}"

parts = owned_partitions(5)
expect = [0, 2, 4] if pid == 0 else [1, 3]
assert parts == expect, parts
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("KMDIFF_SKIP_DISTRIBUTED") == "1",
    reason="distributed smoke test disabled",
)
def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            KMDIFF_COORDINATOR=f"127.0.0.1:{port}",
            KMDIFF_NUM_PROCESSES="2",
            KMDIFF_PROCESS_ID=str(pid),
            KMDIFF_NO_JAX_CACHE="1",
            PYTHONPATH="/root/repo",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
