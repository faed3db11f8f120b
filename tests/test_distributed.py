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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
            PYTHONPATH=REPO,
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


_PIPELINE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from kmdiff_tpu.parallel.distributed import init_distributed
assert init_distributed()

work = os.environ["KMDIFF_TEST_WORK"]
from kmdiff_tpu.cmd.count import main_count
from kmdiff_tpu.cmd.diff import main_diff
from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
from kmdiff_tpu.core.corrector import CorrectionType

main_count(CountOptions(
    fof=os.path.join(work, "fof.txt"),
    directory=os.path.join(work, "run_dist"),
    kmer_size=21, hard_min=1, nb_partitions=5, nb_threads=2,
))
res = main_diff(DiffOptions(
    kmtricks_dir=os.path.join(work, "run_dist"),
    output_directory=os.path.join(work, "out_dist"),
    nb_controls=2, nb_cases=2, threshold=0.8, cutoff=1.0,
    correction=CorrectionType.BONFERRONI, nb_threads=2,
))
print(f"proc {jax.process_index()} RES {res['total_kmers']}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("KMDIFF_SKIP_DISTRIBUTED") == "1",
    reason="distributed smoke test disabled",
)
def test_two_process_count_diff_pipeline(tmp_path):
    """The PRODUCT pipeline across 2 processes over a shared filesystem:
    samples round-robin in count, partitions round-robin in the merge,
    primary-only popstrat/aggregation — outputs byte-identical to a
    single-process run."""
    import numpy as np

    rng = np.random.default_rng(21)
    bases = np.array(list("ACGT"))
    shared_c = ["".join(rng.choice(bases, 120)) for _ in range(3)]
    shared_k = ["".join(rng.choice(bases, 120)) for _ in range(3)]
    fof_lines = []
    for sid in ("C1", "C2", "K1", "K2"):
        fa = tmp_path / f"{sid}.fasta"
        shared = shared_c if sid.startswith("C") else shared_k
        with open(fa, "w") as f:
            for j, s in enumerate(shared):
                for r in range(6):
                    f.write(f">s{j}_{r}\n{s}\n")
            for j in range(3):
                f.write(f">r{j}\n{''.join(rng.choice(bases, 120))}\n")
        fof_lines.append(f"{sid} : {fa}")
    (tmp_path / "fof.txt").write_text("\n".join(fof_lines) + "\n")

    # single-process reference run (in-process; conftest resets runtime)
    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType

    main_count(CountOptions(
        fof=str(tmp_path / "fof.txt"), directory=str(tmp_path / "run_ref"),
        kmer_size=21, hard_min=1, nb_partitions=5, nb_threads=2,
        n_devices=1,
    ))
    ref = main_diff(DiffOptions(
        kmtricks_dir=str(tmp_path / "run_ref"),
        output_directory=str(tmp_path / "out_ref"),
        nb_controls=2, nb_cases=2, threshold=0.8, cutoff=1.0,
        correction=CorrectionType.BONFERRONI, nb_threads=2, n_devices=1,
    ))
    assert ref["control"] + ref["case"] > 0

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
            KMDIFF_TEST_WORK=str(tmp_path),
            PYTHONPATH=REPO,
        )
        env.pop("XLA_FLAGS", None)
        env.pop("KMDIFF_DEVICES", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _PIPELINE_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"RES {ref['total_kmers']}" in out, out

    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_dist" / name).read_bytes() == (
            tmp_path / "out_ref" / name
        ).read_bytes()

    # run-dir parity: per-sample partition files byte-identical
    for part in range(5):
        for sid in ("C1", "C2", "K1", "K2"):
            rel = os.path.join("counts", f"partition_{part}",
                               f"{sid}.kmer.lz4")
            assert (tmp_path / "run_dist" / rel).read_bytes() == (
                tmp_path / "run_ref" / rel
            ).read_bytes()


_POP_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from kmdiff_tpu.parallel.distributed import init_distributed
assert init_distributed()

work = os.environ["KMDIFF_TEST_WORK"]
correction = os.environ["KMDIFF_TEST_CORRECTION"]
from kmdiff_tpu.cmd.diff import main_diff
from kmdiff_tpu.cmd.options import DiffOptions
from kmdiff_tpu.core.corrector import correction_type_from_str

res = main_diff(DiffOptions(
    kmtricks_dir=os.path.join(work, "run_pop"),
    output_directory=os.path.join(work, "out_dist_pop"),
    nb_controls=10, nb_cases=10, threshold=0.2, cutoff=1.0,
    correction=correction_type_from_str(correction), nb_threads=2,
    pop_correction=True, kmer_pca=0.05, npc=2, keep_tmp=True,
))
print(f"proc {jax.process_index()} RES {res['total_kmers']}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("KMDIFF_SKIP_DISTRIBUTED") == "1",
    reason="distributed smoke test disabled",
)
def test_two_process_popstrat_and_resume(tmp_path):
    """Popstrat across 2 processes: the primary fits PCA + the null model
    once, each process corrects its owned partitions — outputs are
    byte-identical to a single-process popstrat run. A second pass with a
    different corrector then resumes from the shared spills (merge and
    popstrat both skipped) and still matches single-process output."""
    import numpy as np

    # stratified cohort: two subpopulations with private background k-mers,
    # cases enriched in pop B (mirrors tests/test_popstrat.py's fixture) —
    # gives the popstrat stage real structure and post-correction survivors
    rng = np.random.default_rng(33)
    bases = np.array(list("ACGT"))

    def reads(background, private, n=60):
        seqs = []
        for _ in range(n):
            src = private if rng.random() < 0.5 else background
            seqs.append(src[rng.integers(0, len(src))])
        return seqs

    shared = ["".join(rng.choice(bases, 60)) for _ in range(30)]
    pop_a = ["".join(rng.choice(bases, 60)) for _ in range(20)]
    pop_b = ["".join(rng.choice(bases, 60)) for _ in range(20)]
    # true case-associated sequences, present in EVERY case regardless of
    # subpopulation: these survive the population correction (20 samples
    # keep the null design [1|PC1|PC2|totals] from separating the labels,
    # which would legitimately drive every corrected p to 1)
    case_signal = ["".join(rng.choice(bases, 60)) for _ in range(6)]
    n_ctrl = n_case = 10
    fof_lines = []
    for i in range(n_ctrl + n_case):
        is_case = i >= n_ctrl
        in_b = (i % 5 != 0) if is_case else (i % 2 == 0)
        sid = f"{'CASE' if is_case else 'CONTROL'}{i}"
        fa = tmp_path / f"{sid}.fasta"
        with open(fa, "w") as f:
            for j, s in enumerate(reads(shared, pop_b if in_b else pop_a)):
                f.write(f">r{j}\n{s}\n")
            if is_case:
                for j, s in enumerate(case_signal):
                    for rep in range(3):
                        f.write(f">sig{j}_{rep}\n{s}\n")
            else:
                # balance per-sample totals APPROXIMATELY: exact balance
                # makes the totals column constant (collinear with the
                # intercept -> singular null fit), and no balance lets
                # totals alone separate the labels so the depth-aware
                # null correctly absorbs ALL signal
                for j in range(12 + int(rng.integers(0, 12))):
                    f.write(f">pad{j}\n{''.join(rng.choice(bases, 60))}\n")
        fof_lines.append(f"{sid} : {fa}")
    (tmp_path / "fof.txt").write_text("\n".join(fof_lines) + "\n")

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType

    main_count(CountOptions(
        fof=str(tmp_path / "fof.txt"), directory=str(tmp_path / "run_pop"),
        kmer_size=21, hard_min=1, nb_partitions=5, nb_threads=2,
        n_devices=1,
    ))

    # single-process references for both correctors
    refs = {}
    for corr_type, out in ((CorrectionType.NOTHING, "out_ref_bonf"),
                           (CorrectionType.BENJAMINI, "out_ref_bh")):
        refs[out] = main_diff(DiffOptions(
            kmtricks_dir=str(tmp_path / "run_pop"),
            output_directory=str(tmp_path / out),
            nb_controls=10, nb_cases=10, threshold=0.2, cutoff=1.0,
            correction=corr_type, nb_threads=2, n_devices=1,
            pop_correction=True, kmer_pca=0.05, npc=2,
        ))
    assert refs["out_ref_bonf"]["control"] + refs["out_ref_bonf"]["case"] > 0

    def run_pair(correction: str) -> list[str]:
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
                KMDIFF_TEST_WORK=str(tmp_path),
                KMDIFF_TEST_CORRECTION=correction,
                PYTHONPATH=REPO,
            )
            env.pop("XLA_FLAGS", None)
            env.pop("KMDIFF_DEVICES", None)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _POP_WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out}"
            assert f"RES {refs['out_ref_bonf']['total_kmers']}" in out, out
        return outs

    outs = run_pair("disabled")
    assert all("popstrat corrected partitions" in o for o in outs), outs
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_dist_pop" / name).read_bytes() == (
            tmp_path / "out_ref_bonf" / name
        ).read_bytes()

    # resume pass: only the corrector changed -> merge + popstrat skipped
    outs = run_pair("benjamini")
    assert any("merge stage resumed from spills" in o for o in outs), outs
    assert not any("popstrat corrected partitions" in o for o in outs), outs
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_dist_pop" / name).read_bytes() == (
            tmp_path / "out_ref_bh" / name
        ).read_bytes()
