"""External command execution with exit checking and output redirection.

Reference: src/utils.cpp:108-184 (fork/execvp with stdout/stderr redirection
and status checking) and src/utils.cpp:36-58 (binary discovery: `which`
first, then alongside our own binary).
"""

import os
import shutil
import subprocess
import sys

from kmdiff_tpu.utils.exceptions import BinaryError
from kmdiff_tpu.utils.logging import get_logger


def get_binary_dir() -> str:
    """Directory holding the running entry-point (analogue of argv[0] dir)."""
    return os.path.dirname(os.path.abspath(sys.argv[0]))


def command_exists(bin_dir: str, name: str) -> str:
    """Resolve `name` on PATH, else next to our own binary; raise if absent."""
    path = shutil.which(name)
    if path:
        return path
    candidate = os.path.join(bin_dir, name)
    if os.path.isfile(candidate) and os.access(candidate, os.X_OK):
        return candidate
    raise BinaryError(f"{name} not found.")


def exec_external_cmd(cmd: str, args: str, log_path: str = None) -> None:
    """Run `cmd args`, redirecting output to `log_path` if given; raise on
    non-zero exit status with the captured stderr tail."""
    argv = [cmd] + args.split()
    get_logger().debug("exec: %s", " ".join(argv))
    if log_path:
        with open(log_path, "w") as log:
            proc = subprocess.run(argv, stdout=log, stderr=subprocess.PIPE)
    else:
        proc = subprocess.run(argv, capture_output=True)
    if proc.returncode != 0:
        err = (proc.stderr or b"").decode(errors="replace")[-2000:]
        raise BinaryError(
            f"{os.path.basename(cmd)} exited with {proc.returncode}: {err}"
        )
