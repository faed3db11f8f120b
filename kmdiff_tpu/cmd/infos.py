"""`kmdiff-tpu infos`: build/runtime metadata
(reference: include/kmdiff/cmd/infos.hpp:32-64)."""

from __future__ import annotations

import platform
import sys


def main_infos() -> str:
    import jax
    import numpy

    import kmdiff_tpu

    try:
        devices = ", ".join(
            f"{d.platform}:{d.id}" for d in jax.devices()
        )
    except Exception as e:  # no backend available
        devices = f"unavailable ({e})"

    native = "yes"
    try:
        from kmdiff_tpu.native import lib_info

        native_detail = lib_info()
    except ImportError:
        native = "no"
        native_detail = ""

    lines = [
        f"kmdiff-tpu {kmdiff_tpu.__version__}",
        "",
        f"python     : {sys.version.split()[0]}",
        f"platform   : {platform.platform()}",
        f"jax        : {jax.__version__}",
        f"numpy      : {numpy.__version__}",
        f"devices    : {devices}",
        f"native ext : {native}{f' ({native_detail})' if native_detail else ''}",
        "",
        "features   : diff (merge/LRT/correction), kmtricks run-dir interop,",
        "             FASTA + KFF output, model plugins, resume",
    ]
    return "\n".join(lines)
