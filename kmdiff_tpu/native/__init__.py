"""Native host-IO extension loader (ctypes, no pybind11).

Provides C++ LZ4 block (de)compression for the hot host paths — kmtricks
count-file decode and accumulator spills (the reference links upstream lz4
for the same jobs, thirdparty/CMakeLists.txt:103-115). Builds lazily with
`make` on first import when a toolchain is present; everything falls back
to the pure-Python codec in kmdiff_tpu.io.lz4 when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_kmdiff_native.so")
_SRC = os.path.join(_DIR, "lz4_codec.cpp")


def _load():
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.lz4_decompress_block.restype = ctypes.c_long
    lib.lz4_decompress_block.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lz4_compress_block.restype = ctypes.c_long
    lib.lz4_compress_block.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lz4_compress_bound.restype = ctypes.c_long
    lib.lz4_compress_bound.argtypes = [ctypes.c_long]
    lib.kmdiff_native_info.restype = ctypes.c_char_p
    return lib


_LIB = _load()

if _LIB is None:
    raise ImportError("native extension unavailable (no toolchain?)")


def lib_info() -> str:
    return _LIB.kmdiff_native_info().decode()


def lz4_decompress_block(src: bytes, max_out: int | None = None) -> bytes:
    """Decode one raw LZ4 block. max_out caps the output buffer; when
    unknown, a worst-case expansion bound is used and doubled on demand."""
    cap = max_out if max_out else max(len(src) * 4, 1 << 16)
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = _LIB.lz4_decompress_block(src, len(src), buf, cap)
        if n >= 0:
            return buf.raw[:n]
        if n == -2 and not max_out and cap < (1 << 31):
            cap *= 4
            continue
        from kmdiff_tpu.utils.exceptions import FormatError

        raise FormatError(f"corrupt LZ4 block (native rc={n})")


def lz4_compress_block(src: bytes) -> bytes:
    cap = _LIB.lz4_compress_bound(len(src))
    buf = ctypes.create_string_buffer(cap)
    n = _LIB.lz4_compress_block(src, len(src), buf, cap)
    if n < 0:
        from kmdiff_tpu.utils.exceptions import FormatError

        raise FormatError("LZ4 compression failed (buffer bound)")
    return buf.raw[:n]
