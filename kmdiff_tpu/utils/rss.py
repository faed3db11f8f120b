"""Peak / current RSS reporting (reference: src/utils.cpp:196-229)."""

import os
import resource


def get_peak_rss() -> int:
    """Peak resident set size in KiB (as getrusage reports on Linux)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


def get_peak_rss_mb() -> int:
    """Peak RSS in MB as the reference reports it at exit
    (diff.hpp:372-376: KiB * 0.0009765625)."""
    return int(get_peak_rss() * 0.0009765625)


def get_current_rss() -> int:
    """Current resident set size in KiB, from /proc/self/statm."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") // 1024
    except (OSError, ValueError, IndexError):
        return 0
