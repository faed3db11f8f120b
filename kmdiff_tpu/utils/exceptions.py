"""Typed exception hierarchy.

Mirrors the reference's kmdiff_exception tree
(reference: include/kmdiff/exceptions.hpp:26-67) with idiomatic Python
exceptions instead of macro-generated classes.
"""


class KmdiffError(Exception):
    """Base class of every kmdiff-tpu error."""

    def get_name(self) -> str:
        return type(self).__name__

    def get_msg(self) -> str:
        return str(self)


class ConfigError(KmdiffError):
    """Bad or missing run-dir / option configuration."""


class IOError_(KmdiffError):
    """File / stream error (named IOError_ to avoid shadowing builtins)."""


class BinaryError(KmdiffError):
    """External binary missing or failed."""


class EigenStratError(KmdiffError):
    """PCA / population-stratification failure."""


class InputError(KmdiffError):
    """Invalid user input."""


class FormatError(KmdiffError):
    """Malformed binary file (kmtricks / KFF / LZ4)."""


class PluginError(KmdiffError):
    """Model plugin could not be loaded or is invalid."""


class VersionError(KmdiffError):
    """Incompatible file or tool version."""
