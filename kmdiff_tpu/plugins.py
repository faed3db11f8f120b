"""Custom statistical-model plugins.

The reference dlopens a shared object exposing `plugin_name` +
`create8/16/32` factories returning IModel implementations
(reference: include/kmdiff/model_manager.hpp:19-105, plugins/ex_model.cpp).
The TPU-native analogue loads a Python module — by file path or by
module:attr spec — exposing a `create_model(config: str) -> IModel`
factory. Models implement kmdiff_tpu.core.model.IModel at one of three
altitudes (fastest wins when several are present):

  * `process_block_jax(counts_dev, nb_controls)` — jittable jnp function
    fed fixed [BLOCK_ROWS, S] int32 tiles ON DEVICE (the ABI for
    billion-row cohorts; example: examples/plugins/
    device_fold_change_model.py),
  * `process_block(counts, nb_controls)` — vectorized numpy,
  * scalar `process(controls, cases)` — reference-parity per-k-mer ABI;
    falls back to a per-row loop (warned above 1e6 rows).
"""

from __future__ import annotations

import importlib
import importlib.util
import os

from kmdiff_tpu.core.model import IModel
from kmdiff_tpu.utils.exceptions import KmdiffError


class PluginError(KmdiffError):
    pass


def load_model_plugin(spec: str, config: str = "") -> IModel:
    """Load a model plugin.

    spec: either a path to a .py file, or "module.path" /
    "module.path:factory_name" (factory defaults to `create_model`).
    """
    factory_name = "create_model"
    if os.path.exists(spec) and spec.endswith(".py"):
        name = os.path.splitext(os.path.basename(spec))[0]
        mod_spec = importlib.util.spec_from_file_location(f"kmdiff_plugin_{name}", spec)
        module = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(module)
    else:
        modname, _, attr = spec.partition(":")
        if attr:
            factory_name = attr
        try:
            module = importlib.import_module(modname)
        except ImportError as e:
            raise PluginError(f"cannot import model plugin {spec!r}: {e}") from e

    factory = getattr(module, factory_name, None)
    if factory is None:
        raise PluginError(
            f"plugin {spec!r} does not expose a {factory_name}() factory"
        )
    model = factory(config)
    if not isinstance(model, IModel):
        # duck-typed plugins are fine as long as they quack
        for attr in ("process_block",):
            if not hasattr(model, attr):
                raise PluginError(
                    f"plugin model {type(model).__name__} lacks {attr}()"
                )
    name = getattr(module, "PLUGIN_NAME", getattr(module, "__name__", spec))
    from kmdiff_tpu.utils.logging import logger

    logger.info("Plugin loaded: %s", name)
    return model
