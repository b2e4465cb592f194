"""tcforge_tpu.modules — the module system (NMS analogue).

Rebuild of ``libtcmodule/`` (TCModuleClass vtable, factory, registry) as
Python class registries: the same five module kinds — demultiplexor
(importer), decoder, filter, encoder, multiplexor — with capability
matching and a format->preferred-module map, minus dlopen.

Importing this package registers all built-in modules (the analogue of
plugin discovery on the module path).
"""

from tcforge_tpu.modules import registry  # noqa: F401


def load_builtin_modules() -> None:
    """Import every built-in module package so their @register decorators
    run (tc_new_module_factory + plugin scan analogue)."""
    from tcforge_tpu.modules import importers, filters, encoders, muxers  # noqa: F401


load_builtin_modules()
