"""tccfgshow — show build/runtime configuration (tools/tccfgshow.c
analogue).

With no options, prints the full configuration summary.  The
path-query options (``-P`` profile path, ``-M`` module path, ``-R``
registry path — tccfgshow.c:103-133) answer without importing jax so
GUI wrappers can call them cheaply (the reference binary is equally
instant for these).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional


def _profile_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "profiles")


def _module_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "modules")


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    paths = {"-P": _profile_path, "-M": _module_path,
             "-R": _module_path}
    shown = False
    for flag in list(argv):
        if flag in paths:
            print(paths[flag]())
            argv.remove(flag)
            shown = True
    if shown and not argv:
        return 0
    if argv and argv[0] in ("-h", "--help"):
        print("usage: tccfgshow [-P] [-M] [-R]\n"
              "    -P    print the profile path\n"
              "    -M    print the module path\n"
              "    -R    print the module registry path\n"
              "    (no option: full configuration summary)")
        return 0

    import jax

    import tcforge_tpu
    import tcforge_tpu.modules
    from tcforge_tpu import native
    from tcforge_tpu.modules.registry import ModuleKind, list_modules
    from tcforge_tpu.pipeline.export_profile import list_profiles

    print(f"tcforge_tpu {tcforge_tpu.__version__}")
    print(f"jax {jax.__version__}, backend: {jax.default_backend()}, "
          f"devices: {len(jax.devices())}")
    print(f"native host-IO library: "
          f"{'built' if native.available() else 'not built'}")
    for kind in ModuleKind:
        names = list_modules(kind)
        print(f"{kind.value} modules ({len(names)}): {', '.join(names)}")
    print(f"export profiles: {', '.join(list_profiles())}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
