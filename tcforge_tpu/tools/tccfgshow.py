"""tccfgshow — show build/runtime configuration (tools/tccfgshow.c
analogue)."""

from __future__ import annotations

import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
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
