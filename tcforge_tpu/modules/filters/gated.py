"""External-library filter modules — present but gated
(filter_sdlview.c needs SDL plus a display).

Like the gated encoders, each registers under its reference name and
fails at instantiation with a precise message plus the nearest
working alternative.
"""

from __future__ import annotations

from typing import Any, Tuple

from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (ModuleInfo, ModuleKind,
                                          VideoFilter, register)


def _gated_filter(name: str, comment: str, message: str):
    class _Gated(VideoFilter):
        info = ModuleInfo(name=name, kind=ModuleKind.FILTER)
        desc = ModuleDesc(name=name, comment=comment)

        def __init__(self, job, options: str = ""):
            super().__init__(job, options)
            raise NotImplementedError(f"{name}: {message}")

        def apply(self, fb: FrameBatch,
                  state: Any) -> Tuple[FrameBatch, Any]:
            raise NotImplementedError

    _Gated.__name__ = f"Gated{name.capitalize()}Filter"
    return register(_Gated)


_gated_filter(
    "sdlview", "SDL frame preview (gated: needs SDL + a display)",
    "no SDL/display in this build; use the pv filter (socket-driven "
    "preview with PGM/PPM snapshots) instead")
