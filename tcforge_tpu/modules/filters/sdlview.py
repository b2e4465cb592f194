"""sdlview — paint every frame into a display window.

Rebuild of ``filter/preview/filter_sdlview.c``: the reference blits
each frame into an SDL YV12 overlay; "intentionally extremely simple:
it does preview only" (no screenshots, no key commands — that is the
pv filter's job).  This build has no SDL, but it speaks raw X11
(io/x11grab.py grabs screens over the wire), so sdlview paints
through the matching wire-protocol display client (io/x11view.py:
CreateWindow + PutImage(ZPixmap)) — same observable behavior, one
window showing the frames as they pass, no third-party library.

Frames are lifted out of the jitted chain through the engine's
``collect`` hook (like pv's cache fill), so the display adds no
device work; YUV->RGB conversion runs on the host copy.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo,
                                          ModuleKind, VideoFilter,
                                          register)


@register
class SdlviewFilter(VideoFilter):
    info = ModuleInfo(name="sdlview", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="sdlview", comment="preview video frames in a window",
        version="1.0.3", capabilities="VRY4O", params=[])
    slots = FilterSlot.POST_M

    #: injectable for tests (a connected socket to an X server)
    _inject_sock = None

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.job = job
        self._fmt: Optional[ImageFormat] = None
        from tcforge_tpu.io.x11view import X11Viewer
        try:
            self._view = X11Viewer(sock=self._inject_sock)
        except Exception as e:
            raise NotImplementedError(
                "sdlview: cannot open the display "
                f"({e}); use the pv filter (socket-driven preview "
                "with PGM/PPM snapshots) on headless boxes") from e

    def init_state(self, width: int, height: int,
                   fmt: ImageFormat) -> Any:
        self._fmt = fmt
        self._view.open_window(width, height)
        return None

    def apply(self, fb: FrameBatch, state: Any
              ) -> Tuple[FrameBatch, Any]:
        if fb.rgb is not None:
            return fb, {"rgb": fb.rgb, "ids": fb.frame_ids}
        return fb, {"y": fb.y, "u": fb.u, "v": fb.v,
                    "ids": fb.frame_ids}

    def collect(self, state: Any) -> None:
        if state is None:
            return
        ids = (np.asarray(state["ids"])
               if state.get("ids") is not None else None)
        if "rgb" in state:
            rgbs = np.asarray(state["rgb"])
        else:
            from tcforge_tpu.ops import colorspace
            fb = FrameBatch.from_numpy(
                y=np.asarray(state["y"]), u=np.asarray(state["u"]),
                v=np.asarray(state["v"]), fmt=self._fmt
                or ImageFormat.YUV420P)
            rgbs = np.asarray(
                colorspace.convert(fb, ImageFormat.RGB24).rgb)
        for k in range(rgbs.shape[0]):
            if ids is not None and ids[k] < 0:
                continue               # mesh pad frame
            self._view.put_frame(rgbs[k])

    def close(self) -> None:
        try:
            self._view.close()
        except Exception:
            pass