"""pv — preview/navigation filter (headless).

Rebuild of ``filter/preview/filter_pv.c``: the reference draws frames
into an xv window and keeps a raw-frame cache for interactive seeking
(socket ``preview`` commands, docs/socket_protocol.txt:44-70).  This
build is headless: the cache and navigation machinery are intact, but
"drawing" writes PPM snapshots next to the output file instead of
painting an X11 window.

The frame cache fills through the engine's ``collect`` hook (the
jitted step just snapshots the batch into its carry), so caching adds
no device work.  Socket commands handled: draw [NR], grab, undo,
fastfw/fastbw (25 frames), slowfw/slowbw (1 frame), toggle, display,
pause (engine-level), rotate (output rotation).
"""

from __future__ import annotations

import os
from collections import deque
from typing import Any, Optional, Tuple

import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

CACHE_LONG_SKIP = 25
CACHE_SHORT_SKIP = 1


@register
class PvFilter(VideoFilter):
    info = ModuleInfo(name="pv", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="pv", comment="preview cache / navigation (headless)",
        version="0.2.3", capabilities="VY4O",
        params=[ParamSpec("cache", "frames cached for seeking", "d", 15,
                          15, 255),
                ParamSpec("dir", "snapshot output directory", "s", ""),
                ParamSpec("skip", "only cache every Nth frame", "d", 0,
                          0, 100),
                ParamSpec("fullscreen", "Display in fullscreen mode",
                          "d", 0, 0, 1),
                ParamSpec("port", "force Xv port", "d", 0, 0, 255)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.job = job
        cache = max(15, self.options["cache"])
        self._ring: "deque" = deque(maxlen=cache)
        self._nav = 0                 # 0 = newest, grows into the past
        self._undo_nav: Optional[int] = None
        self._dontdraw = False
        self._skip_mode = False
        self._grabs = 0
        self.dir = self.options["dir"] or "."
        # fullscreen/port select the reference's Xv display path
        # (filter_pv.c:124-125,169-171); this build is headless, so they
        # are accepted for option parity and noted once.
        if self.options["fullscreen"] or self.options["port"]:
            from tcforge_tpu.core.log import info
            info("pv", "no display in this build: fullscreen/port "
                 "accepted but preview is snapshot/socket driven")

    def init_state(self, width: int, height: int,
                   fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("pv needs YUV420P (-V)")
        return None

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        ids = fb.frame_ids
        return fb, {"y": fb.y, "u": fb.u, "v": fb.v, "ids": ids}

    def collect(self, state: Any) -> None:
        if state is None:
            return
        y = np.asarray(state["y"])
        u = np.asarray(state["u"])
        v = np.asarray(state["v"])
        ids = (np.asarray(state["ids"]) if state["ids"] is not None
               else np.arange(y.shape[0]))
        step = self.options["skip"] + 1 if self._skip_mode else 1
        for k in range(0, y.shape[0], step):
            if ids[k] < 0:
                continue                   # mesh pad frame
            self._ring.append((int(ids[k]), y[k], u[k], v[k]))

    # ---- socket command surface (preview_cache_*, filter_pv.c) -------

    def command(self, cmd: str, arg: str = "") -> str:
        if cmd in ("draw", "grab"):
            n = int(arg) if arg.isdigit() else 1
            wrote = None
            for _ in range(max(1, n) if cmd == "draw" else 1):
                wrote = self._snapshot()
                if wrote is None:
                    return "FAILED"
            return f"{wrote}\nOK"
        if cmd == "undo":
            if self._undo_nav is None:
                return "FAILED"
            self._nav, self._undo_nav = self._undo_nav, self._nav
            return "OK"
        if cmd in ("fastfw", "fastbw", "slowfw", "slowbw"):
            step = CACHE_LONG_SKIP if "fast" in cmd else CACHE_SHORT_SKIP
            self._undo_nav = self._nav
            if cmd.endswith("bw"):
                self._nav = min(self._nav + step,
                                max(0, len(self._ring) - 1))
            else:
                self._nav = max(0, self._nav - step)
            return "OK"
        if cmd == "display":
            self._dontdraw = not self._dontdraw
            return "OK"
        if cmd == "toggle":
            self._skip_mode = not self._skip_mode
            return "OK"
        return "FAILED"

    def _snapshot(self) -> Optional[str]:
        """Write the frame at the navigation position as PPM (the
        headless 'draw')."""
        if not self._ring or self._dontdraw:
            return None
        idx = len(self._ring) - 1 - min(self._nav, len(self._ring) - 1)
        fid, y, u, v = self._ring[idx]
        from tcforge_tpu.io.image import write_image
        from tcforge_tpu.ops import colorspace
        from tcforge_tpu.core.frame import FrameBatch as FB
        fb = FB.from_numpy(y=y[None], u=u[None], v=v[None],
                           fmt=ImageFormat.YUV420P)
        rgb = np.asarray(colorspace.convert(fb, ImageFormat.RGB24)
                         .rgb)[0]
        path = os.path.join(self.dir, f"preview-{fid:06d}.ppm")
        write_image(path, rgb)
        self._grabs += 1
        log.info("pv", "wrote %s (nav %d)", path, self._nav)
        return path


@register
class PreviewFilter(PvFilter):
    """`preview` name alias (the reference ships filter_preview.c and
    filter_pv.c as twin X11 preview filters; headless here)."""

    info = ModuleInfo(name="preview", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="preview", comment="preview cache / navigation "
        "(filter_preview twin of pv)",
        params=PvFilter.desc.params)
