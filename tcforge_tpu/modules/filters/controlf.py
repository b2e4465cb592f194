"""control filter: scripted runtime chain mutation from a command file.

``filter/filter_control.c`` intended this (the upstream body is
``#if 0``-disabled and only prints "currently disabled"); this is the
working realisation of its documented design: a file of

    <frame> <socket command...>

lines (e.g. ``120 load invert`` / ``240 disable invert``), each applied
once the stream reaches that frame, through the same command handler the
control socket uses (``src/socket.c`` verbs: load, config, enable,
disable, parameter, preview).  Granularity is the engine batch: a
command fires before the first batch whose frames lie past its
trigger frame.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp

from tcforge_tpu.core import log
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo,
                                          ModuleKind, VideoFilter,
                                          register)


@register
class ControlFilter(VideoFilter):
    info = ModuleInfo(name="control", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="control", comment="scripted chain control from a file",
        params=[ParamSpec("file", "command file (frame cmd args)", "s",
                          ""),
                ParamSpec("ofile", "write command replies here", "s",
                          "")])
    slots = FilterSlot.PRE_S
    wants_pipeline = True          # engine injects .pipeline after build

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        path = self.options["file"]
        if not path:
            raise ValueError("control: the 'file' option is mandatory")
        self.commands: List[Tuple[int, str]] = []
        with open(path) as f:
            for raw in f:
                line = raw.strip()
                if not line or line.startswith("#"):
                    continue
                frame, _, cmd = line.partition(" ")
                if not frame.isdigit() or not cmd.strip():
                    log.warn("control", "skipping bad line: %r", line)
                    continue
                self.commands.append((int(frame), cmd.strip()))
        self.commands.sort(key=lambda fc: fc[0])
        self._next = 0
        self.pipeline = None
        self._ofile = self.options["ofile"]

    def init_state(self, width: int, height: int, fmt) -> Any:
        return jnp.int32(-1)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.zeros(fb.batch, jnp.int32))
        return fb, jnp.maximum(state, jnp.max(ids))

    def collect(self, state: Any) -> None:
        last_id = int(state)
        if self.pipeline is None or self._next >= len(self.commands):
            return
        from tcforge_tpu.pipeline.control import ControlServer
        srv = ControlServer.__new__(ControlServer)   # handler only
        srv.pipeline = self.pipeline
        while (self._next < len(self.commands)
               and self.commands[self._next][0] <= last_id):
            frame, cmd = self.commands[self._next]
            self._next += 1
            reply, _ = srv.handle(cmd)
            log.info("control", "@%d '%s' -> %s", frame, cmd,
                     reply.splitlines()[-1] if reply else "")
            if self._ofile:
                with open(self._ofile, "a") as f:
                    f.write(f"{frame} {cmd}: {reply}\n")
