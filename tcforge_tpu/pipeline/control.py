"""Runtime control server — the --socket interface.

Rebuild of ``src/socket.c`` + ``docs/socket_protocol.txt``: a UNIX-domain
socket command server that inspects and mutates the live filter chain
while the pipeline runs.  Protocol-compatible command set:

  help | version | progress | list load | list enable
  load <filter> [options]      enable <filter>
  config <filter> <options>    disable <filter>
  parameters <filter>          quit

Responses end with OK/FAILED like the reference (socket.c:323-675).
Chain mutations mark the chain dirty; the engine rebuilds (re-jits) it
between batches, carrying over the states of unchanged filters.
"""

from __future__ import annotations

import os
import socket
import threading
from typing import Callable, List, Optional

from tcforge_tpu.core import log
from tcforge_tpu.core.job import FilterSpec
from tcforge_tpu.modules.registry import ModuleKind, list_modules, lookup

_TAG = "socket"


class ControlServer:
    """UNIX-socket command server bound to a running Pipeline."""

    def __init__(self, path: str, pipeline) -> None:
        self.path = path
        self.pipeline = pipeline
        self._stop = threading.Event()
        if os.path.exists(path):
            os.unlink(path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(path)
        self._sock.listen(2)
        self._sock.settimeout(0.5)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        log.info(_TAG, "control socket listening on %s", path)

    # ------------------------------------------------------------------ #

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            with conn:
                conn.settimeout(5.0)
                buf = b""
                closed = False          # quit closes THIS client only
                while not self._stop.is_set() and not closed:
                    try:
                        data = conn.recv(4096)
                    except socket.timeout:
                        continue
                    except OSError:
                        break
                    if not data:
                        break
                    buf += data
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        try:
                            reply, closing = self.handle(
                                line.decode("utf-8", "replace").strip())
                        except Exception as e:  # keep server alive
                            reply, closing = f"{e}\nFAILED", False
                        try:
                            conn.sendall(reply.encode() + b"\n")
                        except OSError:
                            closed = True
                            break
                        if closing:
                            # the reference closes only client_sock
                            # on quit and keeps accepting
                            # (socket.c:636-638)
                            closed = True
                            break

    def close(self) -> None:
        self._stop.set()
        self._sock.close()
        try:
            os.unlink(self.path)
        except OSError:
            pass

    # ------------------------------------------------------------------ #

    def handle(self, line: str):
        """Dispatch one command; returns (reply_text, closing)."""
        if not line:
            return "FAILED", False
        parts = line.split(None, 2)
        cmd = parts[0].lower()
        if cmd == "help":
            return ("commands: help version progress list load config "
                    "parameters enable disable preview pause dump "
                    "processing stop quit\nOK",
                    False)
        if cmd == "version":
            from tcforge_tpu import __version__
            return f"tcforge_tpu {__version__}\nOK", False
        if cmd in ("quit", "exit"):
            return "OK", True
        if cmd == "dump":
            # dump_vob analogue (socket.c:132): every job field as
            # name=value lines
            import dataclasses
            job = self.pipeline.job
            lines = []
            for f in dataclasses.fields(job):
                v = getattr(job, f.name)
                if isinstance(v, (str, int, float, bool, type(None))):
                    lines.append(f"{f.name}={v}")
            return "\n".join(lines) + "\nOK", False
        if cmd == "processing":
            # dump_processing analogue (socket.c:102): E|D plus stage
            # occupancy (im = queued batches, ex = writer backlog)
            c = self.pipeline.counters
            im = self.pipeline.read_queue.qsize() \
                if getattr(self.pipeline, "read_queue", None) else 0
            ex = self.pipeline.write_queue.qsize() \
                if getattr(self.pipeline, "write_queue", None) else 0
            return (f"E={c.encoded}|D={c.dropped}|im={im}|fl=0|ex={ex}"
                    "\nOK", False)
        if cmd == "stop":
            # tc_interrupt: cooperative drain — reader exits, pipeline
            # flushes encoders and closes muxers normally
            self.pipeline.interrupted.set()
            self.pipeline.paused.clear()
            return "OK", False
        if cmd == "unload":
            return "FAILED", False   # like the reference (socket.c:638)
        if cmd == "progress":
            c = self.pipeline.counters
            return (f"frames={c.frames_in} encoded={c.encoded} "
                    f"skipped={c.skipped} dropped={c.dropped}\nOK", False)
        if cmd == "list":
            what = parts[1] if len(parts) > 1 else "load"
            if what == "load":
                names = [f"{s.name}{'' if s.enabled else ' (disabled)'}"
                         for s in self.pipeline.job.filters]
                return ", ".join(names) + "\nOK", False
            if what == "enable":
                names = [s.name for s in self.pipeline.job.filters
                         if s.enabled]
                return ", ".join(names) + "\nOK", False
            return "FAILED", False
        if cmd == "parameters" and len(parts) > 1:
            try:
                cls = lookup(ModuleKind.FILTER, parts[1])
            except KeyError:
                return "FAILED", False
            # CSV format like the reference's filter introspection
            rows = [f'"{p.name}", "{p.help}", "{p.fmt}", "{p.default}"'
                    + (f', "{p.lo}", "{p.hi}"'
                       if p.lo is not None else "")
                    for p in cls.desc.params]
            return "\n".join(rows) + "\nOK", False
        if cmd == "load" and len(parts) > 1:
            name = parts[1]
            opts = parts[2] if len(parts) > 2 else ""
            if opts == "0":
                opts = ""
            try:
                lookup(ModuleKind.FILTER, name)
            except KeyError:
                return "FAILED", False
            self.pipeline.job.filters.append(FilterSpec(name, opts))
            self.pipeline.chain_dirty = True
            return "OK", False
        if cmd == "config" and len(parts) > 2:
            for spec in self.pipeline.job.filters:
                if spec.name == parts[1]:
                    spec.options = parts[2]
                    self.pipeline.chain_dirty = True
                    return "OK", False
            return "FAILED", False
        if cmd == "pause":
            if self.pipeline.paused.is_set():
                self.pipeline.paused.clear()
            else:
                self.pipeline.paused.set()
            return "OK", False
        if cmd == "preview" and len(parts) > 1:
            sub = parts[1].lower()
            arg = parts[2] if len(parts) > 2 else ""
            if sub == "pause":
                return self.handle("pause")
            if sub == "rotate":
                mux = self.pipeline.muxer
                if hasattr(mux, "force_rotate"):
                    mux.force_rotate()
                    return "OK", False
                return "FAILED", False
            if sub in ("slower", "faster"):
                return "OK", False     # pacing hints: no-op headless
            # find (or auto-load) the pv filter
            pv = None
            for f in self.pipeline.vchain.filters:
                if f.info.name == "pv":
                    pv = f
                    break
            if pv is None:
                self.pipeline.job.filters.append(
                    FilterSpec("pv", "cache=15"))
                self.pipeline.chain_dirty = True
                return "OK", False     # loaded; retry the command next
            return pv.command(sub, arg), False
        if cmd in ("enable", "disable") and len(parts) > 1:
            for spec in self.pipeline.job.filters:
                if spec.name == parts[1]:
                    spec.enabled = (cmd == "enable")
                    self.pipeline.chain_dirty = True
                    return "OK", False
            return "FAILED", False
        return "FAILED", False
