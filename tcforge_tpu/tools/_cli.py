"""Shared CLI plumbing for the pipe-based data-plane tools.

The reference's import pipeline chains tools over stdin
(``tccat | tcdemux | tcextract | tcdecode``, import_vob.c:100-170);
the parsers here need seekable input, so piped stdin spools to a
temp file which the wrapper deletes afterwards.
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Callable, List, Optional, Tuple


def stdin_input(path: Optional[str]) -> Tuple[str, Optional[str]]:
    """'-' (or None) reads stdin into a spool file; returns
    (usable_path, spool_path_to_unlink_or_None)."""
    if path and path != "-":
        return path, None
    fd, tmp = tempfile.mkstemp(prefix="tc-stdin-")
    with os.fdopen(fd, "wb") as f:
        while True:
            blk = sys.stdin.buffer.read(1 << 20)
            if not blk:
                break
            f.write(blk)
    return tmp, tmp


def _stdin_is_data() -> bool:
    """True when stdin is actually a data source (pipe or regular
    file).  A forgotten ``-i`` under CI/cron typically inherits
    /dev/null — a character device — and implicit spooling there
    would turn a usage error into a silent empty-input run."""
    import stat
    try:
        st = os.fstat(sys.stdin.fileno())
    except (OSError, ValueError):
        return False
    return stat.S_ISFIFO(st.st_mode) or stat.S_ISREG(st.st_mode)


def pipe_main(real_main: Callable[[Optional[List[str]]], int],
              implicit_stdin: bool = True
              ) -> Callable[[Optional[List[str]]], int]:
    """Wrap a tool's main so '-i -' (and, with ``implicit_stdin``,
    a missing -i with piped stdin) spools standard input."""

    def main(argv: Optional[List[str]] = None) -> int:
        args = list(sys.argv[1:]) if argv is None else list(argv)
        spool = None
        if "-i" in args:
            k = args.index("-i")
            if k + 1 < len(args) and args[k + 1] == "-":
                path, spool = stdin_input("-")
                args[k + 1] = path
        elif (implicit_stdin
              and not any(a in ("-h", "--help") for a in args)
              and not sys.stdin.isatty()
              and _stdin_is_data()):
            path, spool = stdin_input("-")
            args = ["-i", path] + args
        try:
            return real_main(args)
        except BrokenPipeError:
            # downstream closed (| head): silence the interpreter's
            # exit-time stdout flush too, or CPython exits 120
            devnull = os.open(os.devnull, os.O_WRONLY)
            os.dup2(devnull, sys.stdout.fileno())
            os.close(devnull)
            return 0
        finally:
            if spool:
                try:
                    os.unlink(spool)
                except OSError:
                    pass

    return main
