"""Leveled, colorized, pluggable-target logging.

Re-implementation of ``libtcutil/logging.[ch]`` (tc_log levels, colorized
console output, tc_log_register_method) on top of the stdlib ``logging``
module so it composes with the rest of the Python ecosystem.
"""

from __future__ import annotations

import enum
import logging
import sys
from typing import Callable, List, Optional


class LogLevel(enum.IntEnum):
    """Mirrors TC_LOG_{ERR,WARN,INFO,MSG,DEBUG} severity ordering."""

    ERROR = logging.ERROR
    WARN = logging.WARNING
    INFO = logging.INFO
    MSG = logging.INFO - 1
    DEBUG = logging.DEBUG


# Debug channels (bitmask), mirroring the reference's --debug flags
# (src/transcode.h TC_DEBUG_*).
DEBUG_THREADS = 1 << 0
DEBUG_SYNC = 1 << 1
DEBUG_COUNTER = 1 << 2
DEBUG_PRIVATE = 1 << 3
DEBUG_CLEANUP = 1 << 4
DEBUG_MODULES = 1 << 5
DEBUG_FLIST = 1 << 6

_debug_channels = 0
_COLORS = {
    LogLevel.ERROR: "\033[31m",
    LogLevel.WARN: "\033[33m",
    LogLevel.INFO: "\033[32m",
    LogLevel.MSG: "",
    LogLevel.DEBUG: "\033[36m",
}
_RESET = "\033[0m"

_logger = logging.getLogger("tcforge_tpu")
_extra_methods: List[Callable[[LogLevel, str, str], None]] = []


class _ConsoleFormatter(logging.Formatter):
    use_color = sys.stderr.isatty()

    def format(self, record: logging.LogRecord) -> str:
        tag = getattr(record, "tc_tag", record.name)
        try:
            level = LogLevel(record.levelno)
        except ValueError:
            level = LogLevel.MSG
        msg = record.getMessage()
        if self.use_color and _COLORS.get(level):
            return f"{_COLORS[level]}[{tag}]{_RESET} {msg}"
        return f"[{tag}] {msg}"


def _ensure_handler() -> None:
    if not _logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(_ConsoleFormatter())
        _logger.addHandler(h)
        _logger.setLevel(logging.INFO)
        _logger.propagate = False


def set_verbosity(level: LogLevel) -> None:
    _ensure_handler()
    _logger.setLevel(int(level))


def set_color(enabled: bool) -> None:
    """--no_log_color analogue (logging.h tc_log colorized targets)."""
    _ConsoleFormatter.use_color = enabled


def set_debug_channels(mask: int) -> None:
    """--debug flag analogue: enable named debug channels."""
    global _debug_channels
    _debug_channels = mask
    if mask:
        set_verbosity(LogLevel.DEBUG)


def debug_enabled(channel: int) -> bool:
    return bool(_debug_channels & channel)


def register_method(fn: Callable[[LogLevel, str, str], None]) -> None:
    """tc_log_register_method analogue: add an extra log sink.

    `fn(level, tag, message)` is called for every log record in addition
    to the console handler.
    """
    _extra_methods.append(fn)


def _log(level: LogLevel, tag: str, msg: str, *args) -> None:
    _ensure_handler()
    if args:
        msg = msg % args
    _logger.log(int(level), msg, extra={"tc_tag": tag})
    for fn in _extra_methods:
        fn(level, tag, msg)


def error(tag: str, msg: str, *args) -> None:
    _log(LogLevel.ERROR, tag, msg, *args)


def warn(tag: str, msg: str, *args) -> None:
    _log(LogLevel.WARN, tag, msg, *args)


def info(tag: str, msg: str, *args) -> None:
    _log(LogLevel.INFO, tag, msg, *args)


def msg(tag: str, text: str, *args) -> None:
    _log(LogLevel.MSG, tag, text, *args)


def debug(channel: int, tag: str, text: str, *args) -> None:
    """Channel-gated debug logging (tc_debug analogue, src/decoder.c:470)."""
    if debug_enabled(channel):
        _log(LogLevel.DEBUG, tag, text, *args)
