"""Build the native host-IO library: python -m tcforge_tpu.native.build

Also provides :func:`ensure_fresh`, called by the ctypes loaders so a
checkout never silently runs a stale (or missing) binary: when any
native/*.cpp|*.h source is newer than the .so — or the .so does not
exist — the Makefile is re-run once per process.  Build failure is
non-fatal (the loaders degrade exactly as when the lib is absent).
"""

from __future__ import annotations

import os
import subprocess
import sys

_ENSURED = False

_SOURCES = ("tcforge_host.cpp", "mpeg2intra.cpp", "mpeg2requant.cpp",
            "mpeg2encode.cpp", "theora_tokens.cpp", "mpeg2tables.h",
            "tcforge_av.cpp")


def native_dir() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native")


def _stale(native: str, target: str) -> bool:
    path = os.path.join(native, target)
    if not os.path.exists(path):
        return True
    t = os.path.getmtime(path)
    for src in _SOURCES:
        sp = os.path.join(native, src)
        if os.path.exists(sp) and os.path.getmtime(sp) > t:
            return True
    return False


def ensure_fresh() -> None:
    """Rebuild the native libraries if any source is newer (at most
    once per process; failures are tolerated)."""
    global _ENSURED
    if _ENSURED:
        return
    _ENSURED = True
    native = native_dir()
    if not os.path.isdir(native):
        return
    try:
        if (_stale(native, "libtcforge_host.so")
                or _stale(native, "libtcforge_av.so")):
            subprocess.call(["make", "-C", native],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, timeout=300)
    except Exception:
        pass


def build() -> int:
    rc = subprocess.call(["make", "-C", native_dir()])
    if rc == 0:
        print(f"built {os.path.join(native_dir(), 'libtcforge_host.so')}")
    return rc


if __name__ == "__main__":
    sys.exit(build())
