"""Build the native host-IO library: python -m tcforge_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys


def build() -> int:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native = os.path.join(root, "native")
    rc = subprocess.call(["make", "-C", native])
    if rc == 0:
        print(f"built {os.path.join(native, 'libtcforge_host.so')}")
    return rc


if __name__ == "__main__":
    sys.exit(build())
