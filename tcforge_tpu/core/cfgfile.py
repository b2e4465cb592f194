"""INI-style configuration files with typed entry tables.

Re-implementation of ``libtcutil/cfgfile.[ch]`` (tc_config_read_file with
TCConfigEntry tables and a fallback directory list).  Used by encoder
profiles and the module registry, mirroring how ``encode/x264.cfg`` and
``libtcmodule/modules.cfg`` are consumed.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence


@dataclass(frozen=True)
class ConfigEntry:
    """One typed config item (TCConfigEntry analogue, cfgfile.h:24-70)."""

    name: str
    typ: str                      # 'int' | 'float' | 'str' | 'bool' | 'flag'
    default: Any = None
    lo: Optional[float] = None
    hi: Optional[float] = None


class ConfigError(ValueError):
    pass


def _coerce(entry: ConfigEntry, raw: str) -> Any:
    try:
        if entry.typ == "int":
            v: Any = int(raw, 0)
        elif entry.typ == "float":
            v = float(raw)
        elif entry.typ in ("bool", "flag"):
            v = raw.strip().lower() in ("1", "yes", "true", "on", "")
        else:
            v = raw
    except ValueError as e:
        raise ConfigError(f"{entry.name}: bad value {raw!r}") from e
    if entry.typ in ("int", "float"):
        if entry.lo is not None and v < entry.lo:
            v = entry.lo
        if entry.hi is not None and v > entry.hi:
            v = entry.hi
    return v


def read_file(path: str, section: str,
              entries: Sequence[ConfigEntry]) -> Dict[str, Any]:
    """tc_config_read_file analogue: read `section` from an INI file,
    validating against the typed entry table; defaults fill gaps."""
    cp = configparser.ConfigParser(strict=False, interpolation=None,
                                   comment_prefixes=("#", ";"))
    with open(path, "r") as f:
        cp.read_file(f)
    out = {e.name: e.default for e in entries}
    if not cp.has_section(section):
        return out
    table = {e.name: e for e in entries}
    for key, raw in cp.items(section):
        if key in table:
            out[key] = _coerce(table[key], raw)
    return out


def read_flat(path: str) -> Dict[str, str]:
    """tc_config_read_file with section=NULL (cfgfile.c:177-229): read
    every ``key = value`` line in the file regardless of [section]
    headers.  Bare words (flag entries like ``2pass_bug_workaround``
    in encode/x264.cfg) map to the empty string."""
    out: Dict[str, str] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].split(";", 1)[0].strip()
            if not line or (line.startswith("[") and line.endswith("]")):
                continue
            key, eq, val = line.partition("=")
            out[key.strip()] = val.strip() if eq else ""
    return out


def read_raw(path: str) -> Dict[str, Dict[str, str]]:
    """Read a whole INI file as nested dicts (for the module registry)."""
    cp = configparser.ConfigParser(strict=False, interpolation=None,
                                   comment_prefixes=("#", ";"))
    with open(path, "r") as f:
        cp.read_file(f)
    return {s: dict(cp.items(s)) for s in cp.sections()}


def default_config_dirs() -> List[str]:
    """Fallback directory list (cfgfile.c tc_config_set_dir semantics):
    $TCFORGE_CONFIG_DIR, ~/.tcforge_tpu, then the packaged defaults."""
    dirs = []
    env = os.environ.get("TCFORGE_CONFIG_DIR")
    if env:
        dirs.append(env)
    home = os.path.expanduser("~/.tcforge_tpu")
    dirs.append(home)
    dirs.append(os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "data"))
    return dirs


def find_config_file(name: str,
                     dirs: Optional[Sequence[str]] = None) -> Optional[str]:
    for d in dirs if dirs is not None else default_config_dirs():
        path = os.path.join(d, name)
        if os.path.isfile(path):
            return path
    return None
