"""Encoder configuration files — the x264.cfg / xvid.cfg / lavc.cfg
tier (encode_x264.c:919, encode_xvid.c:692, encode_lavc.c:1288).

The reference encoders read a typed option table from a cfg file
searched in "." (plus config dirs), then re-parse the module option
string against the same table so "all options in x264.cfg can be
specified on the command line" (encode_x264.c:1047).  Unknown keys
warn and are skipped, never fatal.

Here the coded options travel to libavcodec as AVOptions
(tc_avve_new4): x264 keys ride the ``x264-params`` private option —
x264_param_parse accepts the same names the reference's conf table
exposes — xvid keys go through a curated translation to libxvid /
generic lavc options, and lavc.cfg keys (already lavc names) pass
through as-is.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from tcforge_tpu.core import cfgfile
from tcforge_tpu.core.log import warn
from tcforge_tpu.core.optstr import ModuleDesc, parse_optstr


def read_encoder_cfg(filename: str,
                     section: Optional[str] = None) -> Dict[str, str]:
    """Read an encoder cfg file from "." then the config dirs
    (the reference's ``dirs = {".", NULL}``).  section=None reads the
    whole file regardless of [section] headers (x264.cfg/xvid.cfg);
    a section name reads just that section (lavc.cfg per-codec)."""
    path = cfgfile.find_config_file(
        filename, ["."] + cfgfile.default_config_dirs())
    if path is None:
        return {}
    if section is not None:
        return dict(cfgfile.read_raw(path).get(section, {}))
    return cfgfile.read_flat(path)


def split_extra_options(desc: ModuleDesc,
                        options: str) -> Tuple[str, Dict[str, str]]:
    """Split a module option string into (known-params optstring,
    extra key→value dict).  The reference modules feed the full
    string through their cfg table; our ModuleDesc carries only the
    engine-level params, so free-form codec options are carved out
    before the strict parse."""
    raw = parse_optstr(options)
    known = {p.name for p in desc.params} | {"help"}
    keep, extra = [], {}
    for k, v in raw.items():
        if k in known:
            keep.append(f"{k}={v}" if v != "" else k)
        else:
            extra[k] = v
    return ":".join(keep), extra


# reference-build-specific keys with no libavcodec counterpart
_X264_SKIP = {"2pass_bug_workaround", "no2pass_bug_workaround"}

# The exact OPT_FLAG pairs from the reference's conf table
# (encode_x264.c:85-87 generates "name" + "no<name>" for each).
# Only these negate on a bare "no"-prefixed key — an option whose
# real name happens to begin with "no" must not be mangled.
_X264_NOFLAGS = {
    "sliced_threads", "deterministic", "nal_hrd", "fullrange",
    "intra_refresh", "deblock", "cabac", "8x8dct", "weight_b",
    "chroma_me", "mixed_refs", "fast_pskip", "dct_decimate",
    "psy", "psnr", "ssim", "mbtree", "aud",
}


def x264_avopts(raw: Dict[str, str]) -> Dict[str, str]:
    """x264.cfg entries → one ``x264-params`` option.  Bare flags map
    to 1; a ``no`` prefix negates (``nocabac`` → cabac=0) only for
    the known conf-table flag pairs, matching the reference's
    generated no-pairs.  ``x264-params`` splits entries on ':' so a
    value containing one would corrupt every later entry — such
    values are rejected with a warning."""
    parts = []
    for k, v in raw.items():
        if k in _X264_SKIP:
            continue
        if ":" in v:
            warn("x264", f"ignoring cfg option {k!r} — ':' in the "
                 f"value would corrupt the x264-params join")
            continue
        if v == "":
            if (k.startswith("no") and len(k) > 2
                    and k[2:] in _X264_NOFLAGS):
                parts.append(f"{k[2:]}=0")
            else:
                parts.append(f"{k}=1")
        else:
            parts.append(f"{k}={v}")
    return {"x264-params": ":".join(parts)} if parts else {}


# xvid.cfg key → (lavc option, value transform).  None transform =
# verbatim.  "flags:+x" appends to the generic flags option.
_XVID_MAP = {
    "max_bframes":     ("bf", None),
    "bquant_ratio":    ("b_quant_factor", lambda v: str(float(v) / 100.0)),
    "bquant_offset":   ("b_quant_offset", lambda v: str(float(v) / 100.0)),
    "quant_type":      ("mpeg_quant",
                        lambda v: "1" if v.strip().lower() == "mpeg"
                        else "0"),
    "trellis":         ("trellis", None),
    "gmc":             ("gmc", None),              # libxvid private
    "lumi_masking":    ("lumi_aq", None),          # libxvid private
    "min_iquant":      ("qmin", None),
    "max_iquant":      ("qmax", None),
    "min_pquant":      ("qmin", None),
    "max_pquant":      ("qmax", None),
    "quarterpel":      ("flags:+qpel", None),
    "greyscale":       ("flags:+gray", None),
    "closed_gop":      ("flags:+cgop", None),
    "interlaced":      ("flags:+ildct", None),
    "chromame":        ("me_quality", None),       # nearest analogue
}


def xvid_avopts(raw: Dict[str, str]) -> Dict[str, str]:
    """xvid.cfg entries → libxvid/generic lavc options via the
    curated map; unmapped keys warn and are skipped (the reference
    likewise ignores keys its table doesn't carry)."""
    out: Dict[str, str] = {}
    flags = ""
    for k, v in raw.items():
        ent = _XVID_MAP.get(k)
        if ent is None:
            warn("xvid", f"no libavcodec mapping for cfg option "
                 f"{k!r} — skipped")
            continue
        name, xf = ent
        if name.startswith("flags:"):
            bit = name.split(":", 1)[1]
            on = (v == "" or v.strip() not in ("0", "no", "off"))
            flags += bit if on else bit.replace("+", "-")
            continue
        try:
            val = xf(v) if xf else (v if v != "" else "1")
        except (ValueError, TypeError):
            # tc_config_read_file tolerance: bad values warn + skip
            warn("xvid", f"bad value {v!r} for cfg option {k!r} — "
                 f"skipped")
            continue
        if name in out and out[name] != val:
            # min_iquant/min_pquant (and the max pair) both land on
            # lavc's global qmin/qmax — merge to the permissive bound
            if name == "qmin":
                val = str(min(int(out[name]), int(val)))
            elif name == "qmax":
                val = str(max(int(out[name]), int(val)))
            warn("xvid", f"cfg options collide on lavc {name!r}; "
                 f"using {val}")
        out[name] = val
    if flags:
        out["flags"] = flags
    return out
