"""Export profiles: named parameter overlays for the job.

Rebuild of ``libtcexport/export_profile.c`` (tc_export_profile_*): the
``--export_prof name[,name...]`` option loads INI profiles from the
config directory chain and merges their fields into the job before
command-line options are applied (cmdline wins, export_profile.c:279-420).
Shipped profiles mirror the reference's ``export/*.cfg`` set
(vcd/svcd/dvd in pal+ntsc).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from tcforge_tpu.core import cfgfile, log, ratiocodes
from tcforge_tpu.core.codecs import codec_from_string
from tcforge_tpu.core.job import Job

_TAG = "export_profile"

ENTRIES = [
    cfgfile.ConfigEntry("video_width", "int", 0, 0, 16384),
    cfgfile.ConfigEntry("video_height", "int", 0, 0, 16384),
    cfgfile.ConfigEntry("video_frc", "int", -1, 0, 15),
    cfgfile.ConfigEntry("video_bitrate", "int", 0, 0, 100000),
    cfgfile.ConfigEntry("video_bitrate_max", "int", 0, 0, 100000),
    cfgfile.ConfigEntry("video_codec", "str", ""),
    cfgfile.ConfigEntry("video_module", "str", ""),
    cfgfile.ConfigEntry("audio_codec", "str", ""),
    cfgfile.ConfigEntry("audio_module", "str", ""),
    cfgfile.ConfigEntry("audio_bitrate", "int", 0, 0, 10000),
    cfgfile.ConfigEntry("audio_sample_rate", "int", 0, 0, 192000),
    cfgfile.ConfigEntry("audio_channels", "int", 0, 0, 8),
    cfgfile.ConfigEntry("mplex_module", "str", ""),
    # extension over the reference set: profiles can pin the internal
    # colorspace (imx50-*: 4:2:2 broadcast intra)
    cfgfile.ConfigEntry("video_colorspace", "str", ""),
]


_EXTRA_DIRS: List[str] = []


def add_profile_dir(path: str) -> None:
    """--config_dir: prepend an extra profile search directory."""
    if path not in _EXTRA_DIRS:
        _EXTRA_DIRS.insert(0, path)


def profile_dirs() -> List[str]:
    dirs = list(_EXTRA_DIRS)
    dirs += cfgfile.default_config_dirs()
    dirs.append(os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "data", "profiles"))
    return dirs


def list_profiles() -> List[str]:
    out = set()
    for d in profile_dirs():
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".cfg"):
                    out.add(f[:-4])
    return sorted(out)


def load_profile(name: str) -> Optional[Dict]:
    path = cfgfile.find_config_file(name + ".cfg", profile_dirs())
    if path is None:
        return None
    return cfgfile.read_file(path, "profile", ENTRIES)


def apply_profiles(names: str, job: Job) -> None:
    """tc_export_profile_setup + merge: later profiles override earlier
    ones; values the profile leaves at defaults don't touch the job."""
    for name in names.split(","):
        name = name.strip()
        if not name:
            continue
        prof = load_profile(name)
        if prof is None:
            raise FileNotFoundError(
                f"no export profile {name!r} (known: {list_profiles()})")
        if prof["video_width"] and prof["video_height"]:
            job.zoom_width = prof["video_width"]
            job.zoom_height = prof["video_height"]
        if prof["video_frc"] >= 0:
            fps = ratiocodes.frc_code_to_value(prof["video_frc"])
            if fps:
                job.ex_frc = prof["video_frc"]
                job.ex_fps = fps
        if prof["video_bitrate"]:
            job.bitrate = prof["video_bitrate"]
        if prof["video_bitrate_max"]:
            job.video_max_bitrate = prof["video_bitrate_max"]
        if prof["video_codec"]:
            job.ex_v_codec = codec_from_string(prof["video_codec"])
        if prof["video_module"]:
            job.ex_v_module = prof["video_module"]
        if prof["audio_module"]:
            job.ex_a_module = prof["audio_module"]
        if prof["audio_codec"]:
            job.ex_a_codec = codec_from_string(prof["audio_codec"])
        if prof["audio_bitrate"]:
            job.mp3bitrate = prof["audio_bitrate"]
        if prof["audio_sample_rate"]:
            job.mp3frequency = prof["audio_sample_rate"]
        if prof["audio_channels"]:
            job.dm_chan = prof["audio_channels"]
        if prof["mplex_module"]:
            job.ex_m_module = prof["mplex_module"]
        if prof["video_colorspace"]:
            from tcforge_tpu.core.formats import format_from_string
            job.im_colorspace = format_from_string(
                prof["video_colorspace"])
        log.info(_TAG, "applied export profile %s", name)
