"""The `tcforge` command-line interface.

Rebuild of the reference's CLI surface (``src/cmdline_def.h``, 144
options expanded via X-macros): same single-letter option semantics for
the transform chain (-j, -I, -X, -B, -Z, -Y, -r, -z, -l, -k, -K, -G, -C),
sources/sinks (-i, -o, -p, -m), filters (-J), ranges (-c), colorspace
(-V), rate control (-f) and audio (-s, -E, -d).

Usage:  python -m tcforge_tpu.cli -i in.y4m -J hqdn3d,unsharp=luma=0.8 \
            -Z 640x480 -o out.y4m
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from tcforge_tpu import __version__
from tcforge_tpu.core import log
from tcforge_tpu.core.codecs import ContainerFormat
from tcforge_tpu.core.formats import format_from_string
from tcforge_tpu.core.framecode import parse_ranges
from tcforge_tpu.core.job import FilterSpec, Job


def _parse_clip(text: str):
    """-j T[,L[,B[,R]]] with omitted values mirroring the reference
    (L defaults to T, B to T, R to L)."""
    parts = [int(x) for x in text.split(",")]
    t = parts[0]
    l = parts[1] if len(parts) > 1 else t
    b = parts[2] if len(parts) > 2 else t
    r = parts[3] if len(parts) > 3 else l
    return (t, l, b, r)


def _parse_pair(text: str, sep: str = "x"):
    a, b = text.split(sep, 1)
    return int(a), int(b)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tcforge",
        description="TPU-native stream processing (transcode rebuild)")
    p.add_argument("--version", action="version",
                   version=f"tcforge_tpu {__version__}")
    # files
    p.add_argument("-i", dest="video_in", action="append",
                   help="input file / directory (repeatable: sources "
                   "chain in order)")
    p.add_argument("-p", dest="audio_in", help="separate audio input")
    p.add_argument("-o", dest="video_out", help="output file")
    p.add_argument("-m", dest="audio_out", help="separate audio output")
    # modules
    p.add_argument("-x", dest="im_modules", default="auto,auto",
                   help="import modules vmodule[,amodule]")
    p.add_argument("-y", dest="ex_modules", default="raw,raw,auto",
                   help="export modules venc[,aenc[,mux]]")
    p.add_argument("-F", dest="ex_v_fcc", default="",
                   help="video encoder option string (module-specific, "
                   "e.g. gop_n=12:gop_m=3)")
    p.add_argument("-w", dest="bitrate",
                   help="video bitrate kbps[,keyframes] (enables rate "
                   "control)")
    p.add_argument("-R", dest="multipass",
                   help="multipass mode n[,logfile] (1=analyze 2=encode)")
    # geometry / rate (for headerless input)
    p.add_argument("-g", dest="geometry", help="input WxH for raw input")
    p.add_argument("-f", dest="fps", type=float, help="input fps override")
    p.add_argument("--export_fps", dest="export_fps", type=float,
                   default=0.0, help="output fps (for fps/modfps filters)")
    # transform chain
    p.add_argument("-j", dest="im_clip", help="clip T[,L[,B[,R]]]")
    p.add_argument("-I", dest="deinterlace", type=int, default=0,
                   help="deinterlace mode 1..5")
    p.add_argument("-X", dest="resize_up", help="fast upscale n[,m] units")
    p.add_argument("-B", dest="resize_down",
                   help="fast downscale n[,m] units")
    p.add_argument("-Z", dest="zoom", help="zoom WxH (slow, filtered)")
    p.add_argument("--zoom_filter", default="lanczos3",
                   help="zoom filter (lanczos3|bell|box|mitchell|...)")
    p.add_argument("-Y", dest="ex_clip", help="export clip T[,L[,B[,R]]]")
    p.add_argument("-r", dest="reduce", help="reduce n[,m]")
    p.add_argument("-z", dest="flip_v", action="store_true",
                   help="flip vertically")
    p.add_argument("-l", dest="flip_h", action="store_true", help="mirror")
    p.add_argument("-k", dest="rgbswap", action="store_true",
                   help="swap red/blue")
    p.add_argument("-K", dest="decolor", action="store_true",
                   help="grayscale")
    p.add_argument("-G", dest="gamma", type=float, default=0.0,
                   help="gamma correction")
    p.add_argument("-C", dest="antialias", type=int, default=0,
                   help="antialias mode 1..3")
    # filters
    p.add_argument("-J", dest="filters", action="append", default=[],
                   help="filter chain: name[=opts][,name...]")
    # colorspace / ranges
    p.add_argument("-V", dest="colorspace", default="yuv420p",
                   help="internal colorspace (yuv420p|rgb24|yuv422p)")
    p.add_argument("-c", dest="ranges",
                   help="encode ranges S-E[/step][,...] (times or frames)")
    p.add_argument("--frame_interval", type=int, default=1,
                   help="encode every Nth frame")
    p.add_argument("--max_frames", type=int, help="stop after N frames")
    p.add_argument("-L", dest="vob_offset", type=int, default=0,
                   help="seek: skip the first N source frames")
    p.add_argument("-S", dest="seek_unit", default=None,
                   help="seek unit[,chunks] (program-stream units)")
    p.add_argument("-H", dest="probe_amount", type=int, default=0,
                   help="probe depth hint in MB (0 = default)")
    # audio
    p.add_argument("-s", dest="volume", type=float, default=1.0,
                   help="volume scale")
    p.add_argument("-E", dest="resample", type=int, default=0,
                   help="output sample rate")
    p.add_argument("-d", dest="channels", type=int, default=0,
                   help="output channels")
    p.add_argument("-D", dest="av_offset", type=int, default=0,
                   help="A/V shift in frames (audio delay)")
    p.add_argument("-a", dest="a_track", type=int, default=0,
                   help="audio track to extract")
    p.add_argument("--av_fine_ms", type=int, default=0,
                   help="sub-frame A/V shift in milliseconds")
    p.add_argument("--sync", dest="sync_method", default="adjust",
                   choices=["none", "adjust"],
                   help="A/V synchronizer method")
    p.add_argument("-M", dest="demuxer_sync", type=int, default=1,
                   help="demuxer sync mode (accepted for parity)")
    # engine tuning
    p.add_argument("--batch", type=int, default=16,
                   help="frames per device batch")
    p.add_argument("--prefetch", type=int, default=2,
                   help="host prefetch depth")
    p.add_argument("--rotate_frames", type=int, default=0,
                   help="rotate output every N frames (name-%%03d)")
    p.add_argument("--rotate_mb", type=int, default=0,
                   help="rotate output every N megabytes")
    p.add_argument("--avi_limit", type=int, default=0,
                   help="split AVI output every N megabytes")
    p.add_argument("--split_time", type=float, default=0.0,
                   help="rotate output every N seconds")
    p.add_argument("--avi_comments", dest="avi_comments",
                   help="file of 'TAG text' lines -> AVI LIST INFO")
    p.add_argument("-Q", dest="quality", type=int, default=5,
                   help="encoding quality 1..5 (stored; module hint)")
    p.add_argument("-P", dest="passthrough", type=int, default=0,
                   help="pass-through mode (1=video: -y copy)")
    p.add_argument("--progress_rate", type=float, default=0.5,
                   help="progress meter update interval (seconds)")
    p.add_argument("--nice", dest="niceness", type=int, default=0,
                   help="renice the process")
    p.add_argument("--write_pid", dest="write_pid",
                   help="write the process id to this file")
    p.add_argument("--config_dir", dest="config_dir",
                   help="extra export-profile search directory")
    p.add_argument("--accel", dest="accel", default="",
                   help="accepted for parity (XLA owns acceleration)")
    p.add_argument("--buffers", dest="buffers", type=int, default=0,
                   help="frame ring depth (maps to --prefetch)")
    p.add_argument("--export_asr", type=int, default=0,
                   help="output aspect ratio code")
    p.add_argument("--export_par", default="",
                   help="output pixel aspect num,den")
    p.add_argument("--export_frc", type=int, default=0,
                   help="output frame rate code")
    p.add_argument("--hard_fps", action="store_true",
                   help="force the -f rate over the probed one")
    p.add_argument("--debug", dest="debug_channels", default="",
                   help="debug channels: threads,sync,counter,private,"
                   "cleanup,modules,flist or 'all'")
    p.add_argument("--socket", dest="socket_path",
                   help="runtime control socket path")
    p.add_argument("--mesh", dest="mesh_mode", default="auto",
                   choices=["auto", "off"],
                   help="device-mesh execution over multiple chips")
    p.add_argument("--psu_mode", action="store_true",
                   help="process MPEG program stream units separately "
                   "(-o needs %%d)")
    p.add_argument("--psu_first", type=int, default=0,
                   help="first PSU to process")
    p.add_argument("--psu_last", type=int, default=-1,
                   help="last PSU to process (exclusive; -1 = all)")
    p.add_argument("--export_prof", dest="export_prof", default="",
                   help="export profile name[,name...] (vcd-pal, dvd-ntsc...)")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--progress_off", action="store_true")
    p.add_argument("--list_filters", action="store_true",
                   help="list registered modules and exit")
    return p


def args_to_job(args: argparse.Namespace) -> Job:
    job = Job()
    vin = args.video_in
    if isinstance(vin, list):
        vin = vin[0] if len(vin) == 1 else vin
    job.video_in_file = vin
    job.audio_in_file = args.audio_in
    job.video_out_file = args.video_out
    job.audio_out_file = args.audio_out

    im_mods = (args.im_modules + ",auto").split(",")
    job.im_v_module, job.im_a_module = im_mods[0], im_mods[1]
    ex_mods = (args.ex_modules + ",raw,auto").split(",")
    job.ex_v_module, job.ex_a_module, job.ex_m_module = ex_mods[:3]

    if args.geometry:
        job.im_v_width, job.im_v_height = _parse_pair(args.geometry)
    if args.fps:
        job.fps = args.fps
    if args.export_fps:
        job.ex_fps = args.export_fps
    if args.im_clip:
        job.im_clip = _parse_clip(args.im_clip)
    job.deinterlace = args.deinterlace
    if args.resize_up:
        parts = [int(x) for x in args.resize_up.split(",")]
        job.resize_up = (parts[1] if len(parts) > 1 else 0, parts[0])
    if args.resize_down:
        parts = [int(x) for x in args.resize_down.split(",")]
        job.resize_down = (parts[1] if len(parts) > 1 else 0, parts[0])
    if args.zoom:
        job.zoom_width, job.zoom_height = _parse_pair(args.zoom)
    job.zoom_filter = args.zoom_filter
    if args.ex_clip:
        job.ex_clip = _parse_clip(args.ex_clip)
    if args.reduce:
        parts = [int(x) for x in args.reduce.split(",")]
        job.reduce_h = parts[0]
        job.reduce_w = parts[1] if len(parts) > 1 else parts[0]
    job.flip_v = args.flip_v
    job.flip_h = args.flip_h
    job.rgbswap = args.rgbswap
    job.decolor = args.decolor
    job.gamma = args.gamma
    job.antialias = args.antialias
    job.im_colorspace = format_from_string(args.colorspace)

    for chain in args.filters:
        for part in chain.split(","):
            if part.strip():
                job.filters.append(FilterSpec.parse(part.strip()))

    job.volume = args.volume
    job.mp3frequency = args.resample
    job.av_offset = args.av_offset
    job.sync_method = args.sync_method
    if args.channels:
        job.dm_chan = args.channels
    job.frame_interval = args.frame_interval
    job.max_frames = args.max_frames
    job.batch_size = args.batch
    job.prefetch_depth = args.prefetch
    job.rotate_frames = args.rotate_frames
    job.rotate_mb = args.rotate_mb
    job.socket_path = args.socket_path
    job.mesh_mode = args.mesh_mode
    job.export_profiles = args.export_prof

    job.ex_v_fcc = args.ex_v_fcc
    if args.bitrate:
        parts = args.bitrate.split(",")
        job.bitrate = int(parts[0])
        if len(parts) > 1 and parts[1]:
            job.keyframes = int(parts[1])
        job.rc_requested = True
    if args.multipass:
        parts = args.multipass.split(",")
        job.divxmultipass = int(parts[0])
        if len(parts) > 1 and parts[1]:
            job.divxlogfile = parts[1]
        elif job.divxmultipass:
            job.divxlogfile = "divx4.log"
    job.vob_offset = args.vob_offset
    if args.seek_unit:
        job.seek_unit = int(args.seek_unit.split(",")[0])
    job.probe_amount = args.probe_amount
    job.avi_limit = args.avi_limit
    job.a_track = args.a_track
    job.av_fine_ms = args.av_fine_ms
    job.avi_comments_file = args.avi_comments
    job.quality = args.quality
    if args.passthrough:
        job.ex_v_module = "copy"
    if args.export_asr:
        job.ex_asr = args.export_asr
    if args.export_frc:
        job.ex_frc = args.export_frc
    if args.export_par:
        parts = args.export_par.split(",")
        if len(parts) == 2:
            job.ex_par = (int(parts[0]), int(parts[1]))
    if args.buffers:
        job.prefetch_depth = args.buffers
    if args.niceness:
        try:
            os.nice(args.niceness)
        except OSError as e:
            log.warn("tcforge", "nice failed: %s", e)
    if args.write_pid:
        with open(args.write_pid, "w") as f:
            f.write(str(os.getpid()))
    if args.config_dir:
        from tcforge_tpu.pipeline import export_profile
        export_profile.add_profile_dir(args.config_dir)
    job.hard_fps = args.hard_fps
    job.progress_rate = args.progress_rate
    if args.debug_channels:
        names = {"threads": log.DEBUG_THREADS, "sync": log.DEBUG_SYNC,
                 "counter": log.DEBUG_COUNTER,
                 "private": log.DEBUG_PRIVATE,
                 "cleanup": log.DEBUG_CLEANUP,
                 "modules": log.DEBUG_MODULES, "flist": log.DEBUG_FLIST}
        mask = 0
        for name in args.debug_channels.split(","):
            name = name.strip().lower()
            if name == "all":
                mask = sum(names.values())
            elif name in names:
                mask |= names[name]
            else:
                log.warn("tcforge", "unknown debug channel %r "
                         "(known: %s, all)", name, ",".join(names))
        log.set_debug_channels(mask)
    return job


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.quiet:
        log.set_verbosity(log.LogLevel.WARN)

    import tcforge_tpu.modules  # registers built-ins

    if args.list_filters:
        from tcforge_tpu.modules.registry import list_modules
        for name in list_modules():
            print(name)
        return 0

    if not args.video_in:
        print("missing input file (-i); see --help", file=sys.stderr)
        return 1

    job = args_to_job(args)

    # autoprobe (src/probe.c probe_source analogue); multi-source and
    # directory inputs probe their first file
    if job.video_in_file and job.video_in_file != "test://":
        from tcforge_tpu.io.probe import probe_file, probe_to_job
        try:
            from tcforge_tpu.modules.importers.multi import \
                expand_sources
            srcs = expand_sources(job.video_in_file)
            info = probe_file(srcs[0], probe_mb=job.probe_amount)
            probe_to_job(info, job)
            if len(srcs) > 1 and not args.max_frames:
                job.max_frames = None   # first file's length != total
            log.info("probe", "%s", info.describe())
        except Exception as e:
            log.warn("probe", "probe failed (%s); relying on -g/-f/-x", e)
    else:
        job.im_v_format = ContainerFormat.TEST
        job.im_v_module = ("framegen" if job.im_v_module == "auto"
                           else job.im_v_module)

    if job.export_profiles:
        from tcforge_tpu.pipeline.export_profile import apply_profiles
        try:
            apply_profiles(job.export_profiles, job)
        except FileNotFoundError as e:
            log.error("tcforge", "%s", e)
            return 1

    if args.ranges:
        job.ranges = parse_ranges(args.ranges, job.fps)
    if args.split_time > 0:
        # --split_time: rotation by duration (needs the probed fps)
        job.rotate_frames = max(1, int(round(args.split_time
                                             * (job.fps or 25.0))))
    if args.hard_fps and args.fps:
        job.fps = args.fps             # -f wins over the probe
    job.validate()

    from tcforge_tpu.pipeline.engine import Pipeline

    if args.psu_mode:
        # PSU core mode (transcode.c:662): one engine run per program
        # stream unit, %d in -o names each unit's output
        if "%d" not in (job.video_out_file or ""):
            log.error("tcforge", "--psu_mode needs %%d in -o")
            return 1
        from tcforge_tpu.io.mpeg import count_psus
        n_units = count_psus(job.video_in_file)
        last = args.psu_last if args.psu_last >= 0 else n_units
        out_tpl = job.video_out_file
        total_frames = 0
        for unit in range(args.psu_first, min(last, n_units)):
            job.psu_unit = unit
            job.video_out_file = out_tpl % unit
            try:
                counters = Pipeline(job).run(
                    progress=not args.progress_off and not args.quiet)
            except (IOError, ValueError) as e:
                log.error("tcforge", "PSU %d failed: %s", unit, e)
                return 1
            total_frames += counters.frames_in
            log.info("tcforge", "PSU %d/%d done (%d frames)", unit,
                     n_units, counters.frames_in)
        return 0 if total_frames > 0 else 1

    try:
        pipe = Pipeline(job)
    except (FileNotFoundError, ValueError, KeyError,
            NotImplementedError) as e:
        log.error("tcforge", "cannot start pipeline: %s", e)
        return 1
    try:
        counters = pipe.run(progress=not args.progress_off
                            and not args.quiet)
    except (IOError, ValueError) as e:
        log.error("tcforge", "pipeline failed: %s", e)
        return 1
    return 0 if counters.frames_in > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
