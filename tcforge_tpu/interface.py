"""gtcforge — GUI front-end wrapper (src/gtranscode2.py.in analogue).

The reference ships a PyGTK front-end whose non-GUI layer (binary
discovery, profile enumeration via ``tccfgshow -P``, source probing via
``tcprobe -R``, command-line assembly from option providers, and a
subprocess execution manager) is covered by
``testsuite/test_tcinterface.py``.  This module rebuilds that layer for
the tcforge_tpu entry points; the GTK window itself is gated on the
``gi``/PyGObject dependency exactly as the reference is on pygtk
(gtranscode2.py.in:40-42).

API map (reference file:line):
- ``TranscodeError`` family      -> gtranscode2.py.in:77-151
- ``cmd_output``                 -> :154-166 (``_cmd_output``)
- ``TCBinaries``/``TCConfigManager`` -> :168-225 (the testsuite's
  ``TCBinaries()`` + ``TCConfigManager(bins)`` construction)
- ``TCSourceProbe`` (+ ``_remap``)   -> :227-267
- ``TCSourceFakeProbe``          -> :269-275
- ``TCCmdlineProvider``/``Builder``  -> :277-306
- ``TCExecutionManager``         -> :308-323 (stubbed there; real here)
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
from typing import Dict, List, Optional, Sequence


class TranscodeError(Exception):
    """Base interface error (gtranscode2.py.in:77-96)."""

    def __init__(self, user_msg: str = "", log_msg: str = ""):
        super().__init__(user_msg or log_msg)
        self.user_msg = user_msg
        self.log_msg = log_msg or user_msg

    def to_user(self) -> str:
        return self.user_msg

    def to_log(self) -> str:
        return self.log_msg


class MissingExecutableError(TranscodeError):
    def __init__(self, exe: str):
        super().__init__(f"missing executable: {exe}",
                         f"executable not found in PATH: {exe}")
        self.exe = exe


class MissingOptionError(TranscodeError):
    def __init__(self, optname: str):
        super().__init__(f"missing required option: {optname}",
                         f"option not supplied: {optname}")
        self.optname = optname


class ProbeError(TranscodeError):
    def __init__(self, filename: str, reason: str = "unsupported format"):
        super().__init__(f"cannot probe {filename}: {reason}")
        self.filename = filename
        self.reason = reason


def cmd_output(cmdline: Sequence[str],
               env: Optional[Dict[str, str]] = None):
    """(return code, stripped stdout text) of a command
    (gtranscode2.py.in:154-166)."""
    p = subprocess.Popen(list(cmdline), stdout=subprocess.PIPE,
                         env=env)
    output = p.communicate()[0]
    retval = p.wait()
    return retval, output.decode("utf-8", "replace").strip()


def find_exe(exe: str) -> str:
    """Full path of an executable found in $PATH, else
    MissingExecutableError (gtranscode2.py.in:174-187)."""
    for d in (os.getenv("PATH") or "").split(":"):
        fname = os.path.join(d.strip(), exe)
        if os.access(fname, os.X_OK) and os.path.isfile(fname):
            return fname
    raise MissingExecutableError(exe)


class TCBinaries:
    """Entry-point locations.  The framework's tools are Python module
    entry points, so each "binary" is an argv prefix
    ``[python, -m, tcforge_tpu...]`` rather than a bare path; GUI code
    only ever concatenates options after it."""

    _TOOLS = ("tcprobe", "tccfgshow", "tcmodinfo", "tcdecode",
              "tcextract", "tcscan", "tccat", "tcdemux", "tcexport")

    def __init__(self, python: Optional[str] = None):
        self.python = python or sys.executable
        self.transcode = [self.python, "-m", "tcforge_tpu.cli"]
        for tool in self._TOOLS:
            setattr(self, tool,
                    [self.python, "-m", f"tcforge_tpu.tools.{tool}"])

    def subprocess_env(self) -> Dict[str, str]:
        """Environment for child processes: make sure the package is
        importable from the spawned interpreter."""
        env = dict(os.environ)
        pkg_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
        if pkg_root not in parts:
            parts.insert(0, pkg_root)
        env["PYTHONPATH"] = ":".join(parts)
        return env


class TCConfigManager:
    """Local-installation configuration: binaries + export profiles
    (gtranscode2.py.in:168-225)."""

    def __init__(self, binaries: Optional[TCBinaries] = None):
        self.binaries = binaries or TCBinaries()
        self.transcode = self.binaries.transcode
        self.tccfgshow = self.binaries.tccfgshow
        self.tcprobe = self.binaries.tcprobe
        self.profiles: List[str] = []
        self._profile_path = ""
        self.setup()

    def _get_profiles(self) -> List[str]:
        """Profile names from ``tccfgshow -P`` + a ``*.cfg`` glob
        (gtranscode2.py.in:189-203), with an in-process fallback when
        spawning fails."""
        try:
            ret, out = cmd_output(self.tccfgshow + ["-P"],
                                  env=self.binaries.subprocess_env())
        except OSError:
            ret, out = 1, ""
        if ret != 0 or not out:
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "data", "profiles")
        self._profile_path = out.splitlines()[-1].strip()
        pattern = os.path.join(self._profile_path, "*.cfg")
        return sorted(os.path.splitext(os.path.basename(p))[0]
                      for p in glob.glob(pattern))

    def setup(self) -> None:
        self.profiles = self._get_profiles()

    def discover(self) -> None:
        """Find a system-installed ``transcode``/``tccfgshow`` in PATH
        (gtranscode2.py.in:207-215); with module entry points this is a
        no-op unless real wrappers are installed."""
        try:
            self.transcode = [find_exe("transcode")]
            self.tccfgshow = [find_exe("tccfgshow")]
        except MissingExecutableError:
            pass   # keep the module entry points


class TCSourceProbe:
    """Probes a source with ``tcprobe -R`` and exposes the parsed
    fields under friendly names (gtranscode2.py.in:227-267)."""

    _remap = {
        "ID_FILENAME":      "stream path",
        "ID_FILETYPE":      "stream media",
        "ID_VIDEO_WIDTH":   "video width",
        "ID_VIDEO_HEIGHT":  "video height",
        "ID_VIDEO_FPS":     "video fps",
        "ID_VIDEO_FRC":     "video frc",
        "ID_VIDEO_ASR":     "video asr",
        "ID_VIDEO_FORMAT":  "video format",
        "ID_VIDEO_BITRATE": "video bitrate (kbps)",
        "ID_AUDIO_CODEC":   "audio format",
        "ID_AUDIO_BITRATE": "audio bitrate (kbps)",
        "ID_AUDIO_RATE":    "audio sample rate",
        "ID_AUDIO_NCH":     "audio channels",
        "ID_AUDIO_BITS":    "audio bits per sample",
        "ID_LENGTH":        "stream length (frames)",
    }

    def __init__(self, path: str,
                 binaries: Optional[TCBinaries] = None):
        self.path = path
        self._bins = binaries or TCBinaries()
        self.info = self._get_info()

    def _parse(self, probe_data: str) -> Dict[str, str]:
        res: Dict[str, str] = {}
        for line in probe_data.split("\n"):
            if "=" not in line:
                continue
            k, v = line.strip().split("=", 1)
            try:
                k = TCSourceProbe._remap[k.strip()]
            except KeyError:
                continue
            res[k] = v.strip().strip('"')
        return res

    def _get_info(self) -> Dict[str, str]:
        ret, out = cmd_output(
            self._bins.tcprobe + ["-i", self.path, "-R"],
            env=self._bins.subprocess_env())
        if ret != 0:
            raise ProbeError(self.path)
        return self._parse(out)


class TCSourceFakeProbe(TCSourceProbe):
    """Placeholder source shown before the user picks a file
    (gtranscode2.py.in:269-275)."""

    def __init__(self, path: str = "N/A"):
        self.path = path
        self.info = {v: "" for v in TCSourceProbe._remap.values()}


class TCCmdlineProvider:
    """One GUI pane's contribution to the command line
    (gtranscode2.py.in:277-280)."""

    def cmd_options(self) -> Dict[str, str]:
        raise NotImplementedError


class TCCmdlineBuilder:
    """Assembles the transcode command from providers
    (gtranscode2.py.in:282-306)."""

    def __init__(self, binaries: TCBinaries):
        self._bins = binaries
        self._providers: List[TCCmdlineProvider] = []

    def add_provider(self, prov: TCCmdlineProvider) -> None:
        self._providers.append(prov)

    def command(self) -> List[str]:
        return list(self._bins.transcode)

    def options(self) -> List[str]:
        opts: Dict[str, str] = {}
        for p in self._providers:
            opts.update(p.cmd_options())
        res: List[str] = []
        for k, v in opts.items():
            res.append(str(k))
            if v not in (None, ""):
                res.append(str(v))
        return res

    def cmdline(self) -> str:
        return " ".join(self.command() + self.options())


class TCExecutionManager:
    """Runs and supervises a transcode session as a subprocess
    (gtranscode2.py.in:308-323 — a stub in the reference; real
    start/stop/status here)."""

    def __init__(self, binaries: TCBinaries):
        self._bins = binaries
        self._proc: Optional[subprocess.Popen] = None

    def start(self, opts: Sequence[str],
              exe: Optional[Sequence[str]] = None) -> None:
        if self._proc is not None and self._proc.poll() is None:
            raise TranscodeError("a session is already running")
        argv = list(exe or self._bins.transcode) + list(opts)
        self._proc = subprocess.Popen(
            argv, env=self._bins.subprocess_env(),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def stop(self, timeout: float = 10.0) -> Optional[int]:
        if self._proc is None:
            return None
        if self._proc.poll() is None:
            self._proc.terminate()     # SIGTERM -> cooperative drain
            try:
                self._proc.wait(timeout)
            except subprocess.TimeoutExpired:
                self._proc.kill()
                self._proc.wait()
        return self._proc.returncode

    def status(self) -> str:
        """'idle' | 'running' | 'finished(<rc>)'."""
        if self._proc is None:
            return "idle"
        rc = self._proc.poll()
        return "running" if rc is None else f"finished({rc})"


def run_gui(argv: Optional[List[str]] = None) -> int:
    """Launch the GTK window.  Gated on PyGObject, matching the
    reference's hard pygtk dependency (gtranscode2.py.in:40-42)."""
    try:
        import gi                                    # noqa: F401
    except ImportError:
        print("gtcforge: the GTK interface needs PyGObject (gi); "
              "the command-line interface (python -m tcforge_tpu.cli) "
              "covers all functionality", file=sys.stderr)
        return 1
    raise SystemExit("gtcforge: GTK front-end not implemented for "
                     "this display-less build")


if __name__ == "__main__":
    sys.exit(run_gui())
