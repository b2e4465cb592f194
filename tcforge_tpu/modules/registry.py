"""Module kinds, base classes, registries, and capability matching.

Rebuild of ``libtcmodule/tcmodule-data.h`` (the TCModuleClass vtable with
its five module kinds), ``tcmodule.c`` (factory: discovery, instantiation,
"void" defaults for unimplemented methods), ``tcmoduleinfo.c`` (feature/
codec/format intersection checks) and ``tcmoduleregistry.c`` +
``modules.cfg`` (format -> preferred module list).

Key translation: dlopen plugins -> decorator-registered classes; the
factory's refcounting disappears (Python GC); capability checks keep the
same semantics so tcmodchain-style validation works.
"""

from __future__ import annotations

import abc
import enum
from dataclasses import dataclass, field
from typing import (Any, Callable, Dict, Iterator, List, Optional, Sequence,
                    Tuple, Type)

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import AudioBatch, FrameBatch
from tcforge_tpu.core.job import Job
from tcforge_tpu.core.optstr import ModuleDesc


class ModuleKind(enum.Enum):
    """The five NMS module kinds (tcmodule-data.h:121-168)."""

    DEMULTIPLEXOR = "demultiplexor"   # old-style "import" modules
    DECODER = "decoder"
    FILTER = "filter"
    ENCODER = "encoder"
    MULTIPLEXOR = "multiplexor"


class FilterSlot(enum.IntFlag):
    """Filter placement slots (docs/tech/filter-API.txt; frame.h tags)."""

    PRE_S = 1      # single-threaded, right after import
    PRE_M = 2      # in the (conceptual) filter workers, before transforms
    POST_M = 4     # after internal transforms
    POST_S = 8     # single-threaded, right before encode


@dataclass(frozen=True)
class ModuleInfo:
    """Capability record (TCModuleInfo analogue, tcmoduleinfo.c)."""

    name: str
    kind: ModuleKind
    media: str = "video"                       # video | audio | both
    codecs_in: Tuple[Codec, ...] = (Codec.ANY,)
    codecs_out: Tuple[Codec, ...] = (Codec.ANY,)
    formats_in: Tuple[ContainerFormat, ...] = ()
    formats_out: Tuple[ContainerFormat, ...] = ()

    def accepts_codec(self, codec: Codec) -> bool:
        return Codec.ANY in self.codecs_in or codec in self.codecs_in

    def produces_codec(self, codec: Codec) -> bool:
        return Codec.ANY in self.codecs_out or codec in self.codecs_out


def modules_can_chain(producer: ModuleInfo, consumer: ModuleInfo) -> bool:
    """tc_module_info_match analogue: can `producer` feed `consumer`?
    (tcmodchain semantics)."""
    if Codec.ANY in producer.codecs_out or Codec.ANY in consumer.codecs_in:
        return True
    return any(c in consumer.codecs_in for c in producer.codecs_out)


# ----------------------------------------------------------------------- #
# Base classes (the vtable methods, tcmodule-data.h:121-168)


class Module(abc.ABC):
    """Common init/configure/stop/inspect surface."""

    info: ModuleInfo
    desc: ModuleDesc

    def __init__(self, job: Job, options: str = ""):
        self.job = job
        self.options_str = options
        self.options: Dict[str, Any] = (
            self.desc.parse_options(options) if self.desc.params else {})

    def configure(self, options: str) -> None:
        """Reconfigure at runtime (socket 'config' command analogue)."""
        self.options_str = options
        if self.desc.params:
            self.options = self.desc.parse_options(options)

    def inspect(self) -> str:
        return self.desc.describe()

    def stop(self) -> None:
        pass


class Importer(Module):
    """Demultiplexor+decoder rolled together for sources that yield raw
    frames directly (the common case here; compressed sources plug a
    Decoder in between)."""

    @abc.abstractmethod
    def open(self, path: Optional[str]) -> None: ...

    @abc.abstractmethod
    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        """Return dict of stacked planes ('y','u','v' or 'rgb') or None
        at EOS.  Shapes: (N, H, W)."""

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        """(S, C) int16 samples or None."""
        return None

    def seek(self, frame: int) -> bool:
        """Reposition EVERY track to display frame `frame` (-L seek).
        Returns False when unsupported — the engine then decodes and
        drops."""
        return False

    def close(self) -> None:
        pass

    # geometry/rate discovered at open()
    width: int = 0
    height: int = 0
    fps: float = 0.0
    format: ImageFormat = ImageFormat.YUV420P
    total_frames: Optional[int] = None
    audio_rate: int = 0
    audio_channels: int = 0


class VideoFilter(Module):
    """Pure-JAX batched video filter.

    ``apply`` must be traceable (jit-safe): FrameBatch in, FrameBatch out,
    with explicit carry state for temporal filters (the reference's
    static per-instance buffers, e.g. hqdn3d's Frame[3]).
    """

    slots: FilterSlot = FilterSlot.POST_M
    media: str = "video"

    def init_state(self, width: int, height: int,
                   fmt: ImageFormat) -> Any:
        """Return the initial carry pytree (None for stateless)."""
        return None

    def output_size(self, width: int, height: int) -> Tuple[int, int]:
        """Geometry after this filter (rate/size-changing filters
        override; e.g. doublefps halves height)."""
        return width, height

    @abc.abstractmethod
    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        ...

    def collect(self, state: Any) -> None:
        """Host-side hook: the engine calls this after every batch with
        the filter's concrete (materialized) carry.  Analysis filters
        (stabilize) harvest per-frame results here — the device step
        stays pure while unbounded host-side accumulation happens
        outside jit."""

    def finalize(self, state: Any) -> None:
        """Host-side end-of-stream hook (the reference's filter CLOSE
        tag, filter-API.txt): write result files, print reports."""


class AudioFilter(Module):
    slots: FilterSlot = FilterSlot.POST_M
    media: str = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return None

    @abc.abstractmethod
    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        ...

    def collect(self, state: Any) -> None:
        """Host-side per-batch hook (same contract as VideoFilter)."""

    def finalize(self, state: Any) -> None:
        """Host-side end-of-stream hook (filter CLOSE tag)."""


class Encoder(Module):
    """Frame batch -> per-frame payload bytes (encode_video analogue)."""

    @abc.abstractmethod
    def encode_video(self, fb: FrameBatch) -> List[bytes]: ...

    def encode_audio(self, ab: AudioBatch) -> List[bytes]:
        raise NotImplementedError

    # set by flush(): how many real FRAMES the tail payloads contain
    # (0 when the tail is only container/trailer bytes)
    last_flush_frames: int = 0

    def flush(self) -> List[bytes]:
        return []


class Muxer(Module):
    """Container writer (write_video/write_audio analogue)."""

    @abc.abstractmethod
    def open(self, path: str) -> None: ...

    @abc.abstractmethod
    def write_video(self, payload: bytes, keyframe: bool = True) -> int: ...

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        raise NotImplementedError

    def close(self) -> None:
        pass


# ----------------------------------------------------------------------- #
# Registries + factory

_REGISTRIES: Dict[ModuleKind, Dict[str, Type[Module]]] = {
    k: {} for k in ModuleKind}


def register(cls: Type[Module]) -> Type[Module]:
    """Class decorator: the TC_MODULE_ENTRY_POINT analogue."""
    info = getattr(cls, "info", None)
    if info is None:
        raise TypeError(f"{cls.__name__} lacks a ModuleInfo 'info'")
    table = _REGISTRIES[info.kind]
    if info.name in table:
        raise ValueError(f"duplicate module {info.kind}:{info.name}")
    table[info.name] = cls
    return cls


# reference module names that map onto one in-tree implementation
# (import_mpeg2.c / import_mpg.c / import_vob.c all walk the same PS/ES
# demux here; import_yuv4mpeg.c == the y4m module)
_ALIASES = {
    ModuleKind.DEMULTIPLEXOR: {"mpeg2": "mpeg", "mpg": "mpeg",
                               "vob": "mpeg", "yuv4mpeg": "y4m",
                               # import_xvid.c decoded MPEG-4 ASP;
                               # the FFmpeg importer covers it here
                               "xvid": "ffmpeg"},
    ModuleKind.MULTIPLEXOR: {"yuv4mpeg": "y4m", "vob": "mpg",
                             "ps": "mpg"},
    ModuleKind.ENCODER: {"toolame": "mp2enc"},
}


def lookup(kind: ModuleKind, name: str) -> Type[Module]:
    name = _ALIASES.get(kind, {}).get(name, name)
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        known = sorted(_REGISTRIES[kind])
        raise KeyError(
            f"no {kind.value} module {name!r} (known: {known})") from None


def new_module(kind: ModuleKind, name: str, job: Job,
               options: str = "") -> Module:
    """tc_new_module analogue."""
    return lookup(kind, name)(job, options)


def list_modules(kind: Optional[ModuleKind] = None) -> List[str]:
    if kind is not None:
        return sorted(_REGISTRIES[kind])
    return sorted(f"{k.value}:{n}" for k, t in _REGISTRIES.items()
                  for n in t)


# ----------------------------------------------------------------------- #
# Format -> preferred module map (modules.cfg analogue,
# libtcmodule/modules.cfg:1-27 + tc_get_module_name_for_format)

_FORMAT_MAP: Dict[Tuple[str, str], List[str]] = {
    # (kind-role, key) -> preference list
    ("demultiplexor", "yuv4mpeg"): ["y4m"],
    ("demultiplexor", "avi"): ["avi"],
    ("demultiplexor", "wav"): ["wav"],
    ("demultiplexor", "raw"): ["raw"],
    ("demultiplexor", "test"): ["framegen"],
    ("demultiplexor", "mpeg-ps"): ["mpeg"],
    ("demultiplexor", "mpeg-es"): ["mpeg"],
    ("demultiplexor", "mpeg-ts"): ["mpeg"],
    ("demultiplexor", "cdxa"): ["mpeg"],
    ("demultiplexor", "images"): ["im"],
    ("demultiplexor", "xml"): ["xml"],
    ("demultiplexor", "nuv"): ["nuv"],
    ("demultiplexor", "pvn"): ["pvn"],
    ("demultiplexor", "mov"): ["mov"],
    ("demultiplexor", "ogg"): ["ogg"],
    ("demultiplexor", "dv"): ["dv"],
    ("demultiplexor", "vag"): ["vag"],
    ("demultiplexor", "mp3"): ["mp3"],
    ("demultiplexor", "mp2"): ["mp3"],     # same layer I-III decoder
    ("demultiplexor", "ac3"): ["ac3"],
    ("demultiplexor", "flac"): ["flac"],
    ("demultiplexor", "aac"): ["aac"],
    ("demultiplexor", "sgi"): ["im"],
    ("demultiplexor", "sunau"): ["au"],
    # asf/mxf/flv/rmf deliberately unmapped: the lavf-probe fallback
    # routes them to the ffmpeg importer when libavformat can demux
    ("multiplexor", ".nuv"): ["nuv"],
    ("multiplexor", ".pvn"): ["pvn"],
    ("multiplexor", ".mov"): ["mov"],
    ("multiplexor", ".qt"): ["mov"],
    ("multiplexor", ".ppm"): ["im"],
    ("multiplexor", ".pgm"): ["im"],
    ("multiplexor", ".y4m"): ["y4m"],
    ("multiplexor", ".avi"): ["avi"],
    ("multiplexor", ".wav"): ["wav"],
    ("multiplexor", ".raw"): ["raw"],
    ("multiplexor", ".yuv"): ["raw"],
    ("multiplexor", ".ogg"): ["ogg"],
    ("multiplexor", ".ogm"): ["ogg"],
    # MPEG elementary streams are raw byte concatenation;
    # .mpg/.vob get the native program-stream writer
    ("multiplexor", ".m2v"): ["raw"],
    ("multiplexor", ".m1v"): ["raw"],
    ("multiplexor", ".mpg"): ["mpg"],
    ("multiplexor", ".mpeg"): ["mpg"],
    ("multiplexor", ".vob"): ["mpg"],
    ("multiplexor", ".mp4"): ["lavf"],
    ("multiplexor", ".webm"): ["lavf"],
    ("multiplexor", ".flac"): ["lavf"],
    ("multiplexor", ".mkv"): ["lavf"],
    ("multiplexor", ".ts"): ["lavf"],
    ("multiplexor", ".es"): ["raw"],
    ("multiplexor", "null"): ["null"],
    ("encoder", "yuv420p"): ["raw"],
    ("encoder", "rgb24"): ["raw"],
    ("encoder", "pcm"): ["raw"],
    # -N export codec names (modules.cfg [mpeg2video] encoder = ... role)
    ("encoder", "mpeg2video"): ["mpeg2"],
    ("encoder", "mpeg1"): ["mpeg2"],
    ("encoder", "mpeg2"): ["mpeg2"],
    ("encoder", "mpeg1video"): ["mpeg2"],
    ("encoder", "mjpeg"): ["movjpeg"],
    ("encoder", "rtjpeg"): ["nuvrtj"],
    ("encoder", "mpeg4video"): ["xvid", "lavc"],
    ("encoder", "h264"): ["x264", "lavc"],
    ("encoder", "theora"): ["theora"],
    ("encoder", "dvvideo"): ["dv"],
    ("encoder", "mp3"): ["lame"],
    ("encoder", "mp2"): ["mp2enc"],
    ("encoder", "ac3"): ["ac3enc"],
    ("encoder", "vorbis"): ["vorbis"],
    ("encoder", "aac"): ["faac"],
}


def module_name_for_format(role: str, key: str) -> Optional[str]:
    """tc_get_module_name_for_format analogue: first known module for a
    container format or filename extension."""
    table = _REGISTRIES[ModuleKind(role)] if role in (
        k.value for k in ModuleKind) else {}
    for name in _FORMAT_MAP.get((role, key.lower()), []):
        if name in table:
            return name
    return None


def module_names_for_format(role: str, key: str) -> List[str]:
    """The full preference list (callers that can probe for working
    modules iterate and skip gated stubs)."""
    table = _REGISTRIES[ModuleKind(role)] if role in (
        k.value for k in ModuleKind) else {}
    return [n for n in _FORMAT_MAP.get((role, key.lower()), [])
            if n in table]


def find_import_module(fmt: ContainerFormat) -> Optional[str]:
    return module_name_for_format("demultiplexor", fmt.value)


def find_mux_module_for_path(path: str) -> Optional[str]:
    import os
    ext = os.path.splitext(path)[1].lower()
    return module_name_for_format("multiplexor", ext)
