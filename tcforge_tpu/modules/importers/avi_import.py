"""AVI import module (import_avi.c analogue: direct avilib access).

Handles raw-fourcc video payloads (I420/YV12/YUY2/UYVY/RGB) and PCM
audio tracks; compressed fourccs raise until a decoder module claims
them.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io.avi import AviReader
from tcforge_tpu.io.rawio import unpack_frame
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)

_FOURCC_FMT = {
    "I420": ImageFormat.YUV420P, "IYUV": ImageFormat.YUV420P,
    "YV12": ImageFormat.YV12, "YUY2": ImageFormat.YUY2,
    "UYVY": ImageFormat.UYVY, "YVYU": ImageFormat.YVYU,
    "RGB": ImageFormat.RGB24, "DIB": ImageFormat.BGR24, "": ImageFormat.BGR24,
}


def _have_bridge() -> bool:
    try:
        from tcforge_tpu.native import av
        return av.available()
    except Exception:
        return False


@register
class AviImporter(Importer):
    info = ModuleInfo(name="avi", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both",
                      codecs_out=(Codec.YUV420P, Codec.RGB24, Codec.PCM),
                      formats_in=(ContainerFormat.AVI,))
    desc = ModuleDesc(name="avi", comment="AVI container reader (avilib)",
                      params=[ParamSpec("track", "audio track", "d", 0)])

    def open(self, path: Optional[str]) -> None:
        self._r = AviReader(path)
        v = self._r.video
        self.width, self.height = v.width, v.height
        self.fps = v.fps
        fcc = v.fourcc.strip().upper()
        self._jpeg = fcc in ("MJPG", "JPEG", "AVDJ", "DMB1")
        self._lzo = fcc == "LZO2"
        self._ff = None
        self._mp4 = None
        if self._lzo:
            # transcode's own LZO2 frames: 16-byte header + LZO1X
            # payload of the raw I420 planes (import_lzo.c role)
            self.format = ImageFormat.YUV420P
        elif self._jpeg:
            # Motion-JPEG: every chunk is a standalone baseline JPEG
            # (tables in-stream; decoded via Pillow like the mov path)
            self.format = ImageFormat.RGB24
        elif fcc in ("XVID", "DIVX", "DX50", "MP4V", "FMP4",
                     "M4S2", "MP4S") and (
                __import__("os").environ.get(
                    "TCFORGE_NATIVE_MPEG4") == "1"
                or not _have_bridge()):
            # MPEG-4 part 2 (DivX/Xvid): the in-tree decoder
            # (io/mpeg4dec.py) — transcode's flagship import case,
            # bridge-free
            from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder
            self._mp4 = Mpeg4Decoder()
            self._mp4_debt = 0       # packed-chunk placeholder credit
            self._mp4_flushed = False
            # TCFORGE_MPEG4_JAX=1: entropy-parse on the host into
            # recon plans and reconstruct GOP batches on the device
            # in one jitted scan (io/mpeg4jax.py) — the MPEG-2
            # importer's staged-recon pattern applied to MPEG-4.
            # Unsupported VOLs (interlace/qpel/GMC) fall back to
            # the numpy decode path wholesale.
            self._mp4_jax = __import__("os").environ.get(
                "TCFORGE_MPEG4_JAX") == "1"
            self._mp4_plans = []     # pending decode-order plans
            self._mp4_refs = None    # device anchor carry
            self._mp4_q = []         # ready cropped display frames
            self._mp4_emitted = 0    # frames handed out (fallback)
            self._mp4_seen_plan = False
            self._mp4_extra = []     # fallback-replay overshoot
            self.format = ImageFormat.YUV420P
        elif fcc not in _FOURCC_FMT:
            # compressed fourcc: delegate the video track to the
            # FFmpeg importer (probe.c select_modules chose
            # import_ffmpeg for these); audio stays on avilib
            try:
                from tcforge_tpu.modules.importers.ffmpeg_import \
                    import FfmpegImporter
                self._ff = FfmpegImporter(self.job)
                self._ff.open(path)
            except Exception:
                raise ValueError(
                    f"avi: compressed fourcc {fcc!r} needs a decoder "
                    "module (FFmpeg/OpenCV delegation unavailable)")
            self.format = ImageFormat.RGB24
        else:
            self.format = _FOURCC_FMT[fcc]
        self.total_frames = self._r.video_frames
        self._pos = 0
        track = self.options.get("track", 0) or self.job.a_track
        self._audio_iter = None
        self._audio_dec = None
        self._audio_buf = np.zeros((0, 2), np.int16)
        if track < len(self._r.audio):
            a = self._r.audio[track]
            self.audio_rate = a.rate
            self.audio_channels = a.channels
            self._audio_iter = self._r.read_audio_chunks(track)
            fmt = getattr(a, "format_tag", 1)
            if fmt in (0x50, 0x55, 0x2000):
                # compressed track (MP2/MP3/AC3): decode through the
                # FFmpeg bridge — the legacy AVI-with-MP3 case the
                # reference handled via lame (import_avi + decode_mp3)
                from tcforge_tpu.native import av
                if not av.available():
                    raise NotImplementedError(
                        "avi: compressed audio track (tag "
                        f"0x{fmt:04x}) needs the FFmpeg bridge "
                        "(make -C native)")
                name = {0x50: "mp2", 0x55: "mp3", 0x2000: "ac3"}[fmt]
                self._audio_dec = av.AvAudioDecoder(name)
            self._audio_dtype = np.int16 if a.bits == 16 else np.uint8
            self._audio_buf = np.zeros((0, a.channels), self._audio_dtype)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        if self._ff is not None:
            return self._ff.read_video_batch(n)
        if self._mp4 is not None:
            if self._mp4_jax:
                return self._read_mp4_jax(n)
            ys, us, vs = [], [], []
            for g in self._mp4_extra:     # jax-fallback overshoot
                ys.append(g[0])
                us.append(g[1])
                vs.append(g[2])
            self._mp4_extra = []
            while len(ys) < n and (self._pos < self.total_frames
                                   or not self._mp4_flushed):
                for g in self._mp4_step():
                    ys.append(g[0])
                    us.append(g[1])
                    vs.append(g[2])
            if not ys:
                return None
            return {"y": np.stack(ys), "u": np.stack(us),
                    "v": np.stack(vs)}
        frames = []
        while len(frames) < n and self._pos < self.total_frames:
            raw, _key = self._r.read_video_frame(self._pos)
            self._pos += 1
            if not raw:
                continue   # drop-frame chunk (avilib zero-size chunks)
            if self._lzo:
                from tcforge_tpu.io import tclzo
                from tcforge_tpu.io.rawio import unpack_frame as upf
                raw2, _fl = tclzo.unpack_frame(
                    raw, self.width * self.height * 3 // 2 + 64)
                frames.append(upf(raw2, self.format, self.width,
                                  self.height))
                continue
            if self._jpeg:
                import io as _io

                from PIL import Image
                img = Image.open(_io.BytesIO(raw)).convert("RGB")
                frames.append((np.asarray(img),))
                continue
            frames.append(unpack_frame(raw, self.format, self.width,
                                       self.height))
        if not frames:
            return None
        if len(frames[0]) == 1:
            return {"rgb": np.stack([f[0] for f in frames])}
        return {"y": np.stack([f[0] for f in frames]),
                "u": np.stack([f[1] for f in frames]),
                "v": np.stack([f[2] for f in frames])}

    def _mp4_step(self) -> list:
        """Decode ONE container chunk on the numpy MPEG-4 path,
        returning the display frames it yields, with packed-chunk
        placeholder (debt) and drop-frame repeat handling."""
        if self._pos >= self.total_frames:
            # EOS: emit the reorder-delayed final non-B frame
            # (B-VOP streams hold one frame back)
            self._mp4_flushed = True
            f = self._mp4.flush()
            return [f] if f is not None else []
        raw, _key = self._r.read_video_frame(self._pos)
        self._pos += 1
        if not raw:
            if self._mp4_debt > 0:
                # placeholder for a B already emitted by a packed
                # P+B chunk
                self._mp4_debt -= 1
                return []
            if self._mp4.last is not None:
                return [self._mp4._crop()]   # drop-frame: repeat
            return []
        got = self._mp4.decode_frames(bytes(raw))
        if len(got) > 1:
            self._mp4_debt += len(got) - 1
        return got

    _MP4_BATCH = 16       # plans per device dispatch

    def _mp4_jax_run(self) -> None:
        """Reconstruct the pending plans in one jitted GOP scan,
        threading the device anchor carry across batches (the lagged
        display scheme makes any decode-order prefix self-contained:
        a B's backward anchor always precedes it in decode order)."""
        from tcforge_tpu.io import mpeg4jax
        plans, self._mp4_plans = self._mp4_plans, []
        if not plans:
            return
        frames, self._mp4_refs = mpeg4jax.run_plans(
            plans, refs0=self._mp4_refs)
        for f in frames:
            self._mp4_q.append(self._mp4._crop_planes(list(f)))

    def _read_mp4_jax(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        while len(self._mp4_q) < n and (
                self._pos < self.total_frames
                or not self._mp4_flushed):
            if self._pos >= self.total_frames:
                self._mp4_flushed = True
                self._mp4_jax_run()
                if self._mp4_refs is not None:
                    # the scan holds back the final anchor: its rb
                    # planes are the carry's second half
                    tail = [np.asarray(p)
                            for p in self._mp4_refs[3:]]
                    self._mp4_q.append(
                        self._mp4._crop_planes(tail))
                break
            raw, _key = self._r.read_video_frame(self._pos)
            self._pos += 1
            if not raw:
                if self._mp4_debt > 0:
                    self._mp4_debt -= 1
                elif self._mp4_seen_plan:
                    # drop-frame chunk: an all-skip P plan — the
                    # device MC copies the reference verbatim, so
                    # the emitted sequence matches the numpy path's
                    # frame repeat
                    plan = self._mp4._plan_new('P')
                    plan['use_f'][:] = 1
                    self._mp4_plans.append(plan)
                    self._mp4._plan = None
                continue
            try:
                plans = self._mp4.parse_plans(bytes(raw))
            except NotImplementedError:
                return self._mp4_jax_fallback(n)
            if plans:
                self._mp4_seen_plan = True
                self._mp4_plans.extend(plans)
                if len(plans) > 1:
                    self._mp4_debt += len(plans) - 1
            if len(self._mp4_plans) >= self._MP4_BATCH:
                self._mp4_jax_run()
        if not self._mp4_q:
            return None
        out, self._mp4_q = self._mp4_q[:n], self._mp4_q[n:]
        self._mp4_emitted += len(out)
        return {"y": np.stack([f[0] for f in out]),
                "u": np.stack([f[1] for f in out]),
                "v": np.stack([f[2] for f in out])}

    def _mp4_jax_fallback(self, n: int):
        """The VOL needs a numpy-path feature (interlace/qpel/GMC):
        replay the stream through the numpy decoder from chunk 0
        (the container is random-access), discarding the frames the
        caller already has."""
        from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder
        self._mp4_jax = False
        self._mp4 = Mpeg4Decoder()
        self._mp4_debt = 0
        self._mp4_flushed = False
        self._mp4_q = []
        self._mp4_plans = []
        self._mp4_refs = None
        self._pos = 0
        skip = self._mp4_emitted
        while skip > 0 and (self._pos < self.total_frames
                            or not self._mp4_flushed):
            got = self._mp4_step()
            if len(got) > skip:
                self._mp4_extra = [tuple(g) for g in got[skip:]]
                skip = 0
            else:
                skip -= len(got)
        return self.read_video_batch(n)

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        if self._audio_iter is None:
            return None
        while self._audio_buf.shape[0] < n_samples:
            if self._audio_dec is not None:
                got = self._audio_dec.read()
                if got is not None:
                    if got.shape[1] != self.audio_channels:
                        self.audio_channels = got.shape[1]
                    self._audio_buf = (got if not len(self._audio_buf)
                                       else np.concatenate(
                                           [self._audio_buf, got]))
                    continue
                chunk = next(self._audio_iter, None)
                if chunk is None:
                    self._audio_dec.flush()
                    got = self._audio_dec.read()
                    if got is not None:
                        self._audio_buf = (got if not len(
                            self._audio_buf) else np.concatenate(
                            [self._audio_buf, got]))
                    break
                self._audio_dec.feed(chunk)
                continue
            chunk = next(self._audio_iter, None)
            if chunk is None:
                break
            a = np.frombuffer(chunk, self._audio_dtype).reshape(
                -1, max(1, self.audio_channels))
            self._audio_buf = np.concatenate([self._audio_buf, a])
        if self._audio_buf.shape[0] == 0:
            return None
        out = self._audio_buf[:n_samples]
        self._audio_buf = self._audio_buf[n_samples:]
        return out

    def seek(self, frame: int) -> bool:
        """-L fast seek: jump the video index, discard matching audio."""
        if self._ff is not None:
            self._ff.seek(frame)
        self._pos = min(frame, self.total_frames)
        if self._audio_iter is not None and self.fps:
            self.read_audio_batch(
                int(round(frame * self.audio_rate / self.fps)))
        return True

    def close(self) -> None:
        if self._ff is not None:
            self._ff.close()
        self._r.close()
