"""Filter-chain compilation: job transforms + filters -> one jitted step.

Rebuild of the per-frame processing path — filter slots
(``docs/tech/architecture.txt:30-90``) around the internal transform
chain ``video_trans.c`` (the "jIXBZYrzlkKGC" order: -j clip,
-I deinterlace, -X/-B fast resize, -Z zoom, -Y clip, -r reduce, -z flip,
-l mirror, -k rgbswap, -K grayscale, -G gamma, -C antialias;
``video_trans.c:192-440``).  Where the reference ping-pongs two malloc'd
buffers per op across N worker threads, here the whole chain traces into
a single XLA computation over the batch and fuses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import AudioBatch, FrameBatch
from tcforge_tpu.core.job import Job
from tcforge_tpu.modules.registry import (AudioFilter, FilterSlot,
                                          ModuleKind, VideoFilter,
                                          new_module)
from tcforge_tpu.ops import audio as audio_ops
from tcforge_tpu.ops import colorspace, video, zoom

F = ImageFormat

_SLOT_ORDER = (FilterSlot.PRE_S, FilterSlot.PRE_M, FilterSlot.POST_M,
               FilterSlot.POST_S)


def _plane_divs(fmt: ImageFormat) -> Tuple[Tuple[int, int], ...]:
    """(width_div, height_div) per plane (set_vtd, video_trans.c:72-110)."""
    if fmt.is_planar:
        sx, sy = fmt.subsampling
        return ((1, 1), (sx, sy), (sx, sy))
    return ((1, 1),)


def _black(fmt: ImageFormat) -> Tuple[int, ...]:
    """black_pixel per plane: 0 for Y/RGB, 128 for chroma
    (video_trans.c:86,93)."""
    if fmt.is_planar:
        return (0, 128, 128)
    return (0,)


def apply_clip(fb: FrameBatch, clip: Tuple[int, int, int, int]) -> FrameBatch:
    """One clip stage (tcv_clip semantics; negative values grow with
    black/neutral border) on a batch in either representation."""
    t, l, b, r = clip
    fmt = fb.format
    if fb.rgb is not None:
        return fb.with_planes(rgb=video.clip_rgb(fb.rgb, t, l, b, r, 0))
    divs = _plane_divs(fmt)
    blacks = _black(fmt)
    outs = [video.clip(p, t // dy, l // dx, b // dy, r // dx, blk)
            for p, (dx, dy), blk in zip(fb.planes, divs, blacks)]
    return fb.with_planes(y=outs[0], u=outs[1] if len(outs) > 1 else None,
                          v=outs[2] if len(outs) > 2 else None)


def apply_video_trans(job: Job, fb: FrameBatch) -> FrameBatch:
    """process_vid_frame port (video_trans.c:192-460), batched."""
    fmt = fb.format
    divs = _plane_divs(fmt)
    blacks = _black(fmt)
    is_rgb = fb.rgb is not None

    def per_plane(op_rgb, op_plane, *planes_args):
        """Apply an op to all planes with per-plane scaled args."""
        if is_rgb:
            return fb.with_planes(rgb=op_rgb(fb.rgb, *planes_args[0]))
        outs = []
        for p, args in zip(fb.planes, planes_args):
            outs.append(op_plane(p, *args))
        return fb.with_planes(y=outs[0],
                              u=outs[1] if len(outs) > 1 else None,
                              v=outs[2] if len(outs) > 2 else None)

    # -j import clip
    if job.im_clip:
        fb = apply_clip(fb, job.im_clip)

    # -I deinterlace
    if job.deinterlace > 0:
        mode = job.deinterlace
        if mode == 1:      # interpolate Y only (video_trans.c:230-250)
            if is_rgb:
                fb = fb.with_planes(rgb=jnp.moveaxis(video.deint_interpolate(
                    jnp.moveaxis(fb.rgb, -1, 1)), 1, -1))
            else:
                fb = fb.with_planes(y=video.deint_interpolate(fb.y))
        elif mode in (3, 4):   # drop bottom field (+zoom back for 3)
            if is_rgb:
                rgbp = jnp.moveaxis(fb.rgb, -1, 1)
                rgbp = video.deint_drop_field(rgbp, drop_top=False)
                if mode == 3:
                    h2 = fb.height
                    rgbp = jnp.stack([zoom.zoom_plane(rgbp[:, c], fb.width,
                                                      h2, job.zoom_filter)
                                      for c in range(rgbp.shape[1])], axis=1)
                fb = fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1))
            else:
                planes = [video.deint_drop_field(p) for p in fb.planes]
                if mode == 3:
                    w, h = fb.width, fb.height
                    planes = [zoom.zoom_plane(p, w // dx, h // dy,
                                              job.zoom_filter)
                              for p, (dx, dy) in zip(planes, divs)]
                fb = fb.with_planes(y=planes[0],
                                    u=planes[1] if len(planes) > 1 else None,
                                    v=planes[2] if len(planes) > 2 else None)
        elif mode == 5:    # linear blend, Y only
            if is_rgb:
                fb = fb.with_planes(rgb=jnp.moveaxis(video.deint_linear_blend(
                    jnp.moveaxis(fb.rgb, -1, 1)), 1, -1))
            else:
                fb = fb.with_planes(y=video.deint_linear_blend(fb.y))
        # mode 2: handled by an explicit pre filter, nothing here

    # -X / -B fast resize (video_trans.c:280-300)
    rw = job.resize_up[0] - job.resize_down[0]
    rh = job.resize_up[1] - job.resize_down[1]
    if rw or rh:
        if is_rgb:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            rgbp = video.resize_fast(rgbp, rw, rh, 8, 8)
            fb = fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1))
        else:
            planes = [video.resize_fast(p, rw, rh, 8 // dx, 8 // dy)
                      for p, (dx, dy) in zip(fb.planes, divs)]
            fb = fb.with_planes(y=planes[0],
                                u=planes[1] if len(planes) > 1 else None,
                                v=planes[2] if len(planes) > 2 else None)

    # -Z zoom (video_trans.c:300-325)
    if job.zoom_width and job.zoom_height:
        zw, zh = job.zoom_width, job.zoom_height
        if is_rgb:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            rgbp = jnp.stack([
                zoom.zoom_plane(rgbp[:, c], zw, zh, job.zoom_filter,
                                interlaced=job.zoom_interlaced)
                for c in range(rgbp.shape[1])], axis=1)
            fb = fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1))
        else:
            planes = list(fb.planes)
            planes[0] = zoom.zoom_plane(planes[0], zw, zh, job.zoom_filter,
                                        interlaced=job.zoom_interlaced)
            for i in range(1, len(planes)):
                dx, dy = divs[i]
                # chroma never interlaced (video_trans.c:305-315)
                planes[i] = zoom.zoom_plane(planes[i], zw // dx, zh // dy,
                                            job.zoom_filter)
            fb = fb.with_planes(y=planes[0],
                                u=planes[1] if len(planes) > 1 else None,
                                v=planes[2] if len(planes) > 2 else None)

    # -Y export clip
    if job.ex_clip:
        fb = apply_clip(fb, job.ex_clip)

    # -r reduce
    if job.reduce_w > 1 or job.reduce_h > 1:
        if is_rgb:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            rgbp = video.reduce(rgbp, job.reduce_w, job.reduce_h)
            fb = fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1))
        else:
            planes = [video.reduce(p, job.reduce_w, job.reduce_h)
                      for p in fb.planes]
            fb = fb.with_planes(y=planes[0],
                                u=planes[1] if len(planes) > 1 else None,
                                v=planes[2] if len(planes) > 2 else None)

    # -z / -l flips
    if job.flip_v:
        if is_rgb:
            fb = fb.with_planes(rgb=video.flip_v_rgb(fb.rgb))
        else:
            outs = [video.flip_v(p) for p in fb.planes]
            fb = fb.with_planes(y=outs[0], u=outs[1] if len(outs) > 1
                                else None, v=outs[2] if len(outs) > 2
                                else None)
    if job.flip_h:
        if is_rgb:
            fb = fb.with_planes(rgb=video.flip_h_rgb(fb.rgb))
        else:
            outs = [video.flip_h(p) for p in fb.planes]
            fb = fb.with_planes(y=outs[0], u=outs[1] if len(outs) > 1
                                else None, v=outs[2] if len(outs) > 2
                                else None)

    # -k rgbswap
    if job.rgbswap and is_rgb:
        fb = fb.with_planes(rgb=fb.rgb[..., ::-1])

    # -K decolor
    if job.decolor:
        if is_rgb:
            fb = fb.with_planes(rgb=video.decolor_rgb(fb.rgb))
        elif fb.u is not None:
            fb = fb.with_planes(u=jnp.full_like(fb.u, 128),
                                v=jnp.full_like(fb.v, 128))

    # -G gamma
    if job.gamma > 0 and job.gamma != 1.0:
        if is_rgb:
            fb = fb.with_planes(rgb=video.gamma_correct(fb.rgb, job.gamma))
        else:
            fb = fb.with_planes(y=video.gamma_correct(fb.y, job.gamma))

    # -C antialias
    if job.antialias > 0:
        if is_rgb:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            rgbp = video.antialias(rgbp, job.antialias_weight,
                                   job.antialias_bias)
            fb = fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1))
        else:
            fb = fb.with_planes(y=video.antialias(fb.y,
                                                  job.antialias_weight,
                                                  job.antialias_bias))
    return fb


class VideoChain:
    """Instantiates the -J filters and compiles the full per-batch step.

    The step is jitted once per (batch, geometry) signature; filter carry
    states are explicit inputs/outputs so temporal filters stay exact
    across batch boundaries (the reference's per-instance static buffers).
    """

    def __init__(self, job: Job, in_format: ImageFormat,
                 width: int, height: int):
        self.job = job
        self.in_format = in_format
        self.width, self.height = width, height
        self.filters: List[VideoFilter] = []
        for spec in job.filters:
            mod = new_module(ModuleKind.FILTER, spec.name, job, spec.options)
            if isinstance(mod, VideoFilter) and spec.enabled:
                self.filters.append(mod)
        self._by_slot: Dict[FilterSlot, List[int]] = {
            s: [i for i, f in enumerate(self.filters) if f.slots & s]
            for s in _SLOT_ORDER}
        # host-staged filters (native CPU kernels) run EAGERLY between
        # jitted segments: host callbacks inside jit are unsafe with
        # the engine's threaded dispatch, and a native kernel needs no
        # tracing anyway.  Only meaningful single-device — with a mesh
        # the gather would defeat the sharding, so stay fully jitted.
        self._host_idx = set()
        if len(jax.local_devices()) == 1:
            for i, f in enumerate(self.filters):
                hs = getattr(f, "host_stage", None)
                if callable(hs) and hs():
                    self._host_idx.add(i)
        else:
            skipped = [f.desc.name for f in self.filters
                       if callable(getattr(f, "host_stage", None))
                       and f.host_stage()]
            if skipped:
                from tcforge_tpu.core import log
                log.info("chain",
                         "multi-device mesh: native host stage "
                         "disabled for %s (jitted path used; "
                         "single-device CPU throughput "
                         "characteristics do not carry over)",
                         ",".join(skipped))
        self._segments = self._build_segments()

    def is_identity(self) -> bool:
        """True when the whole per-batch step is a no-op: no -J filters
        and none of the internal video transforms
        (video_trans.c "jIXBZYrzlkKGC") is active for this job.  The
        engine uses this to keep pure transcode sessions (e.g. decode ->
        encode) on host numpy end-to-end instead of paying a
        device_put + jit dispatch for an identity program."""
        job = self.job
        return (not self.filters
                and self.in_format == job.im_colorspace
                and not job.im_clip and not job.ex_clip
                and not job.pre_im_clip and not job.post_ex_clip
                and job.deinterlace <= 0
                and job.resize_up == job.resize_down
                and not (job.zoom_width and job.zoom_height)
                and job.reduce_w <= 1 and job.reduce_h <= 1
                and not job.flip_v and not job.flip_h
                and not job.rgbswap and not job.decolor
                and (job.gamma <= 0 or job.gamma == 1.0)
                and job.antialias <= 0)

    def initial_states(self) -> List[Any]:
        """Thread the running geometry through the chain in execution
        order (pre slots -> internal transforms -> post slots), so each
        filter's carry state matches the frame size it will actually see
        (the reference's vob->im_v_* vs vob->ex_v_* choice generalized to
        size-changing filters like doublefps)."""
        states: List[Any] = [None] * len(self.filters)
        w, h = self.width, self.height
        if self.job.pre_im_clip:       # runs before the PRE slots
            t, l, b, r = self.job.pre_im_clip
            w, h = w - l - r, h - t - b
        for slot in (FilterSlot.PRE_S, FilterSlot.PRE_M):
            for i in self._by_slot[slot]:
                states[i] = self.filters[i].init_state(
                    w, h, self.job.im_colorspace)
                w, h = self.filters[i].output_size(w, h)
        w, h = self.job.transform_size(w, h, inner=True)
        for slot in (FilterSlot.POST_M, FilterSlot.POST_S):
            for i in self._by_slot[slot]:
                if states[i] is None:
                    states[i] = self.filters[i].init_state(
                        w, h, self.job.im_colorspace)
                w, h = self.filters[i].output_size(w, h)
        return states

    def _program(self) -> List[Tuple[str, Optional[int]]]:
        """The chain as a linear op list in execution order; the
        fixed-position ops mirror _trace-step-era semantics:
        convert+pre_clip, PRE slots, internal transforms, POST slots,
        post_clip (video_trans.c:444-548 ordering)."""
        prog: List[Tuple[str, Optional[int]]] = [("pre", None)]
        for slot in (FilterSlot.PRE_S, FilterSlot.PRE_M):
            prog += [("filter", i) for i in self._by_slot[slot]]
        prog.append(("trans", None))
        for slot in (FilterSlot.POST_M, FilterSlot.POST_S):
            prog += [("filter", i) for i in self._by_slot[slot]]
        prog.append(("post", None))
        return prog

    def _run_op(self, fb: FrameBatch, kind: str) -> FrameBatch:
        if kind == "pre":
            # entry colorspace conversion (-V: internal colorspace)
            if fb.format != self.job.im_colorspace:
                fb = colorspace.convert(fb, self.job.im_colorspace)
            # --pre_clip runs in the import stage, before any filter
            # (preprocess_vid_frame, video_trans.c:483)
            if self.job.pre_im_clip:
                fb = apply_clip(fb, self.job.pre_im_clip)
        elif kind == "trans":
            fb = apply_video_trans(self.job, fb)
        elif kind == "post":
            # --post_clip runs at export, after everything
            # (postprocess_vid_frame, video_trans.c:548)
            if self.job.post_ex_clip:
                fb = apply_clip(fb, self.job.post_ex_clip)
        return fb

    def _build_segments(self):
        """Partition the program into jitted device segments separated
        by eager host-filter stages.  Without host filters this is ONE
        segment — exactly the original single-jit chain step."""
        segments = []
        pending: List[Tuple[str, Optional[int]]] = []

        def flush():
            if not pending:
                return
            entries = list(pending)
            pending.clear()
            idxs = [i for kind, i in entries if kind == "filter"]
            pos = {i: k for k, i in enumerate(idxs)}

            def seg_fn(fb, sub, _entries=entries, _pos=pos):
                sub = list(sub)
                for kind, i in _entries:
                    if kind == "filter":
                        fb, sub[_pos[i]] = self.filters[i].apply(
                            fb, sub[_pos[i]])
                    else:
                        fb = self._run_op(fb, kind)
                return fb, sub

            segments.append(("jit", jax.jit(seg_fn), idxs))

        for kind, i in self._program():
            if kind == "filter" and i in self._host_idx:
                flush()
                segments.append(("host", i, None))
            else:
                pending.append((kind, i))
        flush()
        return segments

    def trace_step(self, fb: FrameBatch,
                   states: List[Any]) -> Tuple[FrameBatch, List[Any]]:
        """Fully-traceable whole-chain step (every filter via its jax
        apply, no host staging) — for callers that embed the chain in
        their own jit/pjit (graft entry, sharded wrappers, benches)."""
        states = list(states)
        for kind, i in self._program():
            if kind == "filter":
                fb, states[i] = self.filters[i].apply(fb, states[i])
            else:
                fb = self._run_op(fb, kind)
        return fb, states

    def __call__(self, fb: FrameBatch,
                 states: List[Any]) -> Tuple[FrameBatch, List[Any]]:
        states = list(states)
        for seg in self._segments:
            if seg[0] == "host":
                i = seg[1]
                fb, states[i] = self.filters[i].apply_host(fb, states[i])
            else:
                _, fn, idxs = seg
                sub = [states[i] for i in idxs]
                fb, sub = fn(fb, sub)
                for k, i in enumerate(idxs):
                    states[i] = sub[k]
        return fb, states


class AudioChain:
    """Audio processing step (audio_trans.c + audio filters)."""

    def __init__(self, job: Job):
        self.job = job
        self.filters: List[AudioFilter] = []
        for spec in job.filters:
            try:
                mod = new_module(ModuleKind.FILTER, spec.name, job,
                                 spec.options)
            except KeyError:
                continue
            if isinstance(mod, AudioFilter) and spec.enabled:
                self.filters.append(mod)
        self._step = jax.jit(self._trace_step)
        self._pre = jax.jit(self._trace_pre)
        # exact streaming -E resampler (host stage; built lazily once
        # the post-conversion channel count is known)
        self._resampler = None

    def initial_states(self) -> List[Any]:
        return [f.init_state(self.job.a_rate, self.job.a_chan)
                for f in self.filters]

    def _trace_pre(self, ab: AudioBatch
                   ) -> Tuple[AudioBatch, jnp.ndarray]:
        """Volume + channel conversion only (everything before the
        resampler)."""
        nclip = jnp.zeros((), jnp.int32)
        # -s volume scaling (audio_trans.c:127+)
        if self.job.volume != 1.0 and self.job.volume > 0:
            pcm, nclip = audio_ops.amplify(ab.pcm, self.job.volume)
            ab = ab.with_pcm(pcm)
        # -d channel conversion
        if self.job.dm_chan != ab.channels:
            if ab.channels == 1 and self.job.dm_chan == 2:
                ab = AudioBatch(pcm=audio_ops.mono_to_stereo(ab.pcm),
                                rate=ab.rate, channels=2,
                                attrs=ab.attrs, frame_ids=ab.frame_ids)
            elif ab.channels == 2 and self.job.dm_chan == 1:
                ab = AudioBatch(pcm=audio_ops.stereo_to_mono(ab.pcm),
                                rate=ab.rate, channels=1,
                                attrs=ab.attrs, frame_ids=ab.frame_ids)
        return ab, nclip

    def _trace_step(self, ab: AudioBatch,
                    states: List[Any]) -> Tuple[AudioBatch, List[Any],
                                                jnp.ndarray]:
        states = list(states)
        ab, nclip = self._trace_pre(ab)
        # -E resample for jit-embedded users of trace_step (graft /
        # pjit): the whole batch resamples as ONE stream with edge
        # replication at batch boundaries, because true streaming
        # state would need dynamic output shapes in jit.  The ENGINE
        # path (__call__) uses the exact StreamingResampler host
        # stage instead, which is batch-size-invariant.
        if self.job.mp3frequency and self.job.mp3frequency != ab.rate:
            n, spf, ch = ab.pcm.shape
            flat = ab.pcm.reshape(1, n * spf, ch)
            out = audio_ops.resample_poly(flat, ab.rate,
                                          self.job.mp3frequency)
            spf_out = out.shape[1] // n
            pcm = out[0, :spf_out * n].reshape(n, spf_out, ch)
            ab = AudioBatch(pcm=pcm, rate=self.job.mp3frequency,
                            channels=ab.channels, attrs=ab.attrs,
                            frame_ids=ab.frame_ids)
        for i, f in enumerate(self.filters):
            ab, states[i] = f.apply(ab, states[i])
        return ab, states, nclip

    # fixed chunk size for the streaming-resample path: raw variable
    # output lengths would retrace the (eager) filter ops per new
    # shape — fixed (k, CHUNK, ch) batches keep the compile cache to
    # a handful of entries.  The sub-chunk remainder carries in a
    # fifo and drains at flush().
    RS_CHUNK = 2048

    def _run_filters(self, out, states, nclip, ch):
        import numpy as np
        fifo = self._rs_fifo
        fifo = out if fifo is None or not len(fifo) \
            else np.concatenate([fifo, out])
        k = len(fifo) // self.RS_CHUNK
        emit = fifo[:k * self.RS_CHUNK] \
            .reshape(k, self.RS_CHUNK, ch)
        self._rs_fifo = fifo[k * self.RS_CHUNK:]
        ab = AudioBatch(pcm=jnp.asarray(emit),
                        rate=self.job.mp3frequency, channels=ch)
        states = list(states)
        for i, f in enumerate(self.filters):
            ab, states[i] = f.apply(ab, states[i])
        return ab, states, nclip

    def __call__(self, ab, states):
        if not (self.job.mp3frequency
                and self.job.mp3frequency != ab.rate):
            # identity fast path: nothing to do -> skip the jit
            # dispatch (and any device commit of host pcm)
            if (not self.filters
                    and not (self.job.volume != 1.0
                             and self.job.volume > 0)
                    and self.job.dm_chan == ab.channels):
                return ab, states, 0
            return self._step(ab, states)
        # exact streaming resample path: jitted pre (volume/channels)
        # -> host polyphase with carried filter history -> filters on
        # fixed-size chunks
        import numpy as np
        ab, nclip = self._pre(ab)
        pcm = np.asarray(ab.pcm)
        ch = pcm.shape[-1]
        if self._resampler is None:
            from tcforge_tpu.ops.audio import StreamingResampler
            self._resampler = StreamingResampler(
                ab.rate, self.job.mp3frequency, ch)
            self._rs_fifo = None
        out = self._resampler.process(pcm.reshape(-1, ch))
        return self._run_filters(out, states, nclip, ch)

    def flush(self, states):
        """Drain the resampler hold-back + chunk fifo at EOS.
        Returns (AudioBatch, states) or (None, states)."""
        if self._resampler is None:
            return None, states
        import numpy as np
        ch = self._resampler.channels
        tail = self._resampler.flush()
        fifo = self._rs_fifo
        parts = [p for p in (fifo, tail)
                 if p is not None and len(p)]
        if not parts:
            return None, states
        pcm = np.concatenate(parts) if len(parts) > 1 else parts[0]
        self._rs_fifo = np.zeros((0, ch), pcm.dtype)
        ab = AudioBatch(pcm=jnp.asarray(pcm[None]),
                        rate=self.job.mp3frequency, channels=ch)
        states = list(states)
        for i, f in enumerate(self.filters):
            ab, states[i] = f.apply(ab, states[i])
        return ab, states
