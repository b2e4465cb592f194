"""Rate filter + audio filter tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import ATTR_SKIPPED, AudioBatch, FrameBatch
from tcforge_tpu.core.job import FilterSpec, Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.registry import ModuleKind, new_module

RNG = np.random.default_rng(31)


def batch(n, h=8, w=8, first_id=0):
    return FrameBatch.blank(n, w, h, F.YUV420P, fps=25.0,
                            first_id=first_id)


def c_fps_reference(n, infps, outfps):
    """Straight port of filter_fps.c counters: returns emission counts
    per input frame."""
    framesin = framesout = 0
    out = []
    for _ in range(n):
        if infps > outfps:
            framesin += 1
            if framesin / infps > framesout / outfps:
                framesout += 1
                out.append(1)
            else:
                out.append(0)
        else:
            framesin += 1
            copies = 1
            framesout += 1
            while framesin / infps > framesout / outfps:
                framesout += 1
                copies += 1
            out.append(copies)
    return out


class TestFps:
    @pytest.mark.parametrize("infps,outfps", [(30.0, 24.0), (25.0, 29.97),
                                              (29.97, 23.976),
                                              (10.0, 25.0)])
    def test_matches_c_counters(self, infps, outfps):
        n = 50
        want = c_fps_reference(n, infps, outfps)
        job = Job(fps=infps)
        filt = new_module(ModuleKind.FILTER, "fps",
                          job, f"infps={infps}:outfps={outfps}")
        out, _ = filt.apply(batch(n), None)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        ids = np.asarray(out.frame_ids)
        got = [int((~sk[ids == i]).sum()) for i in range(n)]
        assert got == want, (got[:10], want[:10])

    def test_legacy_syntax(self):
        job = Job(fps=25.0)
        filt = new_module(ModuleKind.FILTER, "fps", job, "25:50")
        assert filt.outfps == 50.0
        assert job.ex_fps == 50.0


class TestSkipSlowmo:
    def test_skip_ranges(self):
        # framecode syntax (filter_skip.c uses parse_fc_time_string):
        # bare numbers are SECONDS, ".F" adds a frame offset, end is
        # exclusive — 0.5-0.8 at 25 fps = frames 5,6,7
        filt = new_module(ModuleKind.FILTER, "skip", Job(fps=25.0),
                          "0.5-0.8")
        out, _ = filt.apply(batch(10), None)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        assert sk.tolist() == [False] * 5 + [True] * 3 + [False] * 2

    def test_skip_step_and_spaces(self):
        # "start-end/step [...]": space-separated list, /step skips
        # every step-th frame only (fc_frame_in_time semantics)
        filt = new_module(ModuleKind.FILTER, "skip", Job(fps=25.0),
                          "0.0-0.6/2 0.8-0.9")
        out, _ = filt.apply(batch(12), None)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        assert sk.tolist() == [True, False, True, False, True, False,
                               False, False, True, False, False, False]

    def test_slowmo(self):
        filt = new_module(ModuleKind.FILTER, "slowmo", Job(), "factor=3")
        out, _ = filt.apply(batch(4), None)
        assert out.batch == 12
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        assert not sk.any()
        assert np.asarray(out.frame_ids).tolist() == \
            [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]


class TestAudioFilters:
    def _ab(self, frames=6, spf=400, amp=1000):
        pcm = (RNG.normal(0, amp, (frames, spf, 2))
               .clip(-32768, 32767).astype(np.int16))
        return AudioBatch(pcm=jnp.asarray(pcm), rate=48000, channels=2)

    def test_normalize_raises_quiet_audio(self):
        filt = new_module(ModuleKind.FILTER, "normalize", Job(), "")
        st = filt.init_state(48000, 2)
        ab = self._ab(frames=20, amp=800)
        out, state = filt.apply(ab, st)
        in_rms = float(np.sqrt((np.asarray(ab.pcm, float) ** 2).mean()))
        out_rms = float(np.sqrt((np.asarray(out.pcm, float) ** 2).mean()))
        assert out_rms > in_rms * 1.5
        assert float(state[0]) > 1.0

    def test_normalize_silence_keeps_gain(self):
        filt = new_module(ModuleKind.FILTER, "normalize", Job(), "")
        st = filt.init_state(48000, 2)
        silent = AudioBatch(pcm=jnp.zeros((3, 100, 2), jnp.int16))
        _, state = filt.apply(silent, st)
        assert float(state[0]) == 1.0   # silence gate holds the gain

    def test_normalize_algo2(self):
        """Weighted-mean mode: gain only engages after
        MIN_SAMPLE_SIZE samples of history, then tracks MID/avg."""
        filt = new_module(ModuleKind.FILTER, "normalize", Job(),
                          "algo=2")
        st = filt.init_state(48000, 2)
        ab = self._ab(frames=50, spf=800, amp=800)
        out, state = filt.apply(ab, st)
        assert float(state[0]) > 1.5   # quiet audio -> gain up
        o = np.asarray(out.pcm, float)
        assert np.sqrt((o[-1] ** 2).mean()) > \
            np.sqrt((np.asarray(ab.pcm, float)[-1] ** 2).mean()) * 1.5

    def test_astat(self):
        from tcforge_tpu.modules.filters.audio_filters import AstatFilter
        filt = new_module(ModuleKind.FILTER, "astat", Job(), "")
        st = filt.init_state(48000, 2)
        pcm = np.zeros((2, 10, 2), np.int16)
        pcm[0, 3, 1] = 16384
        pcm[1, 2, 0] = -8000
        _, st = filt.apply(AudioBatch(pcm=jnp.asarray(pcm)), st)
        assert AstatFilter.suggested_rescale(st) == pytest.approx(2.0,
                                                                  rel=1e-3)

    def test_detectsilence(self):
        """Interval [start, end] reported at the first loud frame
        after >= silence_frames zeros (filter_detectsilence.c:290)."""
        filt = new_module(ModuleKind.FILTER, "detectsilence", Job(),
                          "scan_only=1:silence_frames=3")
        st = filt.init_state(48000, 2)
        pcm = np.zeros((10, 100, 2), np.int16)
        for i in (4, 9):
            pcm[i] = 5000              # loud frames end silent runs
        _, st = filt.apply(AudioBatch(pcm=jnp.asarray(pcm)), st)
        filt.collect(st)
        assert filt.intervals == [(0, 3), (5, 8)]
        filt.finalize(st)

    def test_lowpass_reduces_hf(self):
        filt = new_module(ModuleKind.FILTER, "lowpass", Job(), "taps=10")
        st = filt.init_state(48000, 1)
        t = np.arange(2000)
        hf = (10000 * np.sign(np.sin(t * 2.5))).astype(np.int16)
        ab = AudioBatch(pcm=jnp.asarray(hf.reshape(1, 2000, 1)),
                        channels=1)
        out, _ = filt.apply(ab, st)
        assert np.abs(np.asarray(out.pcm)).max() \
            < np.abs(hf).max() * 0.8


class TestFpsPipeline:
    def test_fps_downconvert_end_to_end(self, tmp_path):
        from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter
        from tcforge_tpu.pipeline.engine import Pipeline
        src = tmp_path / "in.y4m"
        with Y4MWriter(str(src), Y4MHeader(width=16, height=8,
                                           fps_num=30, fps_den=1)) as w:
            for i in range(30):
                w.write_frame(np.full((8, 16), i, np.uint8),
                              np.full((4, 8), 128, np.uint8),
                              np.full((4, 8), 128, np.uint8))
        dst = tmp_path / "out.y4m"
        job = Job(video_in_file=str(src), video_out_file=str(dst),
                  im_v_module="y4m", ex_m_module="y4m", batch_size=10,
                  filters=[FilterSpec("fps", "infps=30:outfps=10")])
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 10
        with Y4MReader(str(dst)) as r:
            assert r.header.fps == 10.0
            got = [int(fr[0][0, 0]) for fr in r]
        assert len(got) == 10
        assert got == sorted(got)      # order preserved


class TestModFps:
    def _frames(self, n, h=16, w=16):
        out = []
        for i in range(n):
            f = np.full((h, w), (i * 9) % 256, np.uint8)
            out.append(f)
        return out

    def _batch(self, ys, first_id=0):
        y = np.stack(ys)
        n, h, w = y.shape
        c = np.full((n, h // 2, w // 2), 128, np.uint8)
        return FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P,
                                     first_id=first_id)

    def test_buffered_downconvert(self):
        job = Job(fps=30.0, ex_fps=24.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=5")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = self._frames(36)
        # make every 5th frame a near-duplicate (telecine-ish residue)
        for d in range(4, 36, 5):
            ys[d] = ys[d - 1].copy()
        out, _ = filt.apply(self._batch(ys), st)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        emitted = int((~sk).sum())
        # 36 in, 6 warmup, remaining 30 at 30->24 = 24 emitted
        assert 22 <= emitted <= 25, emitted

    def test_buffered_skips_duplicates(self):
        """The skipped frames should be the near-duplicates."""
        job = Job(fps=30.0, ex_fps=24.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=5")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = self._frames(30)
        for d in range(4, 30, 5):
            ys[d] = ys[d - 1].copy()
        out, _ = filt.apply(self._batch(ys), st)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        oy = np.asarray(out.y)
        emitted = oy[~sk]
        # consecutive emitted frames should rarely repeat (duplicates
        # got dropped preferentially)
        dups = sum(int((emitted[i] == emitted[i + 1]).all())
                   for i in range(len(emitted) - 1))
        assert dups <= 2, dups

    def test_buffered_upconvert(self):
        job = Job(fps=24.0, ex_fps=30.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=5")
        st = filt.init_state(16, 16, F.YUV420P)
        out, _ = filt.apply(self._batch(self._frames(30)), st)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        emitted = int((~sk).sum())
        # 30 in, 6 warmup, 24 remaining at 24->30 = 30 emitted
        assert 27 <= emitted <= 31, emitted

    def test_mode0_alias(self):
        job = Job(fps=30.0, ex_fps=15.0)
        filt = new_module(ModuleKind.FILTER, "modfps", job, "mode=0")
        out, _ = filt.apply(self._batch(self._frames(10)), None)
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        assert int((~sk).sum()) == 5

    def test_infrc_and_buffer_alias(self):
        job = Job(fps=25.0, ex_fps=29.97)
        filt = new_module(ModuleKind.FILTER, "modfps", job,
                          "mode=1:infrc=3:buffer=7")      # frc 3 = 25fps
        assert abs(filt.infps - 25.0) < 1e-6
        assert filt.num_sample == 7
        with pytest.raises(ValueError):
            new_module(ModuleKind.FILTER, "modfps",
                       Job(fps=10.0, ex_fps=25.0), "mode=1")

    def _clone_rows(self, out):
        from tcforge_tpu.core.frame import ATTR_WAS_CLONED
        sk = np.asarray(out.has_attr(ATTR_SKIPPED))
        cl = np.asarray(out.has_attr(ATTR_WAS_CLONED))
        return np.asarray(out.y), np.asarray(out.u), ~sk & cl

    def test_clonetype_average(self):
        """Clone copies = (emitted + next emitted) >> 1 (no scene cut
        in a smooth ramp)."""
        job = Job(fps=15.0, ex_fps=30.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=3:clonetype=3")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = [np.full((16, 16), 100 + i, np.uint8) for i in range(20)]
        out, _ = filt.apply(self._batch(ys), st)
        oy, _, clones = self._clone_rows(out)
        idx = np.nonzero(clones)[0]
        assert len(idx) > 0
        for i in idx:
            # row i-1 is the plain copy; the merge partner is the next
            # input, i.e. plain + 1 in this ramp
            base = int(oy[i - 1][0, 0])
            np.testing.assert_array_equal(
                oy[i], np.full((16, 16), (2 * base + 1) >> 1, np.uint8))

    def test_clonetype_interpolate(self):
        job = Job(fps=15.0, ex_fps=30.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=3:clonetype=1")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = [np.full((16, 16), 10 * i, np.uint8) for i in range(16)]
        out, _ = filt.apply(self._batch(ys), st)
        oy, _, clones = self._clone_rows(out)
        idx = np.nonzero(clones)[0]
        assert len(idx) > 0
        i = idx[0]
        base = oy[i - 1][0, 0]
        assert (oy[i][0::2] == base).all()          # even rows: clone
        assert (oy[i][1::2] == base + 10).all()     # odd rows: next

    def test_clonetype_phosphor(self):
        job = Job(fps=15.0, ex_fps=30.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=3:clonetype=5")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = [np.full((16, 16), 100 + i, np.uint8) for i in range(16)]
        out, _ = filt.apply(self._batch(ys), st)
        oy, ou, clones = self._clone_rows(out)
        idx = np.nonzero(clones)[0]
        i = idx[0]
        c = int(oy[i - 1][0, 0])
        n = c + 1
        exp = np.float32((c ** 3 + n ** 3) >> 1) ** np.float32(1 / 3)
        assert (oy[i] == np.uint8(np.rint(exp))).all()

    def test_clonetype_scene_gate(self):
        """A hard cut between clone and next must suppress blending."""
        job = Job(fps=15.0, ex_fps=30.0)
        filt = new_module(ModuleKind.FILTER, "modfps",
                          job, "mode=1:examine=3:clonetype=3")
        st = filt.init_state(16, 16, F.YUV420P)
        ys = [np.full((16, 16), 0 if i < 8 else 255, np.uint8)
              for i in range(16)]
        out, _ = filt.apply(self._batch(ys), st)
        oy, _, clones = self._clone_rows(out)
        for i in np.nonzero(clones)[0]:
            base = oy[i - 1][0, 0]
            nxt = 255 if base == 0 else base
            # across the cut the clone must stay the plain copy
            assert oy[i][0, 0] in (base, (int(base) + int(nxt)) >> 1)
            if base == 0 and oy[i][4, 4] not in (0,):
                # the 0->255 boundary clone: must NOT be 127-blended
                assert oy[i][4, 4] == 255 or oy[i][4, 4] == 0


class TestPolyphaseResampler:
    def _snr(self, fn, f=5000.0, src=48000, dst=44100, s_in=24000):
        import jax.numpy as jnp
        from tcforge_tpu.ops import audio as audio_ops
        t_in = np.arange(s_in) / src
        amp = 30000.0
        x = (amp * np.sin(2 * np.pi * f * t_in)).astype(np.int16)
        y = np.asarray(fn(jnp.asarray(x[None, :, None]), src, dst),
                       np.float64)[0, :, 0]
        s_out = y.shape[0]
        t_out = np.arange(s_out) * (src / dst) / src
        ideal = amp * np.sin(2 * np.pi * f * t_out)
        m = slice(64, s_out - 64)            # trim filter edges
        err = y[m] - ideal[m]
        return 10 * np.log10(np.mean(ideal[m] ** 2) / np.mean(err ** 2))

    def test_beats_linear_by_30db(self):
        """VERDICT round-2 criterion: windowed-sinc beats linear by
        >30 dB on a sine (filter_resample.c quality intent)."""
        from tcforge_tpu.ops.audio import resample_linear, resample_poly
        for f in (1000.0, 5000.0, 15000.0):
            lin = self._snr(resample_linear, f=f)
            poly = self._snr(resample_poly, f=f)
            assert poly - lin > 30, (f, lin, poly)
            assert poly > 80

    def test_identity_when_rates_match(self):
        import jax.numpy as jnp
        from tcforge_tpu.ops.audio import resample_poly
        x = np.arange(-50, 50, dtype=np.int16)[None, :, None]
        y = resample_poly(jnp.asarray(x), 48000, 48000)
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_dc_preserved(self):
        import jax.numpy as jnp
        from tcforge_tpu.ops.audio import resample_poly
        x = np.full((1, 4000, 2), 1234, np.int16)
        y = np.asarray(resample_poly(jnp.asarray(x), 48000, 32000))
        assert np.all(np.abs(y.astype(int) - 1234) <= 1)

    def test_upsample_shape(self):
        import jax.numpy as jnp
        from tcforge_tpu.ops.audio import resample_poly
        x = np.zeros((2, 1000, 2), np.int16)
        y = resample_poly(jnp.asarray(x), 32000, 48000)
        assert y.shape == (2, 1500, 2)


class TestStreamingResampler:
    """Exact streaming -E path (VERDICT r2 item 6): output must be
    batch-size-invariant, unlike the block resampler's edge-replicated
    batch boundaries."""

    def _run_chunked(self, x, chunk, src=48000, dst=44100):
        from tcforge_tpu.ops.audio import StreamingResampler
        rs = StreamingResampler(src, dst, x.shape[-1])
        outs = [rs.process(x[i:i + chunk])
                for i in range(0, len(x), chunk)]
        outs.append(rs.flush())
        return np.concatenate(outs)

    def test_batch_size_invariant(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-20000, 20000, (9973, 2)).astype(np.int16)
        a = self._run_chunked(x, 7)
        b = self._run_chunked(x, 4096)
        c = self._run_chunked(x, 9973)
        assert len(a) == len(b) == len(c) == 9973 * 44100 // 48000
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)

    def test_sine_quality(self):
        src, dst, f, amp = 48000, 44100, 5000.0, 30000.0
        t_in = np.arange(24000) / src
        x = (amp * np.sin(2 * np.pi * f * t_in)) \
            .astype(np.int16)[:, None]
        y = self._run_chunked(x, 1024).astype(np.float64)[:, 0]
        t_out = np.arange(len(y)) * (src / dst) / src
        ideal = amp * np.sin(2 * np.pi * f * t_out)
        m = slice(64, len(y) - 64)
        snr = 10 * np.log10(np.mean(ideal[m] ** 2)
                            / np.mean((y[m] - ideal[m]) ** 2))
        assert snr > 80, snr

    def test_engine_session_invariant(self, tmp_path):
        """wav -> -E 44100 -> wav: identical output PCM for batch
        sizes 4 and 32."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.wav import WavInfo, WavReader, WavWriter
        from tcforge_tpu.pipeline.engine import Pipeline
        rng = np.random.default_rng(2)
        pcm = rng.integers(-25000, 25000, (48000, 2)).astype(np.int16)
        src = tmp_path / "in.wav"
        w = WavWriter(str(src), WavInfo(rate=48000, channels=2))
        w.write_samples(pcm)
        w.close()
        outs = []
        for bs in (4, 32):
            out = tmp_path / f"o{bs}.wav"
            job = Job(video_in_file=str(src),
                      video_out_file=str(out), im_v_module="wav",
                      ex_m_module="wav", batch_size=bs,
                      mp3frequency=44100)
            Pipeline(job).run(progress=False)
            with WavReader(str(out)) as r:
                assert r.info.rate == 44100
                outs.append(r.read_samples(1 << 22))
        assert outs[0].shape == outs[1].shape
        np.testing.assert_array_equal(outs[0], outs[1])


class TestStreamingResampleToVorbis:
    def test_wav_resample_to_ogg(self, tmp_path):
        """-E 44100 streaming chunks feed the vorbis encoder and the
        EOS flush drains the fifo (audio-only session e2e)."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io import ogg as O
        from tcforge_tpu.io.wav import WavInfo, WavWriter
        from tcforge_tpu.pipeline.engine import Pipeline
        rng = np.random.default_rng(3)
        n_in = 48000
        pcm = (np.sin(np.arange(n_in) / 15)
               * 15000).astype(np.int16)[:, None].repeat(2, 1)
        src = tmp_path / "in.wav"
        w = WavWriter(str(src), WavInfo(rate=48000, channels=2))
        w.write_samples(pcm)
        w.close()
        out = tmp_path / "o.ogg"
        job = Job(video_in_file=str(src), video_out_file=str(out),
                  im_v_module="wav", ex_a_module="vorbis",
                  ex_m_module="ogg", batch_size=8,
                  mp3frequency=44100)
        Pipeline(job).run(progress=False)
        with open(out, "rb") as f:
            streams = O.identify_streams(f)
        assert [s.codec for s in streams] == ["vorbis"]
        assert streams[0].samplerate == 44100
        # decode back: sample count ~= n_in * 44100/48000
        from tcforge_tpu.io.vorbis import VorbisDecoder
        with open(out, "rb") as f:
            pkts = [p for _, p in O.pages_to_packets(
                O.iter_pages(f), streams[0].serial)]
        dec = VorbisDecoder()
        for p in pkts[:3]:
            dec.header_packet(p)
        got = 0
        for p in pkts[3:]:
            d = dec.audio_packet(p)
            if d is not None:
                got += d.shape[0]
        want = n_in * 44100 // 48000
        assert abs(got - want) < 4096, (got, want)
