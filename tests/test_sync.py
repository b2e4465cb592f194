"""A/V synchronizer tests (src/synchronizer.c analogue)."""

import numpy as np
import pytest

from tcforge_tpu.pipeline.synchronizer import (AdjustSynchronizer,
                                               Synchronizer,
                                               new_synchronizer)


def planes(n, h=8, w=8, start=0):
    return {"y": np.arange(start, start + n, dtype=np.uint8)
            [:, None, None] * np.ones((1, h, w), np.uint8)}


class TestAudioShift:
    def test_negative_inserts_silence(self):
        s = Synchronizer(audio_shift=-2)
        pcm = np.ones((100, 2), np.int16)
        out = s.process_audio(pcm, spf=10)
        assert out.shape[0] == 120
        assert (out[:20] == 0).all()
        assert (out[20:] == 1).all()
        # shift applies only once
        again = s.process_audio(pcm, spf=10)
        assert again.shape[0] == 100

    def test_positive_drops_audio(self):
        s = Synchronizer(audio_shift=3)
        pcm = np.arange(100, dtype=np.int16).reshape(50, 2)
        out = s.process_audio(pcm, spf=10)
        assert out.shape[0] == 20           # 3 x 10 samples dropped
        assert out[0, 0] == 60

    def test_shift_spans_batches(self):
        s = Synchronizer(audio_shift=8)
        pcm = np.ones((50, 1), np.int16)
        out = s.process_audio(pcm, spf=10)
        assert out.shape[0] == 0
        assert s.audio_shift == 3
        out = s.process_audio(pcm, spf=10)
        assert out.shape[0] == 20
        assert s.audio_shift == 0


class TestAdjust:
    def test_balanced_passthrough(self):
        s = AdjustSynchronizer(frames_margin=1, frames_interval=5)
        for k in range(4):
            out = s.process_video(planes(10, start=k * 10),
                                  audio_frames=10)
            assert next(iter(out.values())).shape[0] == 10
        assert s.video_cloned == 0 and s.video_dropped == 0

    def test_audio_ahead_clones(self):
        s = AdjustSynchronizer(frames_margin=1, frames_interval=5)
        # audio delivers 12 frames per 10 video frames -> drift grows
        total = 0
        for k in range(5):
            out = s.process_video(planes(10, start=k * 10),
                                  audio_frames=12)
            total += next(iter(out.values())).shape[0]
        assert s.video_cloned > 0
        assert total == 50 + s.video_cloned

    def test_video_ahead_drops(self):
        s = AdjustSynchronizer(frames_margin=1, frames_interval=5)
        total = 0
        for k in range(5):
            out = s.process_video(planes(10, start=k * 10),
                                  audio_frames=8)
            total += next(iter(out.values())).shape[0]
        assert s.video_dropped > 0
        assert total == 50 - s.video_dropped

    def test_clone_repeats_saved_frame(self):
        s = AdjustSynchronizer(frames_margin=1, frames_interval=5)
        out = s.process_video(planes(10), audio_frames=14)
        y = next(iter(out.values()))
        # a cloned row equals its predecessor
        dup = [k for k in range(1, y.shape[0])
               if np.array_equal(y[k - 1], y[k])]
        assert s.video_cloned >= 1
        assert len(dup) >= s.video_cloned

    def test_one_time_offset_converges(self):
        """video_counter counts OUTPUT frames (a clone bumps it
        without consuming source, synchronizer.c:255) so a ONE-TIME
        A/V offset triggers a bounded number of fixups and then
        STOPS.  Counting source frames instead (review r4) re-fired a
        fixup every interval forever, growing the output unboundedly."""
        s = AdjustSynchronizer(frames_margin=1, frames_interval=5)
        # one batch with 2 extra audio frames, then steady 1:1
        out0 = s.process_video(planes(10), audio_frames=12)
        total = next(iter(out0.values())).shape[0]
        for k in range(1, 30):
            out = s.process_video(planes(10, start=(k * 10) % 200),
                                  audio_frames=10)
            total += next(iter(out.values())).shape[0]
        # the drift is 2 frames: at most 2 clones (+1 for a pending
        # op executed late), then the fixups stop for good
        assert 1 <= s.video_cloned <= 3
        assert s.video_dropped == 0
        assert total == 300 + s.video_cloned
        before = s.video_cloned
        for k in range(30, 60):
            out = s.process_video(planes(10, start=(k * 10) % 200),
                                  audio_frames=10)
        assert s.video_cloned == before      # converged: no new ops

    def test_factory(self):
        class J:
            sync_method = "adjust"
            av_offset = -1
        s = new_synchronizer(J())
        assert isinstance(s, AdjustSynchronizer)
        assert s.audio_shift == -1
        J.sync_method = "none"
        assert type(new_synchronizer(J())) is Synchronizer


class TestPipelineIntegration:
    def test_short_audio_drops_video(self, tmp_path):
        """Engine end-to-end: audio stream shorter than video -> the
        adjust method drops video frames to hold sync."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io import y4m, wav
        from tcforge_tpu.pipeline.engine import Pipeline
        import tcforge_tpu.modules  # noqa

        h, w, n = 32, 48, 30
        src = tmp_path / "v.y4m"
        hdr = y4m.Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
        c = np.full((h // 2, w // 2), 128, np.uint8)
        with y4m.Y4MWriter(str(src), hdr) as wr:
            for i in range(n):
                wr.write_frame(np.full((h, w), i * 8, np.uint8), c, c)
        # audio: only 20 frames worth of samples at 8000 Hz
        apath = tmp_path / "a.wav"
        spf = 8000 // 25
        pcm = np.zeros((spf * 20, 2), np.int16)
        with wav.WavWriter(str(apath),
                           wav.WavInfo(rate=8000, channels=2)) as ww:
            ww.write_samples(pcm)

        job = Job(video_in_file=str(src), im_v_module="y4m",
                  audio_in_file=str(apath),
                  video_out_file=str(tmp_path / "o.y4m"),
                  audio_out_file=str(tmp_path / "o.wav"),
                  ex_m_module="y4m", batch_size=10, a_rate=8000,
                  sync_method="adjust")
        cnt = Pipeline(job).run(progress=False)
        assert cnt.dropped > 0              # video trimmed toward audio
