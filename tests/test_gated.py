"""Gated device/external-lib modules + resample filter tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.frame import AudioBatch
from tcforge_tpu.core.job import Job
from tcforge_tpu.modules.registry import ModuleKind, list_modules, new_module


class TestGatedModules:
    def test_all_reference_import_names_resolve(self):
        names = set(list_modules(ModuleKind.DEMULTIPLEXOR))
        for want in ("v4l", "v4l2", "x11", "vnc", "alsa", "oss", "dvd",
                     "pv3", "ogg", "mov", "pvn", "imlist", "nuv",
                     "mpeg", "avi", "y4m", "wav", "raw", "im", "xml",
                     "framegen"):
            assert want in names, want

    def test_all_reference_encoder_names_resolve(self):
        names = set(list_modules(ModuleKind.ENCODER))
        for want in ("x264", "xvid", "lavc", "theora", "lzo", "lame",
                     "faac", "vorbis", "mpeg2", "movjpeg", "nuvrtj",
                     "copy", "raw", "null"):
            assert want in names, want

    def test_gated_importer_message_names_alternative(self):
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "dvd", Job())
        with pytest.raises(NotImplementedError, match="VIDEO_TS"):
            imp.open("/nonexistent/dvd")

    def test_bridge_encoders_construct(self):
        # x264/xvid/theora/dv are REAL now (system libavcodec bundles
        # libx264/libxvidcore/libtheora/dvvideo); construction succeeds
        # when the bridge is built, else raises the precise gate
        from tcforge_tpu.native import av
        for name in ("x264", "xvid", "theora", "dv"):
            if av.available():
                new_module(ModuleKind.ENCODER, name, Job())
            else:
                with pytest.raises(NotImplementedError,
                                   match="bridge"):
                    new_module(ModuleKind.ENCODER, name, Job())

    def test_v4l2_names_missing_device(self):
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "v4l2", Job())
        with pytest.raises(NotImplementedError, match="/dev/video77"):
            imp.open("/dev/video77")


class TestResampleFilter:
    def test_rate_conversion(self):
        f = new_module(ModuleKind.FILTER, "resample", Job(),
                       "rate=24000")
        pcm = (np.sin(np.arange(2 * 1920) / 9) * 9000).astype(np.int16)
        pcm = np.stack([pcm, pcm], axis=1).reshape(2, 1920, 2)
        ab, _ = f.apply(AudioBatch(pcm=jnp.asarray(pcm), rate=48000,
                                   channels=2), None)
        assert ab.rate == 24000
        assert ab.pcm.shape == (2, 960, 2)
        # content preserved: downsampled sine matches every-other sample
        got = np.asarray(ab.pcm[0, :100, 0], np.int32)
        want = pcm[0, :200:2, 0].astype(np.int32)
        assert np.abs(got - want).mean() < 700

    def test_noop_when_rate_matches(self):
        f = new_module(ModuleKind.FILTER, "resample", Job(),
                       "rate=48000")
        pcm = jnp.zeros((1, 100, 2), jnp.int16)
        ab, _ = f.apply(AudioBatch(pcm=pcm, rate=48000, channels=2),
                        None)
        assert ab.pcm.shape == (1, 100, 2)


class TestGatedFilters:
    def test_sdlview_registers_and_gates_headless(self, monkeypatch):
        """sdlview is REAL (native X11 display client) but must fail
        with a precise message when no display is reachable."""
        import pytest as _pytest
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.setenv("DISPLAY", ":99")
        monkeypatch.delenv("XAUTHORITY", raising=False)
        with _pytest.raises(NotImplementedError) as e:
            new_module(ModuleKind.FILTER, "sdlview", Job())
        assert "sdlview" in str(e.value)
