"""LZO2 frame codec: the in-tree LZO1X compressor is validated
against libavutil's av_lzo1x_decode (oracle), and the module pair
round-trips losslessly."""

import numpy as np
import pytest

from tcforge_tpu.io import tclzo
from tcforge_tpu.native import av

pytestmark = pytest.mark.skipif(not av.available(),
                                reason="FFmpeg bridge not built")


class TestCompressor:
    @pytest.mark.parametrize("name,data", [
        ("flat", b"\x80" * 10000),
        ("rows", bytes(bytearray(range(256)) * 40)),
        ("tiny", b"xy"),
        ("empty", b""),
        ("pattern", b"pattern123" * 300),
        ("edge238", bytes(range(238))),
        ("edge239", bytes(range(239)) + b"\x00"),
    ])
    def test_oracle_roundtrip(self, name, data):
        comp = tclzo.lzo1x_compress(data)
        if data:
            back = av.lzo1x_decode(comp, len(data) + 64)
            assert back == data, name
        # frame wrapper round trip (store-mode fallback included)
        fr = tclzo.compress_frame(data)
        raw, _ = tclzo.unpack_frame(fr, len(data) + 64)
        assert raw == data

    def test_random_oracle_sweep(self):
        rng = np.random.default_rng(7)
        for trial in range(40):
            n = int(rng.integers(0, 5000))
            if rng.integers(0, 2):
                # structured: repeated random tiles
                tile = rng.integers(0, 256, max(1, n // 7),
                                    dtype=np.uint8).tobytes()
                data = (tile * 8)[:n]
            else:
                data = rng.integers(0, 256, n,
                                    dtype=np.uint8).tobytes()
            comp = tclzo.lzo1x_compress(data)
            if data:
                assert av.lzo1x_decode(comp, n + 64) == data, trial

    def test_compresses_real_planes(self):
        img = (np.tile(np.arange(64, dtype=np.uint8), (64, 1))
               + np.arange(64, dtype=np.uint8)[:, None])
        comp = tclzo.lzo1x_compress(img.tobytes())
        assert len(comp) < len(img.tobytes()) // 5

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            tclzo.unpack_frame(b"\x00" * 32, 64)


class TestLzoAvi:
    def test_lossless_avi_roundtrip(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "l.avi"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module="lzo",
                  ex_m_module="avi", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=6, batch_size=4)
        job.ex_v_fcc = "LZO2"
        Pipeline(job).run(progress=False)

        ref_job = Job(video_in_file="test://",
                      video_out_file=str(tmp_path / "r.y4m"),
                      im_v_module="framegen", im_v_width=64,
                      im_v_height=48, fps=25.0, max_frames=6,
                      batch_size=4)
        Pipeline(ref_job).run(progress=False)

        imp = new_module(ModuleKind.DEMULTIPLEXOR, "lzo", Job())
        imp.open(str(out))
        from tcforge_tpu.io.y4m import Y4MReader
        with Y4MReader(str(tmp_path / "r.y4m")) as r:
            refs = list(r)
        got = []
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            for k in range(b["y"].shape[0]):
                got.append((b["y"][k], b["u"][k], b["v"][k]))
        assert len(got) == 6
        for a, b2 in zip(got, refs):
            for pa, pb in zip(a, b2):
                np.testing.assert_array_equal(pa, pb)
