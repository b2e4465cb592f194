"""FFmpeg-backed modules (via OpenCV videoio): the import_ffmpeg.c /
multiplex_lavf.c roles.  Skipped wholesale when cv2 is absent."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _frames(b):
    """Frame count of a video batch dict (native tier returns planar
    y/u/v; the cv2 fallback returns packed rgb)."""
    key = "y" if "y" in b else "rgb"
    return b[key].shape[0]


def _make_xvid_avi(path, n=6, w=64, h=48):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"XVID"),
                         25.0, (w, h))
    assert wr.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(n):
        wr.write(np.ascontiguousarray(
            rng.integers(0, 256, (h, w, 3), np.uint8)))
    wr.release()


class TestFfmpegImporter:
    def test_reads_xvid(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        p = tmp_path / "x.avi"
        _make_xvid_avi(p)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ffmpeg", Job())
        imp.open(str(p))
        assert (imp.width, imp.height) == (64, 48)
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            assert b["y" if "y" in b else "rgb"].dtype == np.uint8
            got += _frames(b)
        assert got == 6

    def test_avi_importer_delegates_compressed(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        p = tmp_path / "x.avi"
        _make_xvid_avi(p)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(str(p))
        b = imp.read_video_batch(8)
        assert b is not None and _frames(b) == 6


class TestLavfMuxer:
    def test_session_roundtrip_psnr(self, tmp_path):
        """framegen -> raw -> lavf(mp4v) -> ffmpeg import: content
        survives the lossy MPEG-4 encode."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "o.avi"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_m_module="lavf",
                  im_v_width=64, im_v_height=48, fps=25.0,
                  max_frames=6, batch_size=4)
        Pipeline(job).run(progress=False)
        assert out.stat().st_size > 0
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ffmpeg", Job())
        imp.open(str(out))
        b = imp.read_video_batch(8)
        assert _frames(b) == 6
        # actually measure PSNR of the decoded luma against the
        # framegen source (lossy MPEG-4 must stay well above noise)
        src = new_module(ModuleKind.DEMULTIPLEXOR, "framegen",
                         Job(im_v_width=64, im_v_height=48, fps=25.0))
        src.open(None)
        ref = src.read_video_batch(6)
        if "y" in b:
            dec_y = b["y"].astype(np.float64)
        else:
            rgb = b["rgb"].astype(np.float64)
            dec_y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                     + 0.114 * rgb[..., 2])
        mse = np.mean((dec_y - ref["y"][:6].astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr > 25.0, f"PSNR {psnr:.1f} dB too low"

    def test_bad_fourcc_rejected(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        job = Job(im_v_width=64, im_v_height=48)
        mux = new_module(ModuleKind.MULTIPLEXOR, "lavf", job,
                         "codec=avc1")
        with pytest.raises(ValueError, match="refused"):
            mux.open(str(tmp_path / "x.mp4"))


class TestMp4EndToEnd:
    def test_mp4_write_and_mov_delegated_read(self, tmp_path):
        """-o out.mp4 -> lavf(mp4v); reading back goes mov importer ->
        FFmpeg delegation."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import (ModuleKind,
                                                  find_mux_module_for_path,
                                                  new_module)
        from tcforge_tpu.pipeline.engine import Pipeline
        assert find_mux_module_for_path("x.mp4") == "lavf"
        out = tmp_path / "o.mp4"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_m_module="lavf",
                  im_v_width=64, im_v_height=48, fps=25.0,
                  max_frames=6, batch_size=4)
        Pipeline(job).run(progress=False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mov", Job())
        imp.open(str(out))
        b = imp.read_video_batch(8)
        assert b is not None and _frames(b) == 6


class TestDeferredMuxerOpen:
    """Muxers must open only after the first NON-EMPTY encode, so
    extradata-publishing encoders (x264 global headers) are stamped
    before the container header is written — even when the first
    batch is fully masked by a -c range."""

    def _run(self, tmp_path, start, end, n=8):
        from tcforge_tpu.core.framecode import from_frames
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.native import av
        from tcforge_tpu.pipeline.engine import Pipeline
        if not av.available():
            pytest.skip("bridge not built")
        out = tmp_path / "o.mp4"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module="x264",
                  ex_m_module="lavf", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=n, batch_size=4,
                  ranges=from_frames(start, end, 25.0))
        c = Pipeline(job).run(progress=False)
        return out, c

    def test_masked_first_batch(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        out, c = self._run(tmp_path, 5, 7)   # batch 0 fully masked
        assert c.encoded == 2
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ffmpeg", Job())
        imp.open(str(out))
        b = imp.read_video_batch(8)
        assert b is not None and _frames(b) == 2

    def test_fully_empty_session(self, tmp_path):
        out, c = self._run(tmp_path, 20, 30)  # no frame selected
        assert c.encoded == 0
        assert out.exists()                    # valid empty container


class TestLavfProbeFallback:
    def test_mkv_probe_and_import(self, tmp_path):
        """Files only FFmpeg recognizes (mkv) probe via libavformat
        and auto-route to the ffmpeg importer."""
        import numpy as np
        from tcforge_tpu.native import av
        if not av.available():
            import pytest
            pytest.skip("bridge not built")
        h, w = 48, 64
        enc = av.AvVideoEncoder("libx264", w, h, 25.0,
                                bitrate=500_000, gop=8,
                                global_header=True)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        pkts = []
        for i in range(6):
            y = np.full((h, w), 20 * i + 10, np.uint8)
            pkts += enc.encode(y, u, u)
        pkts += enc.flush()
        mkv = str(tmp_path / "p.mkv")
        mux = av.AvMuxer(mkv, "matroska")
        vi = mux.add_video("h264", w, h, 25.0, extradata=enc.extradata)
        mux.write_header()
        for i, (p, k) in enumerate(pkts):
            mux.write(vi, p, i, 1, k)
        mux.close()

        from tcforge_tpu.io.probe import probe_file
        info = probe_file(mkv)
        assert "matroska" in info.lavf_container
        assert info.lavf_vcodec == "h264"
        assert (info.width, info.height) == (w, h)

        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "o.y4m"
        job = Job(video_in_file=mkv, video_out_file=str(out),
                  im_v_module="auto", ex_m_module="y4m", batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 6


class TestLavfRouteNewMagics:
    """ASF/FLV identify natively (round-3 magic table) and still
    route through the lavf-probe fallback to the ffmpeg importer."""

    @pytest.mark.parametrize("fmt,ext", [("asf", "asf"),
                                         ("flv", "flv")])
    def test_probe_and_import(self, fmt, ext, tmp_path):
        from tcforge_tpu.native import av
        if not av.available():
            pytest.skip("bridge not built")
        h, w = 48, 64
        enc = av.AvVideoEncoder("libx264" if fmt == "asf" else "flv",
                                w, h, 25.0, bitrate=300_000, gop=8,
                                global_header=(fmt == "asf"))
        u = np.full((h // 2, w // 2), 128, np.uint8)
        pkts = []
        for i in range(6):
            y = np.full((h, w), 30 * i + 10, np.uint8)
            pkts += enc.encode(y, u, u)
        pkts += enc.flush()
        path = str(tmp_path / f"p.{ext}")
        mux = av.AvMuxer(path, fmt)
        vi = mux.add_video("h264" if fmt == "asf" else "flv1",
                           w, h, 25.0, extradata=enc.extradata)
        mux.write_header()
        for i, (p, k) in enumerate(pkts):
            mux.write(vi, p, i, 1, k)
        mux.close()

        from tcforge_tpu.io.probe import sniff_magic
        assert sniff_magic(path).value == fmt   # native identification

        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "o.y4m"
        job = Job(video_in_file=path, video_out_file=str(out),
                  im_v_module="auto", ex_m_module="y4m", batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 6
