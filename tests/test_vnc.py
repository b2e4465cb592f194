"""Real VNC (RFB) capture: client vs the in-tree synthetic server.

import_vnc.c parity — but the client speaks RFB itself instead of
forking vncrec.  The server keeps a model framebuffer, so every test
compares the client's view bit-exactly against it."""

import numpy as np
import pytest

from tests.rfb_server import RfbTestServer


def _updates():
    return [
        [("fill", 0, 0, 64, 48, (10, 20, 30))],
        [("fill", 8, 8, 16, 12, (200, 100, 50)),
         ("fill", 40, 20, 10, 10, (0, 255, 0))],
        [("copy", 0, 30, 16, 12, 8, 8)],          # copyrect move
        [("fill", 0, 0, 4, 4, (255, 255, 255)),
         ("copy", 60, 44, 4, 4, 0, 0)],
    ]


class TestRfbClient:
    @pytest.mark.parametrize("version", [(3, 3), (3, 7), (3, 8)])
    def test_handshake_and_updates_bit_exact(self, version):
        from tcforge_tpu.io.rfb import RfbClient
        srv = RfbTestServer(version=version, updates=_updates())
        cli = RfbClient("127.0.0.1", srv.port)
        assert (cli.width, cli.height) == (64, 48)
        assert cli.name == "tcforge-fake"
        frames = [cli.poll_frame() for _ in range(4)]
        cli.close()
        srv.join()
        # final client fb == server model, and copyrect really moved
        np.testing.assert_array_equal(frames[-1], srv.model)
        assert (frames[2][30:42, 0:16] == frames[1][8:20, 8:24]).all()
        assert (frames[1][8:20, 8:24] == (200, 100, 50)).all()

    def test_eof_when_server_script_ends(self):
        from tcforge_tpu.io.rfb import RfbClient
        srv = RfbTestServer(updates=_updates()[:1])
        cli = RfbClient("127.0.0.1", srv.port)
        cli.poll_frame()
        with pytest.raises(EOFError):
            cli.poll_frame()
        cli.close()

    def test_parse_display(self):
        from tcforge_tpu.io.rfb import parse_display
        assert parse_display("vnc://h:5901") == ("h", 5901)
        assert parse_display("vnc://h") == ("h", 5900)
        assert parse_display("h:1") == ("h", 5901)
        assert parse_display("h::15900") == ("h", 15900)
        assert parse_display("h:5901") == ("h", 5901)


class TestVncImporterE2E:
    def test_importer_module(self):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        srv = RfbTestServer(updates=_updates())
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "vnc", Job(),
                         "frames=4")
        imp.open(f"vnc://127.0.0.1:{srv.port}")
        assert (imp.width, imp.height) == (64, 48)
        b = imp.read_video_batch(8)
        imp.close()
        srv.join()
        assert b["rgb"].shape == (4, 48, 64, 3)
        np.testing.assert_array_equal(b["rgb"][-1], srv.model)

    def test_engine_session_to_y4m(self, tmp_path):
        """-i vnc://… -x vnc drives a full transcode session."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        srv = RfbTestServer(updates=_updates())
        out = tmp_path / "o.y4m"
        job = Job(video_in_file=f"vnc://127.0.0.1:{srv.port}",
                  video_out_file=str(out), im_v_module="vnc",
                  ex_m_module="y4m", fps=25.0, batch_size=4)
        job.im_v_string = "frames=4"
        c = Pipeline(job).run(progress=False)
        srv.join()
        assert c.encoded == 4
        from tcforge_tpu.io.y4m import Y4MReader
        r = Y4MReader(str(out))
        assert (r.header.width, r.header.height) == (64, 48)
        r.close()
