"""pv preview filter + socket preview commands."""

import os
import socket as socketlib
import time

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import FilterSpec, Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.registry import ModuleKind, new_module


def yuv(n, h, w, first=0):
    y = (np.arange(first, first + n, dtype=np.uint8)[:, None, None]
         * np.ones((1, h, w), np.uint8) * 3)
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first, first + n,
                                           dtype=jnp.int32), fps=25.0)


class TestPvFilter:
    def _run(self, filt, n=20):
        st = filt.init_state(32, 16, F.YUV420P)
        out, st = filt.apply(yuv(n, 16, 32), st)
        filt.collect(st)
        return out

    def test_cache_and_draw(self, tmp_path):
        filt = new_module(ModuleKind.FILTER, "pv", Job(),
                          f"cache=15:dir={tmp_path}")
        self._run(filt)
        reply = filt.command("draw")
        assert reply.endswith("OK")
        path = reply.split("\n")[0]
        assert os.path.exists(path)
        assert "preview-000019" in path          # newest frame

    def test_navigation(self, tmp_path):
        filt = new_module(ModuleKind.FILTER, "pv", Job(),
                          f"cache=30:dir={tmp_path}")
        self._run(filt, 30)
        assert filt.command("slowbw") == "OK"    # one frame back
        p = filt.command("draw").split("\n")[0]
        assert "preview-000028" in p
        assert filt.command("fastbw") == "OK"    # 25 more back
        p = filt.command("draw").split("\n")[0]
        assert "preview-000003" in p
        assert filt.command("undo") == "OK"      # back to nav=1
        p = filt.command("draw").split("\n")[0]
        assert "preview-000028" in p

    def test_display_toggle(self, tmp_path):
        filt = new_module(ModuleKind.FILTER, "pv", Job(),
                          f"cache=15:dir={tmp_path}")
        self._run(filt)
        filt.command("display")                  # draw disabled
        assert filt.command("draw") == "FAILED"
        filt.command("display")
        assert filt.command("draw").endswith("OK")

    def test_empty_cache(self, tmp_path):
        filt = new_module(ModuleKind.FILTER, "pv", Job(),
                          f"cache=15:dir={tmp_path}")
        assert filt.command("draw") == "FAILED"


class TestSocketPreview:
    def test_preview_and_pause_commands(self, tmp_path):
        """Drive preview/pause through a live pipeline's socket."""
        from tcforge_tpu.io import y4m
        from tcforge_tpu.pipeline.engine import Pipeline
        import threading

        h, w, n = 32, 48, 120
        src = tmp_path / "v.y4m"
        hdr = y4m.Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
        c = np.full((h // 2, w // 2), 128, np.uint8)
        with y4m.Y4MWriter(str(src), hdr) as wr:
            for i in range(n):
                wr.write_frame(np.full((h, w), i % 200, np.uint8), c, c)

        sock_path = str(tmp_path / "ctl.sock")
        job = Job(video_in_file=str(src), im_v_module="y4m",
                  video_out_file=str(tmp_path / "o.y4m"),
                  ex_m_module="y4m", batch_size=8,
                  socket_path=sock_path,
                  filters=[FilterSpec("pv", f"cache=20:dir={tmp_path}")])
        pipe = Pipeline(job)
        t = threading.Thread(target=pipe.run,
                             kwargs={"progress": False}, daemon=True)
        t.start()
        for _ in range(100):
            if os.path.exists(sock_path) and pipe.counters.frames_in:
                break
            time.sleep(0.05)

        s = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
        s.connect(sock_path)
        s.settimeout(5)

        def cmd(text):
            s.sendall(text.encode() + b"\n")
            return s.recv(4096).decode()

        assert "OK" in cmd("pause")              # engine paused
        frames_at_pause = pipe.counters.encoded
        time.sleep(0.4)
        r = cmd("preview draw")
        assert "OK" in r and "preview-" in r
        assert "OK" in cmd("preview slowbw")
        assert "OK" in cmd("pause")              # resume
        s.close()
        t.join(timeout=30)
        assert pipe.counters.encoded == n        # completed after resume
        snaps = list(tmp_path.glob("preview-*.ppm"))
        assert snaps
