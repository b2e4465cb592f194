"""Multi-host runner: 2 jax.distributed processes over loopback, frame
ranges sharded, chunks merged — output must equal a single-host run."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter

pytestmark = pytest.mark.skipif(
    not os.environ.get("TCFORGE_SLOW_TESTS"),
    reason="subprocess e2e (TCFORGE_SLOW_TESTS=1)")

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from tcforge_tpu.parallel.distributed import main
sys.exit(main(sys.argv[1:]))
"""


def test_two_process_matches_single(tmp_path):
    rng = np.random.default_rng(4)
    n, w, h = 20, 32, 16
    src = tmp_path / "in.y4m"
    hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
    frames = [(rng.integers(0, 255, (h, w), dtype=np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8))
              for _ in range(n)]
    with Y4MWriter(str(src), hdr) as wr:
        for fr in frames:
            wr.write_frame(*fr)

    # single-host reference
    from tcforge_tpu.cli import main as cli_main
    ref_out = tmp_path / "ref.y4m"
    assert cli_main(["-i", str(src), "-o", str(ref_out),
                     "-J", "hqdn3d=luma=4.0", "--progress_off",
                     "-q"]) == 0

    out = tmp_path / "dist.y4m"
    env = {**os.environ, "PYTHONPATH": "/root/repo",
           "JAX_PLATFORMS": "cpu"}
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-c", _CHILD,
               "--coordinator", "localhost:29777",
               "--nprocs", "2", "--proc", str(pid),
               "-i", str(src), "-o", str(out), "--",
               "-J", "hqdn3d=luma=4.0"]
        procs.append(subprocess.Popen(cmd, env=env,
                                      stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=180)
        assert p.returncode == 0, err.decode()[-2000:]

    with Y4MReader(str(ref_out)) as r:
        ref = [tuple(pl.copy() for pl in fr) for fr in r]
    with Y4MReader(str(out)) as r:
        got = [tuple(pl.copy() for pl in fr) for fr in r]
    assert len(got) == len(ref) == n
    for a, b in zip(ref, got):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
