"""North-star decomposition with the on-chip scan harness: which of
hqdn3d / deinterlace / rescale dominates at 1080p."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import json

from benches.run_configs import time_chain
from tcforge_tpu.core.job import FilterSpec, Job


def run(label, **kw):
    job = Job(im_v_width=1920, im_v_height=1080, **kw)
    fps = time_chain(job, 1920, 1080, batch=16, iters=24)
    print(json.dumps({"label": label, "fps": round(fps, 1)}),
          flush=True)


if __name__ == "__main__":
    run("identity")
    run("hqdn3d", filters=[FilterSpec("hqdn3d", "luma=4.0")])
    run("deint", deinterlace=5)
    run("rescale", zoom_width=1280, zoom_height=720)
    run("northstar", deinterlace=5, zoom_width=1280, zoom_height=720,
        filters=[FilterSpec("hqdn3d", "luma=4.0")])
