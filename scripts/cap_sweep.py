"""Sweep the round-width knobs (CAP_DIV full rung, TAIL_DIV straggler
rung) on the production render_frame path. One combo per process run
(env CAPD/TAILD/RES) so jit caches cannot go stale."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from massivevoxelraytracing_tpu.models import raycast, scene  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402


def main():
    hk.CAP_DIV = int(os.environ.get("CAPD", hk.CAP_DIV))
    hk.TAIL_DIV = int(os.environ.get("TAILD", hk.TAIL_DIV))
    hk.MAX_PROBES = int(os.environ.get("P", hk.MAX_PROBES))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", hk.MAX_DDA_ITERS))
    grid_res = int(os.environ.get("RES", 256))
    width, height = 1920, 1088
    tri = meshgen.bumpy_sphere(5, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    tree = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="hako")
    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    def frame_sum():
        img, depth = raycast.render_frame(tree, cam, width, height)
        return float(jnp.sum(jnp.where(depth < 1e37, depth, 0.0)))

    frame_sum()
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        frame_sum()
    dt = (time.time() - t0) / iters
    print(f"RES={grid_res} CAPD={hk.CAP_DIV} TAILD={hk.TAIL_DIV} P={hk.MAX_PROBES} D={hk.MAX_DDA_ITERS}: "
          f"{dt*1e3:.1f} ms = {width*height/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
