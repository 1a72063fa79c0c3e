"""A/B: intersect_rays_hako standalone vs nested inside an outer jit
(render_frame's situation), same rays, same tree, same config."""

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
    hk.MAX_PROBES = int(os.environ.get("P", 2))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", 12))
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
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta

    packet = raycast.MAX_RAY_PACKET
    order_pad, _ = raycast._cached_order(width, height, packet)
    idx = np.asarray(order_pad)
    live = idx >= 0
    safe = np.maximum(idx, 0)
    px = (safe % width).astype(np.float32)
    py = (safe // width).astype(np.float32)
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * (px + 0.5) / width) * (width / height)
    v = th - 2.0 * th * (py + 0.5) / height
    rd = (u[:, None] * np.asarray(cam.right) + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)
    ro = np.where(live[:, None], np.asarray(cam.o)[None, :], 1e9).astype(np.float32)
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
    n = width * height

    def timeit(fn, iters=3):
        chk = fn()
        t0 = time.time()
        for _ in range(iters):
            chk = fn()
        dt = (time.time() - t0) / iters
        return dt, chk

    # standalone (sweep form)
    def run_standalone():
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper, ro_j, rd_j,
            T=T, level_rows=level_rows, shadow=False)
        return float(jnp.sum(jnp.where(t < 1e37, t, 0.0)))

    dt, chk = timeit(run_standalone)
    print(f"standalone: {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s  chk={chk:.4f}",
          flush=True)

    # nested inside one outer jit (render_frame form)
    @jax.jit
    def nested(ro_j, rd_j):
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper, ro_j, rd_j,
            T=T, level_rows=level_rows, shadow=False)
        return jnp.sum(jnp.where(t < 1e37, t, 0.0))

    dt, chk = timeit(lambda: float(nested(ro_j, rd_j)))
    print(f"nested jit: {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s  chk={chk:.4f}",
          flush=True)

    # full render_frame
    def run_frame():
        img, depth = raycast.render_frame(tree, cam, width, height)
        return float(jnp.sum(jnp.where(depth < 1e37, depth, 0.0)))

    dt, chk = timeit(run_frame)
    print(f"render_frame: {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s  chk={chk:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
