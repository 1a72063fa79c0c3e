"""On-chip A/B: hako (Pallas kernels) vs bricktree (XLA walk) on a real
scene + throughput timing. Run on the TPU."""

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
    grid_res = int(os.environ.get("RES", 256))
    width, height = 1920, 1088
    tri = meshgen.bumpy_sphere(5, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    tree = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="hako")
    tree_b = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="brick")
    print(f"hako: T={tree.T} bricks={tree.n_bricks} rows={tree.n_per_level}",
          flush=True)

    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    # A/B on a 128K hit-dense subset of frame rays
    n_ab = 1 << 17
    ws, hs = 512, 256
    idx = np.arange(ws * hs)
    px = (idx % ws + 0.5) / ws
    py = (idx // ws + 0.5) / hs
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * px) * (width / height)
    v = th - 2.0 * th * py
    rd = (u[:, None] * np.asarray(cam.right) + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)[:n_ab]
    ro = np.broadcast_to(np.asarray(cam.o, np.float32), rd.shape).copy()

    t1, m1, v1 = (np.asarray(x) for x in hk.intersect_hako(tree, ro, rd))
    from massivevoxelraytracing_tpu.ops import bricktree
    t2, m2, v2 = (np.asarray(x) for x in bricktree.intersect_bricktree(
        tree_b, jnp.asarray(ro), jnp.asarray(rd)))
    hit1 = t1 < 1e37
    hit2 = t2 < 1e37
    same = (hit1 == hit2) & (~hit1 | ((t1 == t2) & (v1 == v2) & (m1 == m2)))
    print(f"A/B: {same.sum()}/{len(same)} bit-exact, hit={hit1.mean():.2f}",
          flush=True)
    if not same.all():
        b = np.nonzero(~same)[0][:10]
        for i in b:
            print(f"  ray {i}: hako t={t1[i]:.7g} m={m1[i]} v={v1[i]} | "
                  f"brick t={t2[i]:.7g} m={m2[i]} v={v2[i]}", flush=True)

    # full-frame throughput
    def frame_sum():
        img, depth = raycast.render_frame(tree, cam, width, height)
        return float(jnp.sum(jnp.where(depth < 1e37, depth, 0.0)))

    frame_sum()
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        frame_sum()
    dt = (time.time() - t0) / iters
    print(f"frame: {dt*1e3:.1f} ms = {width*height/dt/1e6:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
