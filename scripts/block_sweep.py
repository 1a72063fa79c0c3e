"""Sweep traversal dispatch block size on the real chip with the real
bricktree traversal: is the round-1 4 Mrays/s cap from dispatch overhead
(fix: bigger blocks) or per-lane work (fix: kernel)?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from massivevoxelraytracing_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from massivevoxelraytracing_tpu.models import scene
from massivevoxelraytracing_tpu.ops import bricktree, camera as camera_ops
from massivevoxelraytracing_tpu.utils import meshgen

res = int(os.environ.get("SWEEP_RES", 256))
tri = meshgen.bumpy_sphere(4, radius=0.9)
origin, dps = meshgen.fit_grid(tri, res)
t0 = time.time()
tree = scene.build_scene(tri, origin=origin, dps=dps, grid_res=res, accel="brick")
print(f"build {time.time()-t0:.1f}s voxels={tree.n_voxels} nodes={tree.n_nodes} "
      f"levels={tree.n_levels}", flush=True)

w, h = 1920, 1088
lo = np.asarray(origin)
extent = float(dps) * res
center = lo + extent / 2
cam = camera_ops.Camera.look_at(
    eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9, target=center,
    fovy_deg=40.0,
)

# generate rays on host once
xs = (np.arange(w) + 0.5) / w
ys = (np.arange(h) + 0.5) / h
gx, gy = np.meshgrid(xs, ys)
fx = (-cam.tan_half_fovy + 2 * cam.tan_half_fovy * gx) * (w / h)
fy = cam.tan_half_fovy - 2 * cam.tan_half_fovy * gy
rd = (fx[..., None] * cam.right + fy[..., None] * cam.up + cam.front).reshape(-1, 3)
ro = np.broadcast_to(cam.o, rd.shape).copy()
R = rd.shape[0]
print(f"rays {R}")

ro_d = jnp.asarray(ro.astype(np.float32))
rd_d = jnp.asarray(rd.astype(np.float32))

for blk in [16384, 65536, 261120, 522240, 2088960]:
    if R % blk:
        continue
    try:
        t, nm, vi = bricktree.intersect_rays_brick(
            tree.meta, jnp.uint32(tree.root), tree.lower, tree.upper,
            ro_d, rd_d, n_levels=tree.n_levels, block=blk)
        jax.block_until_ready(t)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            t, nm, vi = bricktree.intersect_rays_brick(
                tree.meta, jnp.uint32(tree.root), tree.lower, tree.upper,
                ro_d, rd_d, n_levels=tree.n_levels, block=blk)
            jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / iters
        hit = float(jnp.mean((t < 1e37).astype(jnp.float32)))
        print(f"block {blk:>8}: {dt*1e3:8.1f} ms  {R/dt/1e6:8.2f} Mrays/s  hit={hit:.2f}",
              flush=True)
    except Exception as e:
        print(f"block {blk:>8}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
