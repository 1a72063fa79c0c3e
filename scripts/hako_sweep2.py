"""Frame-level sweep of hako traversal knobs on the TPU: S_BLK (sublane
rows per block), cap_blocks, MAX_PROBES, MAX_DDA_ITERS. Pipelined timing
(queue iters, sync once). SWEEP env: 'sblk,P,D,cb;...'"""

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

    combos = []
    for spec in os.environ.get(
        "SWEEP", "16,2,12,0;32,2,12,0;64,2,12,0;32,2,12,128;32,3,24,128",
    ).split(";"):
        sblk, p, d, cb = (int(x) for x in spec.split(","))
        combos.append((sblk, p, d, cb))

    ref = None
    for sblk, p, d, cb in combos:
        hk.S_BLK = sblk
        hk.RB = sblk * 128
        hk.MAX_PROBES = p
        hk.MAX_DDA_ITERS = d
        jax.clear_caches()

        def run():
            t, nm, vi = hk.intersect_rays_hako(
                bricks, snodes, tabs, scal_i, tree.lower, tree.upper, ro_j, rd_j,
                T=T, level_rows=level_rows, shadow=False,
                cap_blocks=cb if cb else None)
            return jnp.sum(jnp.where(t < 1e37, t, 0.0))

        try:
            chk = float(run())
            iters = 8
            t0 = time.time()
            outs = [run() for _ in range(iters)]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / iters
            ok = "?" if ref is None else (
                "OK" if abs(chk - ref) < 1e-3 * abs(ref) else
                f"MISMATCH {chk} vs {ref}")
            if ref is None:
                ref = chk
            print(f"S={sblk:3d} P={p} D={d:2d} cb={cb:4d}: {dt*1e3:7.1f} ms  "
                  f"{n/dt/1e6:6.1f} Mrays/s  {ok}", flush=True)
        except Exception as e:
            print(f"S={sblk} P={p} D={d} cb={cb}: FAIL {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
