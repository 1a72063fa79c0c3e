"""Frame-time probe of the ray-block height S_BLK (default 16 sublane
rows = 2048-lane blocks). The block-cap ladder retires work at BLOCK
granularity; act_stats measured most rounds run lanes at 1-36% density,
so finer blocks (S_BLK=8 -> 128x8-pixel strips) retire dead work ~2x
sooner at the same kernel cost per lane, IF the Mosaic kernels hold
their per-lane rate at the smaller tile (the 2026-08 construct sweep
says they do down to S_BLK=4).

One process per S_BLK value (the jitted driver's cache does not key on
it): SBLK=8 RES=1024 python scripts/sblk_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from massivevoxelraytracing_tpu.models import raycast  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402


def main():
    sblk = int(os.environ.get("SBLK", hk.S_BLK))
    hk.S_BLK = sblk
    hk.RB = sblk * 128
    grid_res = int(os.environ.get("RES", 1024))
    knobs = hk.knobs_for_res(grid_res)
    tree = treecache.lattice_tree(grid_res)
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta

    lo = np.asarray(tree.lower)
    hi = np.asarray(tree.upper)
    center = (lo + hi) / 2
    extent = float((hi - lo).max())
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)
    width, height = 1920, 1088
    order_pad, _ = raycast._cached_order(width, height, raycast.MAX_RAY_PACKET)
    idx = np.asarray(order_pad)
    live = idx >= 0
    safe = np.maximum(idx, 0)
    px = (safe % width).astype(np.float32)
    py = (safe // width).astype(np.float32)
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * (px + 0.5) / width) * (width / height)
    v = th - 2.0 * th * (py + 0.5) / height
    rd = (u[:, None] * np.asarray(cam.right)
          + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)
    ro = np.where(live[:, None], np.asarray(cam.o)[None, :], 1e9).astype(
        np.float32)
    R = len(ro)

    kw = dict(knobs)
    kw.pop("vac_pick", None)
    kw.pop("vac_run", None)
    # force the cell under test: knobs_for_res may carry a TUNED s_blk
    # kwarg that would silently override the hk.S_BLK patch above and
    # measure the tuned height in every cell (ADVICE r3)
    kw["s_blk"] = sblk
    if os.environ.get("FUSEB"):
        kw["fuse_book"] = int(os.environ["FUSEB"])

    # upload ONCE: 2x 25 MB host->device per frame costs ~800 ms on the
    # tunnel and buried the first runs of this probe (2026-08-19)
    ro_d = jnp.asarray(ro)
    rd_d = jnp.asarray(rd)

    def frame():
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            ro_d, rd_d,
            T=T, level_rows=level_rows, shadow=False, **kw)
        return (float(jnp.sum(jnp.where(t < 1e37, t, 0.0))),
                int(jnp.sum((t < 1e37).astype(jnp.int32))))

    cs, hits = frame()  # compile + warm
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        cs, hits = frame()
    dt = (time.perf_counter() - t0) / iters
    print(f"SBLK={sblk} RES={grid_res} knobs={kw}: {dt*1e3:7.1f} ms = "
          f"{R/dt/1e6:4.1f} Mrays/s checksum={cs:.2f} hits={hits}",
          flush=True)


if __name__ == "__main__":
    main()
