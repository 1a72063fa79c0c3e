"""How duplicated are the brick ids inside one round's row gather?

The gather is row-count-priced (~24 ns/row in-loop) and dominates the round
(12.8 of 23.4 ms at 1024^3). Rays inside a 2048-lane block come from one
128x128 pixel tile, so in lockstep rounds many lanes want the SAME brick row.
If the per-block unique-id count is much smaller than the lane count, a
dedup-gather (sort ids per block -> gather unique rows -> in-kernel one-hot
MXU regather by rank) cuts the dominant phase by the duplication factor.

Runs the eager CPU round loop (identical structure to the TPU path) on a
bumpy-sphere scene and prints, per round: blocks picked, rows gathered today
(= lanes, or the packed prefix), emitting lanes, unique ids per block
(p50/p90/max), and the aggregate duplication factor.

  RES   grid resolution (default 256)
  W/H   frame (default 256x256)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402

from massivevoxelraytracing_tpu.models import raycast, scene  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402

RB = hako_kernels.RB


def main():
    grid_res = int(os.environ.get("RES", 256))
    width = int(os.environ.get("W", 256))
    height = int(os.environ.get("H", 256))

    tri = meshgen.bumpy_sphere(4, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    tree = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="hako"
    )
    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0,
    )

    hako_kernels.TRACE_GATHER = trace = []
    img, depth = raycast.render_frame(tree, cam, width, height)
    jax.block_until_ready(depth)
    hako_kernels.TRACE_GATHER = None
    hit = float(np.mean(np.asarray(depth) < 1e37))

    tot_rows = 0       # rows the current scheme gathers (incl. dead lanes)
    tot_emit = 0       # rows belonging to emitting lanes
    tot_uniq = 0       # rows a per-block dedup would gather
    uniq_counts = []
    for rnd, (ids, emit) in enumerate(trace):
        nblk = len(ids) // RB
        uos = []
        for b in range(nblk):
            sl = slice(b * RB, (b + 1) * RB)
            eb = emit[sl]
            ub = len(np.unique(ids[sl][eb])) if eb.any() else 0
            uos.append(ub)
            tot_uniq += ub
        tot_rows += len(ids)
        tot_emit += int(emit.sum())
        uniq_counts.extend(uos)
        if rnd < 12 or rnd % 16 == 0:
            u = np.asarray(uos)
            print(
                f"round {rnd:3d}: blocks={nblk:3d} rows={len(ids):7d} "
                f"emit={int(emit.sum()):7d} uniq/blk p50={np.median(u):6.0f} "
                f"p90={np.percentile(u, 90):6.0f} max={u.max():5d}",
                flush=True,
            )
    u = np.asarray(uniq_counts, np.float64)
    print(
        f"\n[dup] {width}x{height}@{grid_res}^3 hit={hit:.2f} "
        f"rounds={len(trace)} rows_gathered={tot_rows} "
        f"emitting={tot_emit} unique={tot_uniq}"
    )
    print(
        f"[dup] rows/unique = {tot_rows / max(tot_uniq, 1):.1f}x  "
        f"emit/unique = {tot_emit / max(tot_uniq, 1):.1f}x  "
        f"uniq/blk p50={np.median(u):.0f} p90={np.percentile(u, 90):.0f} "
        f"max={u.max():.0f}"
    )


if __name__ == "__main__":
    main()
