"""Sweep the round-width knobs (CAP_DIV full rung; tail rungs halve
geometrically) on the production render_frame path.

Single-combo mode: env CAPD/PACKD/UNIQ/TWOB/P/D/VACP/VACR/RES.
In-process multi-combo mode:
COMBOS="capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]],..."
runs every combo in ONE process against one tree load -- safe since the
resolved knobs ride the accel static tuple into every jit cache key
(models/accel.py accel_args)."""

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


def tree_cache(grid_res):
    """Build-once cache of the shared dragon-occupancy lattice tree
    (utils/treecache -- the same cache bench.py loads, so swept knob
    winners transfer to the headline measurement exactly)."""
    from massivevoxelraytracing_tpu.utils import treecache

    return treecache.lattice_tree(grid_res)


def run_combo(tree, cam, grid_res, width, height):
    def frame_sum():
        img, depth = raycast.render_frame(tree, cam, width, height)
        fin = depth < 1e37
        return (float(jnp.sum(jnp.where(fin, depth, 0.0))),
                int(jnp.sum(fin.astype(jnp.int32))))

    csum, nhit = frame_sum()
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        frame_sum()
    dt = (time.time() - t0) / iters
    print(f"RES={grid_res} CAPD={hk.CAP_DIV} PACKD={hk.PACK_DIV} "
          f"P={hk.MAX_PROBES} D={hk.MAX_DDA_ITERS} UNIQ={hk.UNIQ} "
          f"TWOB={hk.TWO_BRICK} VACP={hk.VAC_PICK} VACR={hk.VAC_RUN} "
          f"SBLK={hk.SBLK} FUSEB={hk.FUSE_BOOK}: "
          f"{dt*1e3:.1f} ms = {width*height/dt/1e6:.1f} Mrays/s "
          f"checksum={csum:.2f} hits={nhit}", flush=True)


def main():
    # Sweeps must measure EXACTLY the requested knobs: clear the tuned
    # table for this process, else knobs_for_res would silently override
    # any requested value that happens to equal the factory default once
    # pick_knobs --apply has written sweep winners into it.
    hk.TUNED_BY_RES = {}
    hk.SCAN_IMPL = os.environ.get("SCANI", hk.SCAN_IMPL)
    hk.CAP_DIV = int(os.environ.get("CAPD", hk.CAP_DIV))
    hk.PACK_DIV = int(os.environ.get("PACKD", hk.PACK_DIV))
    hk.MAX_PROBES = int(os.environ.get("P", hk.MAX_PROBES))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", hk.MAX_DDA_ITERS))
    hk.UNIQ = int(os.environ.get("UNIQ", hk.UNIQ))
    hk.TWO_BRICK = int(os.environ.get("TWOB", hk.TWO_BRICK))
    hk.VAC_PICK = int(os.environ.get("VACP", hk.VAC_PICK))
    hk.VAC_RUN = int(os.environ.get("VACR", hk.VAC_RUN))
    hk.FUSE_BOOK = int(os.environ.get("FUSEB", hk.FUSE_BOOK))
    hk.SBLK = int(os.environ.get("SBLK", hk.SBLK))  # knob attr, not S_BLK:
    # rides knobs_for_res -> the s_blk static arg (jit-cache-safe in-process)
    grid_res = int(os.environ.get("RES", 256))
    width, height = 1920, 1088
    tree = tree_cache(grid_res)
    origin, dps = np.asarray(tree.lower), tree.dps
    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    combos = os.environ.get("COMBOS")
    if not combos:
        run_combo(tree, cam, grid_res, width, height)
        return
    defaults = (hk.CAP_DIV, hk.PACK_DIV, hk.UNIQ, hk.TWO_BRICK,
                hk.MAX_PROBES, hk.MAX_DDA_ITERS, hk.VAC_PICK, hk.VAC_RUN)
    for spec in combos.split(","):
        parts = [int(x) for x in spec.strip().split(":")]
        parts += list(defaults[len(parts):])
        (hk.CAP_DIV, hk.PACK_DIV, hk.UNIQ, hk.TWO_BRICK,
         hk.MAX_PROBES, hk.MAX_DDA_ITERS, hk.VAC_PICK,
         hk.VAC_RUN) = parts[:8]
        try:
            run_combo(tree, cam, grid_res, width, height)
        except Exception as e:
            print(f"combo {spec} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
