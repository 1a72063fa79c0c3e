"""Active-lane density inside picked blocks: is kernel-A lane packing live?

Rounds pick active BLOCKS (any unresolved lane), but kernel A runs every
lane of a picked block. If most lanes of picked blocks are already
resolved, an emit-first-style pre-sort (the PACK_DIV trick applied to
kernel A) would let A run on a dense prefix of cap/APACK blocks and cut
the 3.5 ms A phase by the inactive fraction. If density stays high, the
knob is dead weight -- measure before building.

Runs the eager CPU round loop (identical structure to the TPU path) and
prints, per round: blocks picked, active lanes, density; then the
aggregate A-lane-slots saved by hypothetical packing at /2 and /4.

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

    hako_kernels.TRACE_ACT = trace = []
    img, depth = raycast.render_frame(tree, cam, width, height)
    jax.block_until_ready(depth)
    hako_kernels.TRACE_ACT = None
    hit = float(np.mean(np.asarray(depth) < 1e37))

    tot_slots = 0     # lane slots kernel A runs today (picked blocks * RB)
    tot_act = 0       # lanes actually active
    tot_half = 0      # slots if A ran on a cap/2 packed prefix (deferral-free
    tot_quar = 0      # rounds only; over-budget lanes would defer like pack)
    for rnd, (nblk, act) in enumerate(trace):
        slots = nblk * RB
        a = int(act.sum())
        tot_slots += slots
        tot_act += a
        cap = act.size // RB  # padded round width in blocks
        tot_half += min(max(cap // 2, 1), nblk) * RB
        tot_quar += min(max(cap // 4, 1), nblk) * RB
        if rnd < 12 or rnd % 16 == 0:
            print(
                f"round {rnd:3d}: blocks={nblk:3d} act={a:7d} "
                f"density={a / max(slots, 1):.2f}",
                flush=True,
            )
    print(
        f"\n[act] {width}x{height}@{grid_res}^3 hit={hit:.2f} "
        f"rounds={len(trace)} A_lane_slots={tot_slots} active={tot_act} "
        f"density={tot_act / max(tot_slots, 1):.2f}"
    )
    print(
        f"[act] hypothetical packed A slots: /2={tot_half} "
        f"({tot_half / max(tot_slots, 1):.2f}x) /4={tot_quar} "
        f"({tot_quar / max(tot_slots, 1):.2f}x) "
        f"(lower bound: deferral adds rounds when act exceeds the prefix)"
    )


if __name__ == "__main__":
    main()
