"""Megakernel PRIMARY knob sweep (round 5, VERDICT item 2): full-frame
traversal time on the canonical lattice + bench camera across the
megakernel's knob space, one process, bit-exactness asserted against the
first combo (per-lane results are independent of round scheduling).

Usage:
  RES=1024 W=1920 H=1080 ITERS=3 \
  COMBOS="32:8:4:24,16:8:4:24,..." python scripts/mega_sweep.py
COMBOS entries are u:s_blk:probes:dda[:cont].
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
from massivevoxelraytracing_tpu.ops import hako_mega as hm  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402

# VERDICT r4 item 2 cells: DDA={12,24,48}, SBLK={4,8,16}, PROBES={2,4,8},
# U={16,32,64} around the r4 default 32:8:4:24
DEFAULT_COMBOS = (
    "32:8:4:24,"
    "16:8:4:24,64:8:4:24,"
    "32:4:4:24,32:16:4:24,"
    "32:8:2:24,32:8:8:24,"
    "32:8:4:12,32:8:4:48"
)


def main():
    res = int(os.environ.get("RES", 1024))
    W = int(os.environ.get("W", 1920))
    H = int(os.environ.get("H", 1080))
    iters = int(os.environ.get("ITERS", 3))
    shadow = bool(int(os.environ.get("SHADOW", "0")))
    combos = os.environ.get("COMBOS", DEFAULT_COMBOS)

    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)
    cam_args = (
        jnp.asarray(cam.o), jnp.asarray(cam.right), jnp.asarray(cam.up),
        jnp.asarray(cam.front), jnp.float32(cam.tan_half_fovy),
    )
    ro, rd = raycast._gen_rays_tiled(*cam_args, width=W, height=H)

    ref = None
    for spec in combos.split(","):
        parts = [int(x) for x in spec.strip().split(":")]
        u, s_blk, probes, dda = parts[:4]
        cont = parts[4] if len(parts) > 4 else 1
        kw = dict(uniq=u, s_blk=s_blk, max_probes=probes, max_dda=dda,
                  cont=cont)
        try:
            t, nm, vi = hm.intersect_hako_mega(tree, ro, rd,
                                               shadow=shadow, **kw)
            jax.block_until_ready(t)
            t0 = time.time()
            for _ in range(iters):
                t, nm, vi = hm.intersect_hako_mega(tree, ro, rd,
                                                   shadow=shadow, **kw)
                jax.block_until_ready(t)
            dt = (time.time() - t0) / iters
            hitf = float(jnp.mean((t < 1e37).astype(jnp.float32)))
            tag = ""
            if ref is None:
                ref = (t, nm, vi)
            else:
                ok = bool(jnp.all(ref[0] == t)) and bool(jnp.all(
                    ((ref[1] == nm) & (ref[2] == vi)) | (ref[0] >= 1e37)))
                if not ok:
                    tag = "  MISMATCH vs first combo -- INVALID"
            print(f"[mega res={res} {W}x{H}{' shadow' if shadow else ''}] "
                  f"U={u} S={s_blk} P={probes} D={dda} cont={cont}: "
                  f"{dt*1e3:8.1f} ms {W*H/dt/1e6:7.2f} Mrays/s "
                  f"hit={hitf:.3f}{tag}", flush=True)
        except Exception as e:
            print(f"combo {spec} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
