"""PT step phase attribution (round 5, VERDICT item 1 'committed
phase-attribution log'): time the 16-spp step while varying max_bounces /
NEE (sky on-off) / compaction, at fixed megakernel knobs. The deltas
attribute the step's seconds to primary, per-bounce closest-hit, NEE
any-hit, and compaction overhead -- the megakernel is one fused kernel,
so knob-differencing is the only attribution instrument available.

Usage: RES=1024 W=960 H=540 U=64 python scripts/pt_phase_attrib.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402

from massivevoxelraytracing_tpu.models.pathtracer import PathTracer  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_mega as hm  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402


def sky_img():
    h, w = 64, 128
    ang = np.linspace(0, np.pi, h)[:, None]
    return np.stack([
        np.broadcast_to(0.6 + 0.4 * np.cos(ang), (h, w)),
        np.broadcast_to(0.7 + 0.3 * np.cos(ang), (h, w)),
        np.broadcast_to(0.9 + 0.1 * np.cos(ang), (h, w)),
    ], -1).astype(np.float32)


def main():
    res = int(os.environ.get("RES", 1024))
    W = int(os.environ.get("W", 960))
    H = int(os.environ.get("H", 540))
    u = int(os.environ.get("U", 64))
    steps = int(os.environ.get("STEPS", 2))
    # cont=0 above U=64: the cont tag_rank loop unrolls U times and fails
    # remote compile at U>=128 (docs/logs/r5_pt_sweep.log)
    hm.MEGA_TUNED_PT = {res: dict(uniq=u, cont=0 if u > 64 else 1)}

    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    cells = [
        ("b0", dict(max_bounces=0), True, None),
        ("b1", dict(max_bounces=1), True, None),
        ("b2", dict(max_bounces=2), True, None),
        ("b4", dict(max_bounces=4), True, None),
        ("b8", dict(max_bounces=8), True, None),
        ("b8_nosky", dict(max_bounces=8), False, None),   # no NEE rays
        ("b8_nocompact", dict(max_bounces=8), True, False),
    ]
    for name, kw, sky, compact in cells:
        pt = PathTracer(width=W, height=H, **kw)
        pt.compact = compact
        pt.setup()
        if sky:
            pt.load_hdri(sky_img())
        pt.update_scene(tree)
        try:
            t0 = time.time()
            pt.step(cam)
            jax.block_until_ready(pt.accum)
            first = time.time() - t0
            t0 = time.time()
            for _ in range(steps):
                pt.step(cam)
            jax.block_until_ready(pt.accum)
            dt = (time.time() - t0) / steps
            mean = float(np.asarray(pt.accum[:, :3]).mean())
            print(f"[pt-attrib res={res} {W}x{H} U={u}] {name}: "
                  f"{dt:.3f} s/step (first {first:.1f}s) mean={mean:.6f}",
                  flush=True)
        except Exception as e:
            print(f"[pt-attrib] {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
