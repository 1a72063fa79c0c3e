"""Root-cause bisect for the legacy round driver's on-chip PT
zero-radiance fault (round-4 finding, docs/STATUS.md): run ONE 16-spp PT
step per knob combo through the LEGACY driver (MVRT_MEGA=0) and compare
the per-pixel accumulation against the megakernel truth computed first in
the same process. Every traversal knob is bit-exactness-tested on CPU, so
ANY drift isolates the on-chip fault to the knob (round machinery rung)
that introduced it.

The combos walk the round machinery up one rung at a time from the
simplest shape (full-width rounds, no packing/dedup/vacuum/fuse):
pack -> uniq -> vacuum -> fuse -> two_brick, plus the exact knob sets the
broken r2 (256^3) and r3 (1024^3-nearest) PT runs used.

Usage: RES=256 W=320 H=180 python scripts/legacy_pt_bisect.py
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
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402

# one rung at a time (keys are TUNED-table knob names)
COMBOS = [
    ("simplest", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=0, TWO_BRICK=0,
                      VAC_PICK=0, FUSE_BOOK=0, SBLK=16)),
    ("pack2", dict(CAP_DIV=8, PACK_DIV=2, UNIQ=0, TWO_BRICK=0,
                   VAC_PICK=0, FUSE_BOOK=0, SBLK=16)),
    ("uniq32", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=32, TWO_BRICK=0,
                    VAC_PICK=0, FUSE_BOOK=0, SBLK=16)),
    ("vac64", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=0, TWO_BRICK=0,
                   VAC_PICK=64, VAC_RUN=2, FUSE_BOOK=0, SBLK=16)),
    ("fuse", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=32, TWO_BRICK=0,
                  VAC_PICK=0, FUSE_BOOK=1, SBLK=16)),
    ("twob", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=0, TWO_BRICK=1,
                  VAC_PICK=0, FUSE_BOOK=0, SBLK=16)),
    # the r2-swept 256^3 PT combo that produced the broken 0.998 s/step
    ("r2_pt", dict(CAP_DIV=8, PACK_DIV=2, UNIQ=0, TWO_BRICK=0,
                   VAC_PICK=64, VAC_RUN=2, FUSE_BOOK=0, SBLK=16)),
    # the r3 1024^3 base combo (fuse_book + uniq + two_brick)
    ("r3_1024", dict(CAP_DIV=8, PACK_DIV=1, UNIQ=64, TWO_BRICK=1,
                     VAC_PICK=0, FUSE_BOOK=1, SBLK=8)),
]


def one_step(pt, cam):
    pt.clear_frame_buffer()
    t0 = time.time()
    pt.step(cam)
    jax.block_until_ready(pt.accum)
    return np.asarray(pt.accum[:, :3]), time.time() - t0


def main():
    res = int(os.environ.get("RES", 256))
    W = int(os.environ.get("W", 320))
    H = int(os.environ.get("H", 180))

    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)
    pt = PathTracer(width=W, height=H)
    pt.setup()
    h, w = 64, 128
    ang = np.linspace(0, np.pi, h)[:, None]
    sky = np.stack([
        np.broadcast_to(0.6 + 0.4 * np.cos(ang), (h, w)),
        np.broadcast_to(0.7 + 0.3 * np.cos(ang), (h, w)),
        np.broadcast_to(0.9 + 0.1 * np.cos(ang), (h, w)),
    ], -1).astype(np.float32)
    pt.load_hdri(sky)
    pt.update_scene(tree)

    os.environ["MVRT_MEGA"] = "1"
    truth, dt = one_step(pt, cam)
    print(f"[bisect res={res} {W}x{H}] mega truth: mean={truth.mean():.6f} "
          f"({dt:.1f}s)", flush=True)

    os.environ["MVRT_MEGA"] = "0"
    hk.TUNED_BY_RES = {}
    for name, knobs in COMBOS:
        hk.TUNED_PT_BY_RES = {res: knobs}
        try:
            acc, dt = one_step(pt, cam)
        except Exception as e:
            print(f"[bisect] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        exact = bool((acc == truth).all())
        close = bool(np.allclose(acc, truth, rtol=1e-5, atol=1e-6))
        # the r4 fault signature: geometry pixels at exactly zero
        geo = truth.sum(1) > 0  # pixels with any radiance in truth
        zero_geo = float((acc.sum(1)[geo] == 0.0).mean()) if geo.any() else 0.0
        print(f"[bisect] {name}: mean={acc.mean():.6f} exact={exact} "
              f"close={close} zero_geo_frac={zero_geo:.4f} ({dt:.1f}s) "
              f"knobs={knobs}", flush=True)


if __name__ == "__main__":
    main()
