"""Megakernel PT knob sweep (round 5): time the PathTracer 16-spp step
on the canonical lattice while sweeping the megakernel's knob space
(MEGA_TUNED_PT entries), in ONE process against one tree/PathTracer.

The knobs ride accel_args' static tuple (models/accel.py), so each combo
gets its own jit entry -- populating hako_mega.MEGA_TUNED_PT per combo is
the in-process-safe override path (mutating hm.MEGA_U would be read only
at first trace). Radiance must be BIT-IDENTICAL across combos (per-lane
results are independent of round scheduling, ops/hako_mega.py docstring);
a drifting mean is a correctness bug and the combo is flagged.

Usage:
  RES=1024 W=960 H=540 SPP=16 STEPS=2 \
  COMBOS="32:8:4:24,64:8:4:24,128:4:4:24" python scripts/mega_pt_sweep.py

COMBOS entries are u:s_blk:probes:dda[:cont]; default sweeps a one-factor
ladder around the r4 defaults U=32 S=8 P=4 D=24 cont=1.
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

from massivevoxelraytracing_tpu.models.pathtracer import PathTracer  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_mega as hm  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402

DEFAULT_COMBOS = (
    "32:8:4:24,"      # r4 default
    "64:8:4:24,128:8:4:24,"   # U up (PT wavefronts overflow U=32)
    "64:4:4:24,128:4:4:24,"   # smaller blocks + U up
    "32:8:2:24,32:8:8:24,"    # probe cap
    "32:8:4:12,32:8:4:48"     # DDA cap
)


def main():
    res = int(os.environ.get("RES", 1024))
    W = int(os.environ.get("W", 960))
    H = int(os.environ.get("H", 540))
    spp = int(os.environ.get("SPP", 16))
    steps = int(os.environ.get("STEPS", 2))
    combos = os.environ.get("COMBOS", DEFAULT_COMBOS)

    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    pt = PathTracer(width=W, height=H, n_batch_spp=spp)
    if "COMPACT" in os.environ:  # A/B the inter-bounce compaction on-chip
        pt.compact = bool(int(os.environ["COMPACT"]))
    if "TILE" in os.environ:  # A/B the 32x32 tile pixel order
        pt.tile_packets = bool(int(os.environ["TILE"]))
    if "SPPM" in os.environ:  # A/B the spp-major block layout
        pt.spp_major = bool(int(os.environ["SPPM"]))
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

    ref_mean = None
    for spec in combos.split(","):
        parts = [int(x) for x in spec.strip().split(":")]
        u, s_blk, probes, dda = parts[:4]
        cont = parts[4] if len(parts) > 4 else 1
        hm.MEGA_TUNED_PT = {res: dict(
            uniq=u, s_blk=s_blk, max_probes=probes, max_dda=dda, cont=cont,
        )}
        try:
            pt.clear_frame_buffer()
            t0 = time.time()
            pt.step(cam)
            jax.block_until_ready(pt.accum)
            t_first = time.time() - t0
            t0 = time.time()
            for _ in range(steps):
                pt.step(cam)
            jax.block_until_ready(pt.accum)
            dt = (time.time() - t0) / steps
            mean = float(jnp.mean(pt.accum[:, :3] / pt.accum[:, 3:4]))
            tag = ""
            if ref_mean is None:
                ref_mean = mean
            elif mean != ref_mean:
                tag = f"  MEAN DRIFT vs {ref_mean:.9e} -- INVALID"
            print(f"[pt-mega res={res} {W}x{H} {spp}spp] "
                  f"U={u} S={s_blk} P={probes} D={dda} cont={cont}: "
                  f"{dt:.3f} s/step (first {t_first:.1f}s) "
                  f"mean={mean:.9e}{tag}", flush=True)
        except Exception as e:
            print(f"combo {spec} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
