"""PT 16-spp step timing. Single-combo mode: env knobs CAPD/PACKD/UNIQ/
TWOB/P/D/VACP/VACR pick the traversal knobs; default scene is the round-2
bumpy sphere at 640x360 (the historical 0.998 s/step point).

Multi-combo mode (COMBOS="capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]],...")
runs every combo in ONE process against one tree/PathTracer, clearing the
tuned tables first so each combo measures EXACTLY its knobs (same contract
as scripts/cap_sweep.py). The accumulator resets per combo so the printed
mean is bit-comparable: knob changes are bit-exact by design and a
drifting mean is a correctness bug pick_knobs --apply-pt rejects on.

SCENE=lattice uses the shared treecache lattice (the bench scene) instead
of the bumpy sphere; W/H override the frame size.
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

from massivevoxelraytracing_tpu.models import scene  # noqa: E402
from massivevoxelraytracing_tpu.models.pathtracer import PathTracer  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402


def measure(pt, cam, accel, grid_res, scene_kind, width, height):
    pt.clear_frame_buffer()
    t0 = time.time()
    pt.step(cam)
    jax.block_until_ready(pt.accum)
    t_compile = time.time() - t0

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        pt.step(cam)
    jax.block_until_ready(pt.accum)
    dt = (time.time() - t0) / iters
    mean_rad = float(jnp.mean(pt.accum[:, :3]))
    # resolved knobs echoed in arg=value form so pick_knobs --apply-pt can
    # parse the winner. FULL effective set (factory defaults filled in):
    # the PT table is an overlay on TUNED_BY_RES, so a partial winner dict
    # would inherit base-table knobs the measurement never ran with.
    knobs = {
        arg: hk._FACTORY[k] for k, arg in hk._KNOB_TO_ARG.items()
    }
    knobs.update(hk.knobs_for_res(grid_res, profile="pt"))
    kstr = " ".join(f"{k}={v}" for k, v in sorted(knobs.items()))
    scene_tok = f" scene={scene_kind}" if scene_kind != "bumpy" else ""
    print(f"[pt] accel={accel} res={grid_res}{scene_tok} "
          f"{width}x{height} 16spp: "
          f"{dt:.3f} s/step (first {t_compile:.1f}s) mean={mean_rad:.9e} "
          f"knobs[{kstr}]",
          flush=True)


def main():
    accel = os.environ.get("ACCEL", "hako")
    grid_res = int(os.environ.get("RES", 256))
    scene_kind = os.environ.get("SCENE", "bumpy")
    hk.MAX_PROBES = int(os.environ.get("P", hk.MAX_PROBES))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", hk.MAX_DDA_ITERS))
    hk.CAP_DIV = int(os.environ.get("CAPD", hk.CAP_DIV))
    hk.PACK_DIV = int(os.environ.get("PACKD", hk.PACK_DIV))
    hk.UNIQ = int(os.environ.get("UNIQ", hk.UNIQ))
    hk.TWO_BRICK = int(os.environ.get("TWOB", hk.TWO_BRICK))
    hk.VAC_PICK = int(os.environ.get("VACP", hk.VAC_PICK))
    hk.VAC_RUN = int(os.environ.get("VACR", hk.VAC_RUN))
    width = int(os.environ.get("W", 640))
    height = int(os.environ.get("H", 360))

    if scene_kind == "lattice":
        from massivevoxelraytracing_tpu.utils import treecache

        tree = treecache.lattice_tree(grid_res)
        origin, dps = np.asarray(tree.lower), tree.dps
    else:
        tri = meshgen.bumpy_sphere(5, radius=0.9)
        origin, dps = meshgen.fit_grid(tri, grid_res)
        tree = scene.build_scene(
            tri, origin=origin, dps=dps, grid_res=grid_res, accel=accel)
    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    pt = PathTracer(width=width, height=height)
    pt.setup()
    # procedural sky so NEE shadow rays are real work
    h, w = 64, 128
    ang = np.linspace(0, np.pi, h)[:, None]
    sky = np.stack([
        np.broadcast_to(0.6 + 0.4 * np.cos(ang), (h, w)),
        np.broadcast_to(0.7 + 0.3 * np.cos(ang), (h, w)),
        np.broadcast_to(0.9 + 0.1 * np.cos(ang), (h, w)),
    ], -1).astype(np.float32)
    pt.load_hdri(sky)
    pt.update_scene(tree)

    combos = os.environ.get("COMBOS")
    if not combos:
        measure(pt, cam, accel, grid_res, scene_kind, width, height)
        return
    # multi-combo: measure EXACTLY the requested knobs (cap_sweep contract)
    hk.TUNED_BY_RES = {}
    hk.TUNED_PT_BY_RES = {}
    defaults = (hk.CAP_DIV, hk.PACK_DIV, hk.UNIQ, hk.TWO_BRICK,
                hk.MAX_PROBES, hk.MAX_DDA_ITERS, hk.VAC_PICK, hk.VAC_RUN)
    for spec in combos.split(","):
        parts = [int(x) for x in spec.strip().split(":")]
        parts += list(defaults[len(parts):])
        (hk.CAP_DIV, hk.PACK_DIV, hk.UNIQ, hk.TWO_BRICK,
         hk.MAX_PROBES, hk.MAX_DDA_ITERS, hk.VAC_PICK,
         hk.VAC_RUN) = parts[:8]
        try:
            measure(pt, cam, accel, grid_res, scene_kind, width, height)
        except Exception as e:
            print(f"pt combo {spec} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
