"""PT 16-spp step timing at 640x360 @256^3 (the VERDICT round-2 target:
under 3 s, from round-1's 18.3-20.6 s). ACCEL env picks the structure."""

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


def main():
    accel = os.environ.get("ACCEL", "hako")
    grid_res = int(os.environ.get("RES", 256))
    hk.MAX_PROBES = int(os.environ.get("P", hk.MAX_PROBES))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", hk.MAX_DDA_ITERS))
    hk.CAP_DIV = int(os.environ.get("CAPD", hk.CAP_DIV))
    hk.PACK_DIV = int(os.environ.get("PACKD", hk.PACK_DIV))
    hk.UNIQ = int(os.environ.get("UNIQ", hk.UNIQ))
    hk.TWO_BRICK = int(os.environ.get("TWOB", hk.TWO_BRICK))
    hk.VAC_PICK = int(os.environ.get("VACP", hk.VAC_PICK))
    hk.VAC_RUN = int(os.environ.get("VACR", hk.VAC_RUN))
    width, height = 640, 360

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
    # parse the winner (env overrides land here because they move the
    # module attrs off factory). mean at full precision: combos must agree
    # bit-exactly -- a drifting mean is a correctness bug, not tuning.
    # FULL effective set (factory defaults filled in): the PT table is an
    # overlay on TUNED_BY_RES, so a partial winner dict would inherit base
    # -table knobs the measurement never ran with
    knobs = {
        arg: hk._FACTORY[k] for k, arg in hk._KNOB_TO_ARG.items()
    }
    knobs.update(hk.knobs_for_res(grid_res, profile="pt"))
    kstr = " ".join(f"{k}={v}" for k, v in sorted(knobs.items()))
    print(f"[pt] accel={accel} res={grid_res} {width}x{height} 16spp: "
          f"{dt:.3f} s/step (first {t_compile:.1f}s) mean={mean_rad:.9e} "
          f"knobs[{kstr}]",
          flush=True)


if __name__ == "__main__":
    main()
