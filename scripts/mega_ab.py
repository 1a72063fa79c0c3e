"""On-chip A/B: megakernel (ops/hako_mega.py) vs legacy round driver
(ops/hako_kernels.py) on the canonical lattice scene + bench camera.

Usage: python scripts/mega_ab.py [RES ...]  (default 256 1024)
Env: MEGA_U, MEGA_SBLK, MEGA_PROBES, MEGA_DDA override megakernel knobs;
     AB_SKIP_LEGACY=1 times only the megakernel;
     AB_W/AB_H frame size (default 1920x1080).

Exactness: compares full-frame (t, nmaj, vidx) between the two paths
(both Mosaic-compiled -- no interpret-mode FMA caveat) before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from massivevoxelraytracing_tpu.utils import runtime

runtime.setup()  # persistent .jax_cache -- megakernel compiles are minutes

import jax
import jax.numpy as jnp
import numpy as np

from massivevoxelraytracing_tpu.models import raycast
from massivevoxelraytracing_tpu.ops import camera as camera_ops
from massivevoxelraytracing_tpu.ops import hako_kernels as hk
from massivevoxelraytracing_tpu.ops import hako_mega as hm
from massivevoxelraytracing_tpu.utils import treecache


def bench_cam(tree, grid_res):
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * grid_res
    center = lo + extent / 2
    return camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center,
        fovy_deg=40.0,
    )


def main():
    reslist = [int(a) for a in sys.argv[1:]] or [256, 1024]
    W = int(os.environ.get("AB_W", 1920))
    H = int(os.environ.get("AB_H", 1080))
    iters = int(os.environ.get("AB_ITERS", 3))
    mega_kw = {}
    for env, kw in (("MEGA_U", "uniq"), ("MEGA_SBLK", "s_blk"),
                    ("MEGA_PROBES", "max_probes"), ("MEGA_DDA", "max_dda"),
                    ("MEGA_CONT", "cont")):
        if os.environ.get(env):
            mega_kw[kw] = int(os.environ[env])

    for res in reslist:
        tree = treecache.lattice_tree(res)
        cam = bench_cam(tree, res)
        cam_args = (
            jnp.asarray(cam.o), jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.asarray(cam.front), jnp.float32(cam.tan_half_fovy),
        )
        ro, rd = raycast._gen_rays_tiled(*cam_args, width=W, height=H)

        def run_mega():
            return hm.intersect_hako_mega(tree, ro, rd, **mega_kw)

        def run_legacy():
            return hk.intersect_hako(tree, ro, rd)

        def timed(fn, label):
            t, nm, vi = fn()
            s = float(jnp.sum(jnp.where(t < 1e37, t, 0.0)))  # drain queue
            t0 = time.time()
            for _ in range(iters):
                t, nm, vi = fn()
                s = float(jnp.sum(jnp.where(t < 1e37, t, 0.0)))
            dt = (time.time() - t0) / iters
            hitf = float(jnp.mean((t < 1e37).astype(jnp.float32)))
            print(f"[{res}^3] {label}: {dt*1e3:8.1f} ms "
                  f"{W*H/dt/1e6:7.2f} Mrays/s hit={hitf:.3f}", flush=True)
            return t, nm, vi

        tm, nmm, vim = timed(run_mega, f"mega {mega_kw or 'default'}")
        if os.environ.get("AB_SKIP_LEGACY"):
            continue
        tl, nml, vil = timed(run_legacy, "legacy")
        same_t = bool(jnp.all(tm == tl))
        same_d = bool(jnp.all((nmm == nml) & (vim == vil)
                              | (tl >= 1e37)))
        print(f"[{res}^3] exact: t={same_t} nmaj/vidx={same_d}", flush=True)


if __name__ == "__main__":
    main()
