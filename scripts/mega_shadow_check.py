"""On-chip self-check of the megakernel's shadow (any-hit) variant: the
occlusion mask of shadow=True must equal the hit mask of the closest-hit
variant on the same rays (any-hit changes WHICH leaf retires a lane, never
WHETHER one exists). Catches Mosaic-lowering drift the CPU interpret
equivalence tests cannot see.

Usage: python scripts/mega_shadow_check.py [RES] [W] [H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from massivevoxelraytracing_tpu.utils import runtime

runtime.setup()

import jax.numpy as jnp
import numpy as np

from massivevoxelraytracing_tpu.models import raycast
from massivevoxelraytracing_tpu.ops import camera as camera_ops
from massivevoxelraytracing_tpu.ops import hako_mega as hm
from massivevoxelraytracing_tpu.utils import treecache


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0,
    )
    ro, rd = raycast._gen_rays_tiled(
        jnp.asarray(cam.o), jnp.asarray(cam.right), jnp.asarray(cam.up),
        jnp.asarray(cam.front), jnp.float32(cam.tan_half_fovy),
        width=W, height=H,
    )
    t_c, _, _ = hm.intersect_hako_mega(tree, ro, rd, shadow=False)
    t_s, _, _ = hm.intersect_hako_mega(tree, ro, rd, shadow=True)
    hc = np.asarray(t_c) < 1e37
    hs = np.asarray(t_s) < 1e37
    n_bad = int((hc != hs).sum())
    print(f"[shadow-check] res={res} rays={hc.size} hit_closest="
          f"{hc.mean():.4f} hit_shadow={hs.mean():.4f} mismatches={n_bad}",
          flush=True)
    if n_bad:
        idx = np.nonzero(hc != hs)[0][:8]
        for i in idx:
            print(f"  lane {i}: closest t={np.asarray(t_c)[i]:.6g} "
                  f"shadow t={np.asarray(t_s)[i]:.6g}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
