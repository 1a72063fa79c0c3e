"""Voxelize a mesh and export the voxels as a PLY (the voxMesh app,
voxMesh.cpp:221-410), with hidden-face culling via sorted-Morton neighbor
lookup (voxMesh.cpp:143-148).

Usage:
  python -m massivevoxelraytracing_tpu.apps.voxmesh --scene sphere --res 64 \
      --out out/voxels.ply
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils import runtime

runtime.setup()

import jax.numpy as jnp  # noqa: E402

from ..ops import morton, octree as octree_ops, voxelize as vox_ops  # noqa: E402
from ..utils import meshgen, meshprep, objio  # noqa: E402
from .scenes import load_scene  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sphere")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--six-separating", type=int, default=1)
    ap.add_argument("--no-cull", action="store_true")
    ap.add_argument("--out", default="out/voxels.ply")
    args = ap.parse_args(argv)

    tri, col, emi = load_scene(args.scene)
    origin, dps = meshgen.fit_grid(tri, args.res)

    cap = 4
    tri, col, emi = meshprep.split_to_cap(
        tri, col, emi, origin, dps, args.res, cap
    )
    tri, col, emi = meshprep.pad_triangles(tri, col, emi, 1024)
    cands = vox_ops.voxelize_dense(
        jnp.asarray(tri), jnp.asarray(col), jnp.asarray(emi),
        jnp.asarray(origin, jnp.float32), float(dps),
        grid_res=args.res, six_separating=bool(args.six_separating), cap=cap,
    )
    uniq = vox_ops.sort_and_unique(cands)
    n = int(uniq["n_unique"])
    m64 = morton.np_unpack_pair(
        np.asarray(uniq["m_hi"])[:n], np.asarray(uniq["m_lo"])[:n]
    )
    x, y, z = morton.np_decode(m64)
    xyz = np.stack([x, y, z], -1)
    colors = np.asarray(uniq["color"])[:n]
    rgb = (
        np.stack([colors & 0xFF, (colors >> 8) & 0xFF, (colors >> 16) & 0xFF], -1)
        / 255.0
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    objio.save_voxels_ply(
        args.out, xyz, float(dps), origin, colors=rgb,
        cull_hidden=not args.no_cull, mortons_sorted=m64,
    )
    print(f"[voxmesh] res({args.res}) voxels({n}) -> {args.out}")


if __name__ == "__main__":
    main()
