"""HakoTree disk cache for the shared benchmark scene.

The reference's headline numbers are all measured on one scene (the 55M-voxel
dragon at 2048^3, seminar_ushio.pdf slide 66); our equivalent is the
dragon-occupancy sphere lattice (utils/meshgen.sphere_lattice -- 54.4M unique
voxels at 2048^3, scaling ~(res/2048)^2 like a surface). A 2048^3 build costs
~10 min on the tunneled chip, so bench.py and the knob sweeps share one
build-once npz cache per resolution instead of each paying it.

Writes are atomic (tmp + os.replace): the sweep may start loading while a
background pre-build is still writing.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

# bump when the cached scene or the HakoTree layout changes incompatibly
SCENE_TAG = "lat64"


def cache_path(grid_res: int, cache_dir: str = "/tmp") -> str:
    from ..ops import hako

    # the snode threshold (MVRT_SNODES_ABOVE / USE_SNODES_ABOVE) changes
    # the tree layout: key the cache on this resolution's ACTUAL layout.
    # Suffix only when it differs from the historical >1024 default (so
    # existing cache files keep their names), and encode WHICH layout it
    # is (ADVICE r4: a bare "_fat" also named non-fat trees cached under
    # a high threshold override, e.g. MVRT_SNODES_ABOVE=4096 at 2048^3)
    snody = hako.use_snodes_for(grid_res)
    if snody == (grid_res > 1024):
        suffix = ""
    else:
        suffix = "_fat" if snody else "_nofat"
    return os.path.join(
        cache_dir, f"hako_tree_{SCENE_TAG}_{grid_res}{suffix}.npz"
    )


def save_hako(tree, path: str) -> None:
    arrs = dict(
        bricks=np.asarray(tree.bricks), n_bricks=tree.n_bricks,
        n_lv=len(tree.levels),
        n_per_level=np.asarray(tree.n_per_level, np.int64),
        root_mask_lo=tree.root_mask_lo, root_mask_hi=tree.root_mask_hi,
        T=tree.T, res=tree.res, grid_res=tree.grid_res,
        lower=np.asarray(tree.lower), upper=np.asarray(tree.upper),
        dps=tree.dps, n_snodes=tree.n_snodes, n_voxels=tree.n_voxels,
    )
    for i, lv in enumerate(tree.levels):
        arrs[f"lv{i}"] = np.asarray(lv)
    if tree.snodes is not None:
        arrs["snodes"] = np.asarray(tree.snodes)
    # voxel attributes (round-5 fix: PT steps on cached trees previously
    # ran with color=None -> black albedo, so their radiance measured
    # primary sky only; traversal timings were unaffected)
    if tree.color is not None:
        arrs["color"] = np.asarray(tree.color)
    if tree.emission is not None:
        arrs["emission"] = np.asarray(tree.emission)
    arrs["has_emission"] = bool(tree.has_emission)
    # tmp must keep the .npz suffix (np.savez appends it otherwise)
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez(tmp, **arrs)
    os.replace(tmp, path)


def load_hako(path: str):
    from ..ops import hako

    z = np.load(path, allow_pickle=False)
    n_lv = int(z["n_lv"])
    return hako.HakoTree(
        bricks=jnp.asarray(z["bricks"]),
        n_bricks=int(z["n_bricks"]),
        levels=tuple(jnp.asarray(z[f"lv{i}"]) for i in range(n_lv)),
        n_per_level=tuple(int(x) for x in z["n_per_level"]),
        root_mask_lo=int(z["root_mask_lo"]),
        root_mask_hi=int(z["root_mask_hi"]),
        T=int(z["T"]), res=int(z["res"]), grid_res=int(z["grid_res"]),
        lower=jnp.asarray(z["lower"]), upper=jnp.asarray(z["upper"]),
        dps=float(z["dps"]),
        snodes=(jnp.asarray(z["snodes"]) if "snodes" in z else None),
        n_snodes=int(z["n_snodes"]),
        n_voxels=int(z["n_voxels"]) if "n_voxels" in z else 0,
        color=(jnp.asarray(z["color"]) if "color" in z else None),
        emission=(jnp.asarray(z["emission"]) if "emission" in z else None),
        has_emission=bool(z["has_emission"]) if "has_emission" in z else False,
    )


def lattice_tree(grid_res: int, cache_dir: str = "/tmp"):
    """Load (or build + cache) the shared dragon-occupancy lattice tree."""
    from ..models import scene
    from . import meshgen

    path = cache_path(grid_res, cache_dir)
    if os.path.exists(path):
        tree = load_hako(path)
        if tree.color is not None:
            return tree
        # stale pre-round-5 cache without voxel attributes: rebuild so PT
        # measurements carry real albedo (see save_hako note)
    tri, cols = meshgen.sphere_lattice(6, 4)
    tree = scene.build_scene(
        tri, cols, origin=np.zeros(3, np.float32), dps=1.0 / grid_res,
        grid_res=grid_res, accel="hako", chunk_tris=262144,
    )
    save_hako(tree, path)
    return tree
