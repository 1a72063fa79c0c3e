"""Sharded scene build correctness.

Two claims, in decreasing strength (see parallel/build.py docstring):
  1. PARTITION INVARIANCE (exact): the same scene over 2 vs 8 devices
     gives bitwise the same tree -- device count only re-partitions the
     group axis of per-voxel sums, which commute exactly.
  2. vs the single-device build (tolerance): the coverage predicate runs
     in a different fused program than build_scene's standalone per-chunk
     executable, and XLA contracts float mul/add chains differently
     across contexts, flipping a small band of exact cell-boundary ties.
     The voxel SET may drift by ~1%; everything else (dedup, true
     duplicate means, tree build) is the same exact machinery.
"""

import numpy as np
import jax
import pytest

from massivevoxelraytracing_tpu.models import scene
from massivevoxelraytracing_tpu.parallel import build as pbuild
from massivevoxelraytracing_tpu.utils import meshgen


def _trees_equal(a, b):
    """Compare every public array field of two tree objects bitwise."""
    assert type(a) is type(b)
    assert a.n_nodes == b.n_nodes
    fields_a = {
        k: v for k, v in vars(a).items()
        if not k.startswith("_") and k != "build_stats"
    }
    for k, va in fields_a.items():
        vb = getattr(b, k)
        if hasattr(va, "shape"):
            na, nb = np.asarray(va), np.asarray(vb)
            assert na.shape == nb.shape, k
            assert np.array_equal(na, nb), f"field {k} differs"
        elif isinstance(va, (int, float, bool, np.integer, np.floating)):
            assert va == vb, f"field {k} differs: {va} != {vb}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_build_partition_invariance():
    """2-device and 8-device partitions agree bitwise (different group
    boundaries and buffer sizes, same merge result)."""
    grid_res = 32
    tri = meshgen.icosphere(2, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    col = meshgen.vertex_colors_from_position(tri, *meshgen.mesh_bounds(tri))
    emi = np.zeros_like(col)
    emi[: len(emi) // 5] = 0.5  # exercise duplicate-mean on both channels
    kw = dict(origin=origin, dps=dps, grid_res=grid_res, accel="octree",
              chunk_tris=128)
    t2 = pbuild.build_scene_sharded(tri, col, emi, n_devices=2, **kw)
    t8 = pbuild.build_scene_sharded(tri, col, emi, n_devices=8, **kw)
    assert t8.build_stats["n_devices"] == 8
    _trees_equal(t2, t8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("accel", ["octree", "brick"])
def test_sharded_build_close_to_single_device(accel):
    """Cross-context tolerance: voxel counts within 1.5%, node counts
    within 2% of the single-device build (float-tie boundary band only).
    Uses the grid-aligned geometry that actually exhibits boundary ties
    (icosphere(2) @ 32^3 measured ~5% of DUMPED candidates flipping --
    nearly all duplicates of already-covered cells)."""
    grid_res = 32
    tri = meshgen.icosphere(2, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    col = meshgen.vertex_colors_from_position(tri, *meshgen.mesh_bounds(tri))
    kw = dict(origin=origin, dps=dps, grid_res=grid_res, accel=accel,
              chunk_tris=128)
    t1 = scene.build_scene(tri, col, **kw)
    t8 = pbuild.build_scene_sharded(tri, col, n_devices=8, **kw)
    n1 = t1.build_stats["n_unique"]
    n8 = t8.build_stats["n_unique"]
    assert abs(n1 - n8) <= max(2, n1 // 66), (n1, n8)
    assert abs(t1.n_nodes - t8.n_nodes) <= max(2, t1.n_nodes // 50)
