"""Sharded scene build correctness: distributing the triangle chunks and
the group-unique stage over a device mesh must produce bitwise the same
tree as the single-device build (the device axis is just another group
partition of the hierarchical-unique path; merge_unique_sums computes
sum-of-sums / sum-of-counts with the same integer division either way)."""

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
@pytest.mark.parametrize("accel", ["octree", "brick"])
def test_sharded_build_equals_single_device(accel):
    grid_res = 64
    tri = meshgen.icosphere(3, radius=0.85)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    col = meshgen.vertex_colors_from_position(tri, *meshgen.mesh_bounds(tri))
    emi = np.zeros_like(col)
    emi[: len(emi) // 5] = 0.5  # exercise duplicate-mean on both channels

    # tiny chunks force many chunks per device so the local scan + offset
    # bookkeeping is actually exercised (5120 tris / 256 = 20 chunks)
    kw = dict(origin=origin, dps=dps, grid_res=grid_res, accel=accel,
              chunk_tris=256)
    t_single = scene.build_scene(tri, col, emi, **kw)
    t_shard = pbuild.build_scene_sharded(tri, col, emi, n_devices=8, **kw)

    assert t_shard.build_stats["n_devices"] == 8
    assert t_shard.build_stats["n_dumped"] == t_single.build_stats["n_dumped"]
    assert t_shard.build_stats["n_unique"] == t_single.build_stats["n_unique"]
    _trees_equal(t_single, t_shard)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_build_partition_invariance():
    """2-device and 8-device partitions agree (different group boundaries,
    same merge result) -- the sharded analog of the hierarchical-unique
    partition invariance."""
    grid_res = 32
    tri = meshgen.icosphere(2, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    kw = dict(origin=origin, dps=dps, grid_res=grid_res, accel="octree",
              chunk_tris=128)
    t2 = pbuild.build_scene_sharded(tri, n_devices=2, **kw)
    t8 = pbuild.build_scene_sharded(tri, n_devices=8, **kw)
    _trees_equal(t2, t8)
