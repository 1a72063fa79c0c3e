"""Scene-memory sharding (parallel/bigscene.py): a HakoTree split into
contiguous brick-range sub-trees across devices must reproduce the
unsharded traversal exactly -- same hits, same t, same GLOBAL voxel
attribute index (shards reuse the tree's brick rows verbatim, so the
in-brick DDA is bit-identical; min-t over shards == in-order first hit
of the full tree up to exact t-ties)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.models import scene
from massivevoxelraytracing_tpu.ops.hako_kernels import intersect_hako
from massivevoxelraytracing_tpu.parallel import bigscene
from massivevoxelraytracing_tpu.utils import meshgen

MISS = 1e37


def _scene_and_rays(grid_res=64, n=1536):
    tri = meshgen.icosphere(3, radius=0.85)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    col = meshgen.vertex_colors_from_position(tri, *meshgen.mesh_bounds(tri))
    tree = scene.build_scene(
        tri, col, origin=origin, dps=dps, grid_res=grid_res, accel="hako"
    )
    extent = float(dps) * grid_res
    center = np.asarray(origin) + extent / 2
    rng = np.random.default_rng(11)
    ro = np.tile(
        (center + np.array([0.8, 0.5, 1.5]) * extent).astype(np.float32),
        (n, 1),
    )
    target = np.asarray(origin) + extent * rng.uniform(0.1, 0.9, (n, 3))
    rd = (target - ro).astype(np.float32)
    return tree, ro, rd


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_scene_matches_full_tree(n_shards):
    tree, ro, rd = _scene_and_rays()
    t1, nm1, vi1 = (np.asarray(x) for x in intersect_hako(tree, ro, rd))

    shards = bigscene.shard_hako_tree(
        tree, n_shards, devices=jax.devices()[:n_shards]
    )
    assert sum(s.n_bricks for s in shards) == tree.n_bricks
    assert sum(s.n_voxels for s in shards) == tree.n_voxels
    t2, nm2, vi2, win = bigscene.intersect_sharded(shards, ro, rd)

    hit1, hit2 = t1 < MISS, t2 < MISS
    assert (hit1 == hit2).all(), "hit sets differ"
    np.testing.assert_allclose(t1[hit1], t2[hit2], rtol=1e-6, atol=1e-7)
    # attribute index is GLOBAL and must match the unsharded tree exactly
    agree = (vi1[hit1] == vi2[hit2]).mean()
    assert agree == 1.0, f"voxel index agreement {agree}"
    assert (nm1[hit1] == nm2[hit2]).all()
    assert len(np.unique(win[hit2])) > 1, "rays all won by one shard?"


def test_sharded_scene_shadow_anyhit():
    tree, ro, rd = _scene_and_rays()
    t1 = np.asarray(intersect_hako(tree, ro, rd, shadow=True)[0])
    shards = bigscene.shard_hako_tree(tree, 3)
    t2, _, _, _ = bigscene.intersect_sharded(shards, ro, rd, shadow=True)
    assert ((t1 < MISS) == (t2 < MISS)).all()


def test_sharded_scene_render_matches():
    tree, ro, rd = _scene_and_rays(n=1024)
    from massivevoxelraytracing_tpu.models import raycast

    img1, t1 = raycast.render_rays(tree, ro, rd, show_color=True)
    img1, t1 = np.asarray(img1), np.asarray(t1)
    shards = bigscene.shard_hako_tree(tree, 4, devices=jax.devices()[:4])
    img2, t2 = bigscene.render_rays_sharded(shards, ro, rd, show_color=True)
    assert (img1 == img2).all(axis=-1).mean() > 0.999
