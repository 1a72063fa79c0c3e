"""HakoTree disk cache (utils/treecache): save/load roundtrip fidelity.

bench.py and the knob sweeps share this cache, so a lossy field here
would silently change the headline measurement's scene. Mirrors the
reference's practice of measuring every headline number on one fixed
scene (seminar_ushio.pdf slide 66: the 2048^3 dragon)."""

import numpy as np

from massivevoxelraytracing_tpu.utils import meshgen, treecache
from massivevoxelraytracing_tpu.models import scene


def test_save_load_roundtrip(tmp_path):
    tri, cols = meshgen.sphere_lattice(3, 2)
    grid_res = 32
    tree = scene.build_scene(
        tri, cols, origin=np.zeros(3, np.float32), dps=1.0 / grid_res,
        grid_res=grid_res, accel="hako",
    )
    path = str(tmp_path / "tree.npz")
    treecache.save_hako(tree, path)
    back = treecache.load_hako(path)

    assert back.n_voxels == tree.n_voxels > 0
    assert back.n_bricks == tree.n_bricks
    assert back.n_snodes == tree.n_snodes
    assert back.n_per_level == tree.n_per_level
    assert back.T == tree.T and back.res == tree.res
    assert back.grid_res == tree.grid_res
    assert (back.root_mask_lo, back.root_mask_hi) == (
        tree.root_mask_lo, tree.root_mask_hi)
    assert back.dps == tree.dps
    assert np.array_equal(np.asarray(back.bricks), np.asarray(tree.bricks))
    assert np.array_equal(np.asarray(back.lower), np.asarray(tree.lower))
    assert np.array_equal(np.asarray(back.upper), np.asarray(tree.upper))
    for a, b in zip(back.levels, tree.levels):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    if tree.snodes is None:
        assert back.snodes is None
    else:
        assert np.array_equal(np.asarray(back.snodes), np.asarray(tree.snodes))
    # voxel ATTRIBUTES must survive the cache (round-5 regression: the
    # cache used to drop color/emission, so every PT step on a cached
    # tree rendered black albedo -- geometry pixels at exactly zero
    # radiance, the r4 'legacy PT bug' signature; see STATUS round-5)
    assert tree.color is not None
    assert np.array_equal(np.asarray(back.color), np.asarray(tree.color))
    assert back.has_emission == tree.has_emission
    if tree.emission is None:
        assert back.emission is None
    else:
        assert np.array_equal(
            np.asarray(back.emission), np.asarray(tree.emission))


def test_cache_path_stable(monkeypatch):
    # sweeps and bench must agree on the key; SCENE_TAG bumps invalidate.
    # Pin the snode threshold (ADVICE r4: this test silently depended on
    # MVRT_SNODES_ABOVE being unset in the environment).
    from massivevoxelraytracing_tpu.ops import hako

    monkeypatch.delenv("MVRT_SNODES_ABOVE", raising=False)
    monkeypatch.setattr(hako, "USE_SNODES_ABOVE", 512)
    assert treecache.cache_path(2048).endswith(
        f"hako_tree_{treecache.SCENE_TAG}_2048.npz")
    assert treecache.cache_path(1024).endswith(
        f"hako_tree_{treecache.SCENE_TAG}_1024_fat.npz")
    # a high threshold override flips 2048 to the NON-fat layout: the
    # cache key must say so, not reuse the fat name
    monkeypatch.setattr(hako, "USE_SNODES_ABOVE", 4096)
    assert treecache.cache_path(2048).endswith(
        f"hako_tree_{treecache.SCENE_TAG}_2048_nofat.npz")
    assert treecache.cache_path(1024).endswith(
        f"hako_tree_{treecache.SCENE_TAG}_1024.npz")
