"""HakoMega (single persistent megakernel, ops/hako_mega.py) equivalence
suite, run in interpret mode on CPU:

  * against the legacy round-driver traversal (ops/hako_kernels.py):
    hit-mask / vidx / nmaj exact; t within 1 ulp (the two paths are
    separate XLA programs, so constant folding of chained dt scalings can
    differ in the last bit -- the same CPU-only drift class documented at
    hako_kernels._intersect_padded_eager; Mosaic on TPU compiles each
    kernel once and the on-chip A/B in scripts/mega_ab.py checks there);
  * against the brute-force AABB oracle (exact contract of test_hako.py);
  * every resume path: U-budget overflow deferral, probe caps, DDA
    iteration caps, shadow any-hit, and the 2048^3 supernode chain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.ops import hako, hako_kernels, hako_mega, morton, octree

RNG = np.random.default_rng(11)


def random_voxels(grid_res, n):
    c = RNG.integers(0, grid_res, size=(n, 3)).astype(np.uint32)
    return np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))


def make_tree(m_u64, grid_res, dps):
    n = len(m_u64)
    pad = octree.bucket(n)
    hi, lo = morton.np_pack_pair(m_u64)
    hi = np.concatenate([hi, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    lo = np.concatenate([lo, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    return hako.build_hako(
        jnp.asarray(hi), jnp.asarray(lo), n, grid_res,
        lower=np.zeros(3, np.float32), dps=dps,
    )


def mixed_rays(m_u64, grid_res, n):
    dps = 1.0 / grid_res
    ro = RNG.uniform(-1.0, 2.0, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    # aim half at actual voxel centers so sparse scenes still hit
    x, y, z = morton.np_decode(m_u64[RNG.integers(0, len(m_u64), n // 2)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd[: n // 2] = (
        target - ro[: n // 2] + RNG.normal(size=(n // 2, 3)) * 2e-4
    ).astype(np.float32)
    return ro, rd


def assert_matches_legacy(tree, ro, rd, shadow=False, **mega_kw):
    t0, nm0, vi0 = (
        np.asarray(x)
        for x in hako_kernels.intersect_hako(tree, ro, rd, shadow=shadow)
    )
    t1, nm1, vi1 = (
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(
            tree, ro, rd, shadow=shadow, **mega_kw
        )
    )
    hit0 = t0 < 1e37
    hit1 = t1 < 1e37
    np.testing.assert_array_equal(hit0, hit1)
    np.testing.assert_array_equal(nm0, nm1)
    np.testing.assert_array_equal(vi0, vi1)
    h = hit0
    if h.any():
        # 1-ulp tolerance: separate-XLA-program constant folding (see
        # module docstring); everything discrete must be exact
        np.testing.assert_allclose(t0[h], t1[h], rtol=3e-7, atol=0)
    return t1, nm1, vi1


@pytest.mark.parametrize("grid_res", [64, 256])
def test_mega_matches_legacy(grid_res):
    m = random_voxels(grid_res, grid_res * 24)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    ro, rd = mixed_rays(m, grid_res, 1024)
    t, _, _ = assert_matches_legacy(tree, ro, rd)
    assert (t < 1e37).any() and (t >= 1e37).any()


def test_mega_matches_brute_force():
    from test_hako import compare_vs_oracle

    grid_res = 64
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 2048)
    tree = make_tree(m, grid_res, dps)
    n = 256
    ro = RNG.uniform(-1.0, 2.0, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    ro[:8] = np.array([0.503, 0.497, -2.0], np.float32)
    rd[:2] = np.array([0.0, 0.0, 1.0], np.float32)
    rd[2:4] = np.array([0.0, 1.0, 0.0], np.float32)[None]
    ro[4:8] = np.array([0.503, 0.497, 0.501], np.float32)

    hit = compare_vs_oracle(
        tree, m, dps, ro, rd, intersect=hako_mega.intersect_hako_mega
    )
    assert hit.any() and (~hit).any()


def test_mega_uniq_overflow_defers_bit_exact():
    """A tiny U budget must change scheduling only, never results: lanes
    ranked past the budget re-probe from their resume key next round."""
    grid_res = 64
    m = random_voxels(grid_res, 3000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    ro, rd = mixed_rays(m, grid_res, 512)
    t0, nm0, vi0 = (
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(tree, ro, rd, uniq=32)
    )
    t1, nm1, vi1 = (
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(tree, ro, rd, uniq=2)
    )
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(nm0, nm1)
    np.testing.assert_array_equal(vi0, vi1)


def test_mega_cont_rounds_bit_exact():
    """MEGA_CONT (table-hit continue rounds: the U-row table persists
    across rounds; fetch-free rounds rank by tag match) must change
    scheduling only, never results -- including under a tiny U budget
    where continue and overflow-deferral rounds interleave."""
    grid_res = 256
    m = random_voxels(grid_res, 6000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    ro, rd = mixed_rays(m, grid_res, 512)
    base = [
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(tree, ro, rd, cont=0)
    ]
    for kw in ({"cont": 1}, {"cont": 1, "uniq": 4},
               {"cont": 1, "max_probes": 1, "max_dda": 2}):
        got = [
            np.asarray(x)
            for x in hako_mega.intersect_hako_mega(tree, ro, rd, **kw)
        ]
        for a, b in zip(base, got):
            np.testing.assert_array_equal(a, b)


def test_mega_capped_resume_bit_exact():
    """Forced 1-probe / 1-DDA-iteration caps exercise every t-resume path
    and must not change results (more rounds, same traversal)."""
    grid_res = 256
    m = random_voxels(grid_res, 6000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    ro, rd = mixed_rays(m, grid_res, 512)
    t0, nm0, vi0 = (
        np.asarray(x) for x in hako_mega.intersect_hako_mega(tree, ro, rd)
    )
    t1, nm1, vi1 = (
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(
            tree, ro, rd, max_probes=1, max_dda=1
        )
    )
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(nm0, nm1)
    np.testing.assert_array_equal(vi0, vi1)


def test_mega_shadow_any_hit():
    """Shadow rays report occlusion (any t < inf) identically to the
    legacy any-hit kernels on the same scene."""
    grid_res = 64
    m = random_voxels(grid_res, 3000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    ro, rd = mixed_rays(m, grid_res, 512)
    t0, _, _ = hako_kernels.intersect_hako(tree, ro, rd, shadow=True)
    t1, _, _ = hako_mega.intersect_hako_mega(tree, ro, rd, shadow=True)
    np.testing.assert_array_equal(
        np.asarray(t0) < 1e37, np.asarray(t1) < 1e37
    )


def test_mega_fat_t1(monkeypatch):
    """Fat tree with T=1 (the MVRT_SNODES_ABOVE=512 shape a 1024^3 scene
    takes): the probe is a single root walk -- no level tables at all --
    and both row stages ride the DMA-dedup fetch. Checked vs legacy and
    with cont on/off."""
    from massivevoxelraytracing_tpu.ops import hako as hako_mod

    monkeypatch.setattr(hako_mod, "USE_SNODES_ABOVE", 128)
    grid_res = 512
    m = random_voxels(grid_res, 8000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    assert tree.snodes is not None and tree.T == 1 and not tree.levels
    ro, rd = mixed_rays(m, grid_res, 512)
    t1, nm1, vi1 = assert_matches_legacy(tree, ro, rd)
    for kw in ({"cont": 0}, {"cont": 1, "uniq": 4}):
        tc, nmc, vic = (
            np.asarray(x)
            for x in hako_mega.intersect_hako_mega(tree, ro, rd, **kw)
        )
        np.testing.assert_array_equal(t1, tc)
        np.testing.assert_array_equal(nm1, nmc)
        np.testing.assert_array_equal(vi1, vic)


def test_mega_snode_chain():
    """2048^3 tree (supernode fat path): two chained in-kernel row stages
    per round, both riding the DMA dedup fetch."""
    grid_res = 2048
    dps = 1.0 / grid_res
    # cluster voxels so bricks/snodes get real multi-occupancy
    centers = RNG.integers(0, grid_res, size=(24, 3))
    pts = []
    for c in centers:
        pts.append(
            np.clip(
                c[None, :] + RNG.integers(-40, 41, size=(160, 3)),
                0, grid_res - 1,
            )
        )
    pts = np.concatenate(pts).astype(np.uint32)
    m = np.unique(morton.np_encode(pts[:, 0], pts[:, 1], pts[:, 2]))
    tree = make_tree(m, grid_res, dps)
    assert tree.snodes is not None and tree.n_snodes > 1
    ro, rd = mixed_rays(m, grid_res, 512)
    assert_matches_legacy(tree, ro, rd)
    # U overflow through the snode chain too
    t0, nm0, vi0 = (
        np.asarray(x)
        for x in hako_mega.intersect_hako_mega(tree, ro, rd, uniq=2)
    )
    t1, nm1, vi1 = (
        np.asarray(x) for x in hako_mega.intersect_hako_mega(tree, ro, rd)
    )
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(vi0, vi1)
    # fat-path cont: the snode stage rides its OWN resident table
    for kw in ({"cont": 1}, {"cont": 1, "uniq": 4}):
        tc, nmc, vic = (
            np.asarray(x)
            for x in hako_mega.intersect_hako_mega(tree, ro, rd, **kw)
        )
        np.testing.assert_array_equal(t1, tc)
        np.testing.assert_array_equal(nm1, nmc)
        np.testing.assert_array_equal(vi1, vic)
