"""Traversal v2 (single-step child selection) must agree with v1 (the
faithful reference port) and the brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.models import cpu_oracle
from massivevoxelraytracing_tpu.ops import morton, octree, traverse, traverse2

RNG = np.random.default_rng(77)


def make_tree(m_u64, grid_res, dps):
    n = len(m_u64)
    pad = octree.bucket(n)
    hi, lo = morton.np_pack_pair(m_u64)
    hi = np.concatenate([hi, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    lo = np.concatenate([lo, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    lower = np.zeros(3, np.float32)
    upper = lower + np.float32(dps) * grid_res
    return octree.build_octree(
        jnp.asarray(hi), jnp.asarray(lo), n, grid_res,
        lower=lower, upper=upper,
    )


def random_voxels(grid_res, n):
    c = RNG.integers(0, grid_res, size=(n, 3)).astype(np.uint32)
    return np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))


@pytest.mark.parametrize("grid_res", [8, 32, 64])
def test_v2_equals_v1(grid_res):
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, grid_res * grid_res)
    tree = make_tree(m, grid_res, dps)
    n = 512
    ro = RNG.uniform(-1.0, 2.0, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    t1, m1, v1 = (np.asarray(x) for x in traverse.intersect_octree(tree, ro, rd))
    t2, m2, v2 = (np.asarray(x) for x in traverse2.intersect_octree2(tree, ro, rd, block=256))
    # identical math modulo tie-order: every disagreement must prove it is
    # an exact t-tie (tiecheck replaces round-1's unclassified 0.5% budget)
    from tiecheck import classify_vs_each_other

    n_tie = classify_vs_each_other(t1, m1, v1, t2, m2, v2, rtol=1e-6)
    assert n_tie <= n // 100, f"{n_tie}/{n} ties is implausibly many"


def test_v2_axis_probes():
    grid_res = 8
    m = np.array([morton.np_encode(np.uint32(3), np.uint32(4), np.uint32(2))])
    tree = make_tree(m, grid_res, 1.0)
    ro = np.array([[-5.0, 4.5, 2.5]], np.float32)
    rd = np.array([[1.0, 0.0, 0.0]], np.float32)
    t, nm, vi = traverse2.intersect_octree2(tree, ro, rd)
    assert np.isclose(float(t[0]), 8.0) and int(nm[0]) == 1 and int(vi[0]) == 0


def test_v2_shadow_and_inside():
    grid_res = 16
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 300)
    tree = make_tree(m, grid_res, dps)
    n = 256
    ro = RNG.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    tf, _, _ = traverse2.intersect_octree2(tree, ro, rd, shadow=False, block=256)
    ts, _, _ = traverse2.intersect_octree2(tree, ro, rd, shadow=True, block=256)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(ts))
    # against brute force
    bad = 0
    tfn = np.asarray(tf)
    for i in range(64):
        to, _, _ = cpu_oracle.intersect_brute_force(m, (0, 0, 0), dps, ro[i], rd[i])
        if (tfn[i] < 1e37) != np.isfinite(to):
            bad += 1
        elif tfn[i] < 1e37 and not np.isclose(tfn[i], to, rtol=3e-5):
            bad += 1
    assert bad <= 1
