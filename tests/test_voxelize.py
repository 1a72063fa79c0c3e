"""Voxelizer fidelity: device dense-grid predicate vs numpy closed-form oracle
vs literal range-loop formulation (the reference's CPU/GPU shared-math pattern,
voxRT.cpp:198-241)."""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.models import cpu_oracle
from massivevoxelraytracing_tpu.ops import morton, voxelize
from massivevoxelraytracing_tpu.utils import meshgen, meshprep

RNG = np.random.default_rng(7)


def _device_voxelize(tri, origin, dps, grid_res, six, cap=8, colors=None, emissions=None):
    if colors is None:
        colors = np.ones_like(tri)
    if emissions is None:
        emissions = np.zeros_like(tri)
    tri, colors, emissions = meshprep.split_to_cap(
        tri, colors, emissions, origin, dps, grid_res, cap
    )
    cands = voxelize.voxelize_dense(
        jnp.asarray(tri),
        jnp.asarray(colors),
        jnp.asarray(emissions),
        jnp.asarray(origin),
        float(dps),
        grid_res=grid_res,
        six_separating=six,
        cap=cap,
    )
    out = voxelize.sort_and_unique(cands)
    n = int(out["n_unique"])
    m = morton.np_unpack_pair(np.asarray(out["m_hi"]), np.asarray(out["m_lo"]))[:n]
    col = np.asarray(out["color"])[:n]
    emi = np.asarray(out["emission"])[:n]
    return m, col, emi, out


def _unpack(c):
    return np.stack([c & 0xFF, (c >> 8) & 0xFF, (c >> 16) & 0xFF], -1)


@pytest.mark.parametrize("six", [True, False])
def test_random_triangles_match_oracle(six):
    # device and oracle voxelize the same (split) triangle set: exact match
    grid_res = 64
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.random_soup(40, seed=3, scale=0.9)
    tri, col, emi = meshprep.split_to_cap(
        tri, np.ones_like(tri), np.zeros_like(tri), origin, dps, grid_res, 8
    )
    m_dev, _, _, _ = _device_voxelize(tri, origin, dps, grid_res, six)
    m_ora, _, _ = cpu_oracle.voxelize_mesh(tri, origin, dps, grid_res, six)
    np.testing.assert_array_equal(m_dev, m_ora)


def test_split_overcoverage_is_tiny_and_one_sided():
    # Splitting a triangle can only ADD voxels (6-separating gets a small
    # half-diagonal band along the cut edges; conservative is an exact
    # overlap test so the union is unchanged modulo float rounding).
    grid_res = 64
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.random_soup(40, seed=3, scale=0.9)
    for six in (True, False):
        m_unsplit, _, _ = cpu_oracle.voxelize_mesh(tri, origin, dps, grid_res, six)
        m_split, _, _, _ = _device_voxelize(tri, origin, dps, grid_res, six)
        missing = set(m_unsplit.tolist()) - set(m_split.tolist())
        extra = set(m_split.tolist()) - set(m_unsplit.tolist())
        assert not missing, f"split lost voxels (six={six})"
        assert len(extra) <= max(2, len(m_unsplit) // 100), (six, len(extra))


@pytest.mark.parametrize("six", [True, False])
def test_closed_form_equals_loop_form(six):
    # cross-check predicate vs the literal reference-style loops per triangle
    grid_res = 64
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.random_soup(60, seed=11, scale=0.9)
    n_total = 0
    n_diff = 0
    for t in tri:
        ctx = cpu_oracle.TriContext(t[0], t[1], t[2], six, origin, dps, grid_res)
        a = {tuple(v) for v in ctx.test_grid()}
        b = {tuple(v) for v in ctx.voxels_looped()}
        n_total += len(a | b)
        n_diff += len(a ^ b)
    # identical math, but ceil((k - o)/dps) vs direct edge-function sign can
    # disagree on exact-boundary voxels; require near-perfect agreement
    assert n_total > 500
    assert n_diff <= max(2, n_total // 1000), (n_diff, n_total)


def test_sphere_watertight_shell(six=True):
    # a closed shell voxelization should produce a single connected band:
    # every occupied voxel has a neighbor, count is in a sane range
    grid_res = 64
    tri = meshgen.icosphere(3, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    m_dev, _, _, _ = _device_voxelize(tri, origin, dps, grid_res, six)
    assert len(m_dev) == len(np.unique(m_dev))
    x, y, z = morton.np_decode(m_dev)
    r = np.sqrt(
        (origin[0] + (x + 0.5) * dps) ** 2
        + (origin[1] + (y + 0.5) * dps) ** 2
        + (origin[2] + (z + 0.5) * dps) ** 2
    )
    # all voxels near the sphere surface
    assert np.all(np.abs(r - 0.9) < 3 * dps)
    # 6-separating shell of a sphere at res 64: thousands of voxels
    assert 2000 < len(m_dev) < 30000


def test_attribute_interpolation_and_mean():
    # one triangle with distinct vertex colors; voxel colors must be convex
    # combinations; duplicates averaged
    grid_res = 32
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = np.array([[[-0.8, -0.5, -0.2], [0.8, -0.4, 0.3], [0.0, 0.7, 0.1]]], np.float32)
    colors = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], np.float32)
    tri, colors, _e = meshprep.split_to_cap(
        tri, colors, np.zeros_like(tri), origin, dps, grid_res, 8
    )
    m_dev, col, emi, out = _device_voxelize(
        tri, origin, dps, grid_res, True, colors=colors
    )
    ora_m, ora_c, _ = cpu_oracle.voxelize_mesh(
        tri, origin, dps, grid_res, True, colors=colors
    )
    np.testing.assert_array_equal(m_dev, ora_m)
    dev_rgb = _unpack(col)
    np.testing.assert_allclose(dev_rgb, ora_c[:, :3].astype(np.int64), atol=1)
    assert not bool(out["has_emission"])


def test_emission_flag():
    grid_res = 16
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.quad_plane(y=0.0, half=0.5)
    emis = np.full_like(tri, 0.5)
    m, col, emi, out = _device_voxelize(
        tri, origin, dps, grid_res, True, emissions=emis
    )
    assert bool(out["has_emission"])
    assert np.all(_unpack(emi) == 128)  # 0.5*255+0.5 = 128


def test_split_to_cap_preserves_coverage():
    grid_res = 64
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    # one huge triangle spanning most of the grid
    tri = np.array([[[-0.9, -0.9, 0.0], [0.9, -0.85, 0.05], [0.0, 0.9, -0.1]]], np.float32)
    m_ora, _, _ = cpu_oracle.voxelize_mesh(tri, origin, dps, grid_res, True)
    m_dev, _, _, _ = _device_voxelize(tri, origin, dps, grid_res, True, cap=8)
    missing = set(m_ora.tolist()) - set(m_dev.tolist())
    extra = set(m_dev.tolist()) - set(m_ora.tolist())
    assert not missing
    assert len(extra) <= max(2, len(m_ora) // 50)


def test_count_matches_emit():
    grid_res = 32
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.random_soup(10, seed=5, scale=0.8)
    tri2, c2, e2 = meshprep.split_to_cap(
        tri, np.ones_like(tri), np.zeros_like(tri), origin, dps, grid_res, 8
    )
    cands = voxelize.voxelize_dense(
        jnp.asarray(tri2), jnp.asarray(c2), jnp.asarray(e2),
        jnp.asarray(origin), float(dps), grid_res=grid_res, cap=8,
    )
    n_dumped = int(voxelize.count_voxels(cands))
    assert n_dumped == int(np.asarray(cands["valid"]).sum())
    out = voxelize.sort_and_unique(cands)
    assert int(out["n_unique"]) <= n_dumped


def test_native_split_matches_numpy():
    """The C++ worklist split must produce the same triangle multiset as the
    numpy per-round bisection (order may differ; voxel sets are identical
    after sort+unique either way)."""
    from massivevoxelraytracing_tpu.utils import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native lib")
    grid_res = 128
    origin = np.array([-1.0, -1.0, -1.0], np.float32)
    dps = np.float32(2.0 / grid_res)
    tri = meshgen.random_soup(200, seed=11, scale=0.9)
    col = np.random.default_rng(3).uniform(0, 1, tri.shape).astype(np.float32)
    emi = np.random.default_rng(4).uniform(0, 1, tri.shape).astype(np.float32)
    nv, nc, ne = native.split_to_cap(tri, col, emi, origin, dps, grid_res, 4)

    # numpy reference: call the round-based fallback by stubbing native out
    import massivevoxelraytracing_tpu.utils.meshprep as mp

    orig = native.split_to_cap
    try:
        native.split_to_cap = lambda *a, **k: None
        pv, pc, pe = mp.split_to_cap(tri, col, emi, origin, dps, grid_res, 4)
    finally:
        native.split_to_cap = orig
    assert len(nv) == len(pv)
    key_n = np.lexsort(nv.reshape(len(nv), -1).T[::-1])
    key_p = np.lexsort(pv.reshape(len(pv), -1).T[::-1])
    np.testing.assert_array_equal(
        nv.reshape(len(nv), -1)[key_n], pv.reshape(len(pv), -1)[key_p]
    )
    np.testing.assert_array_equal(
        nc.reshape(len(nc), -1)[key_n], pc.reshape(len(pc), -1)[key_p]
    )
