"""HakoTree (fat-leaf tree + Pallas kernels, run in interpret mode on CPU):
build round-trip against the Morton oracle, traversal against the
brute-force AABB intersector (the repo's Embree stand-in,
models/cpu_oracle.py), and the resume paths under forced 1-probe /
1-DDA-iteration caps. Mirrors the reference's dual-intersector A/B culture
(voxRT.cpp:316-323)."""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.models import cpu_oracle
from massivevoxelraytracing_tpu.ops import hako, hako_kernels, morton, octree

RNG = np.random.default_rng(7)


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


def oracle_all(m_u64, dps, ro, rd):
    t = np.empty(len(ro), np.float32)
    nm = np.empty(len(ro), np.int64)
    vi = np.empty(len(ro), np.int64)
    for i in range(len(ro)):
        t[i], nm[i], vi[i] = cpu_oracle.intersect_brute_force(
            m_u64, (0, 0, 0), dps, ro[i], rd[i]
        )
    return t, nm, vi


def compare_vs_oracle(tree, m_u64, dps, ro, rd, require_exact=True,
                      intersect=None):
    if intersect is None:
        intersect = hako_kernels.intersect_hako
    t, nm, vi = (np.asarray(x) for x in intersect(tree, ro, rd))
    to, nmo, vio = oracle_all(m_u64, dps, ro, rd)
    hit = t < 1e37
    hito = np.isfinite(to)
    assert (hit == hito).all(), f"{(hit != hito).sum()} hit-mask mismatches"
    h = hit
    if h.any():
        np.testing.assert_allclose(t[h], to[h], rtol=1e-5, atol=1e-7)
        assert (vi[h] == vio[h]).all(), f"{(vi[h] != vio[h]).sum()} vidx mismatches"
        # face axis can legitimately differ only at exact edge/corner ties:
        # classify every one (round-1 used an unclassified 0.2% budget)
        if require_exact:
            from tiecheck import assert_face_tie

            for i in np.nonzero(h & (nm != nmo))[0]:
                assert_face_tie(
                    i, m_u64[int(vi[i])], np.zeros(3, np.float32), dps,
                    ro[i], rd[i],
                )
    return hit


@pytest.mark.parametrize("grid_res", [64, 256])
def test_hako_build_roundtrip(grid_res):
    m = random_voxels(grid_res, grid_res * 16)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    assert tree.n_voxels == len(m)
    got = hako.voxels_from_tree(tree)
    np.testing.assert_array_equal(got, m)


@pytest.mark.parametrize("grid_res", [64, 256])
def test_hako_matches_brute_force(grid_res):
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, grid_res * grid_res // 2)
    tree = make_tree(m, grid_res, dps)
    n = 256
    ro = RNG.uniform(-1.0, 2.0, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    # include axis-parallel and from-inside rays (off exact cell boundaries:
    # a ray along a voxel EDGE is a zero-measure touch that the strict
    # en < ex parametric walk excludes, like the reference's traversal,
    # while the non-strict slab-test oracle includes it)
    ro[:8] = np.array([0.503, 0.497, -2.0], np.float32)
    rd[:2] = np.array([0.0, 0.0, 1.0], np.float32)
    rd[2:4] = np.array([0.0, 1.0, 0.0], np.float32)[None]
    ro[4:8] = np.array([0.503, 0.497, 0.501], np.float32)
    hit = compare_vs_oracle(tree, m, dps, ro, rd)
    assert hit.any() and (~hit).any()


def test_hako_taa_levels_match_brute_force(monkeypatch):
    """1024^3 tree with mid levels in the (48,128) taa table format (the
    per-row lane-gather fetch path); 64^3/256^3 trees only exercise the
    SMEM fold path. Pins the round-3 snode threshold: since round 4 the
    default builds 1024 as a fat T=1 tree (no taa level to cover)."""
    from massivevoxelraytracing_tpu.ops import hako as hako_mod

    monkeypatch.setattr(hako_mod, "USE_SNODES_ABOVE", 1024)
    grid_res = 1024
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 1500)
    tree = make_tree(m, grid_res, dps)
    from massivevoxelraytracing_tpu.ops.hako_kernels import hako_args

    _, (T, level_rows) = hako_args(tree)
    assert T == 3 and any(k == "taa" for k, _ in level_rows), level_rows
    n = 192
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    # sparse scene: aim at actual voxel centers (jittered) or nothing hits
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 2e-4).astype(np.float32)
    hit = compare_vs_oracle(tree, m, dps, ro, rd)
    assert hit.mean() > 0.5


def test_hako_snode_levels_match_brute_force():
    """2048^3 tree gets the fat SUPERNODE level (16^3-brick occupancy rows
    gathered from HBM like bricks) so no VMEM table ever exceeds 2048
    nodes; traversal must still match the slab oracle exactly."""
    grid_res = 2048
    dps = 1.0 / grid_res
    # cluster voxels so bricks/snodes get real multi-occupancy
    base = RNG.integers(0, grid_res // 8, size=(60, 3)).astype(np.uint32) * 8
    off = RNG.integers(0, 16, size=(40, 60, 3)).astype(np.uint32)
    c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
    m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    tree = make_tree(m, grid_res, dps)
    assert tree.snodes is not None and tree.n_snodes > 1
    assert all(n <= 2048 for n in tree.n_per_level), tree.n_per_level
    got = hako.voxels_from_tree(tree)
    np.testing.assert_array_equal(got, m)

    n = 160
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 5e-5).astype(np.float32)
    hit = compare_vs_oracle(tree, m, dps, ro, rd)
    assert hit.mean() > 0.5


def test_hako_16k_grid_matches_brute_force():
    """16384^3 -- the reference's demonstrated max scale (654M voxels on a
    24 GB GPU, renderer_introduction.pdf p.8). A sparse cluster keeps the
    CPU cost tiny while exercising the full supernode chain and the float
    parametrization at dps = 1/16384 (voxel extents near the f32 ulp of
    the scene extent)."""
    grid_res = 16384
    dps = 1.0 / grid_res
    base = RNG.integers(0, grid_res // 64, size=(24, 3)).astype(np.uint32) * 64
    off = RNG.integers(0, 48, size=(50, 24, 3)).astype(np.uint32)
    c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
    m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    tree = make_tree(m, grid_res, dps)
    assert tree.snodes is not None
    got = hako.voxels_from_tree(tree)
    np.testing.assert_array_equal(got, m)

    n = 96
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro).astype(np.float32)
    hit = compare_vs_oracle(tree, m, dps, ro, rd)
    assert hit.mean() > 0.5


@pytest.mark.parametrize("grid_res", [256, 2048])
def test_hako_pack_budget_equivalence(grid_res, monkeypatch):
    """Emit-dense packing is a pure reordering: a narrow gather budget
    (cap=2 blocks, bcap=1, so half the lanes defer and re-probe from their
    resume key every round) must produce bit-identical results to packing
    disabled. 2048^3 exercises the two-stage supernode chain's packing."""
    dps = 1.0 / grid_res
    if grid_res > 256:
        base = RNG.integers(0, grid_res // 8, size=(40, 3)).astype(np.uint32) * 8
        off = RNG.integers(0, 24, size=(50, 40, 3)).astype(np.uint32)
        c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
        m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    else:
        m = random_voxels(grid_res, 20000)
    tree = make_tree(m, grid_res, dps)
    n = 4096  # 2 ray blocks; CAP_DIV=1 makes cap=2 so packing engages
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "CAP_DIV", 1)
    monkeypatch.setattr(hako_kernels, "PACK_DIV", 1)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "PACK_DIV", 2)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


@pytest.mark.parametrize("grid_res,twob", [(256, 1), (2048, 0)])
def test_hako_fuse_book_equivalence(grid_res, twob, monkeypatch):
    """FUSE_BOOK rounds (kernels read the persistent state rows via
    scalar-prefetch sel-maps; an aliased merge kernel writes the 5 state
    arrays in place, replacing the XLA pick/put) are bit-identical to the
    legacy rounds -- including underfull tail rounds (fill slots write the
    spare block, never a genuine one), dedup deferral, two-brick chaining,
    and the 2048^3 snode chain."""
    dps = 1.0 / grid_res
    if grid_res > 256:
        base = RNG.integers(0, grid_res // 8, size=(40, 3)).astype(np.uint32) * 8
        off = RNG.integers(0, 24, size=(50, 40, 3)).astype(np.uint32)
        c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
        m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    else:
        m = random_voxels(grid_res, 20000)
    tree = make_tree(m, grid_res, dps)
    n = 4096
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "UNIQ", 16)
    monkeypatch.setattr(hako_kernels, "PACK_DIV", 1)
    monkeypatch.setattr(hako_kernels, "TWO_BRICK", twob)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "FUSE_BOOK", 1)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


@pytest.mark.parametrize("grid_res,uniq", [(256, 64), (2048, 16)])
def test_hako_dedup_gather_equivalence(grid_res, uniq, monkeypatch):
    """Per-block dedup-gather (UNIQ>0: sort-ranked unique rows + one-hot
    MXU regather in kernel B) is bit-identical to the per-lane gather,
    including heavy budget overflow (random targets give ~1500 distinct
    ids per 2048-lane block at 256^3, so most ranked lanes defer on their
    resume key each round) and the 2048^3 two-stage supernode chain."""
    dps = 1.0 / grid_res
    if grid_res > 256:
        base = RNG.integers(0, grid_res // 8, size=(40, 3)).astype(np.uint32) * 8
        off = RNG.integers(0, 24, size=(50, 40, 3)).astype(np.uint32)
        c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
        m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    else:
        m = random_voxels(grid_res, 20000)
    tree = make_tree(m, grid_res, dps)
    n = 4096
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "CAP_DIV", 1)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "UNIQ", uniq)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


@pytest.mark.parametrize("pack,uniq,dda", [(1, 0, 24), (2, 64, 24),
                                           (2, 0, 4)])
def test_hako_two_brick_equivalence(pack, uniq, dda, monkeypatch):
    """TWO_BRICK rounds (kernel A emits the ray's second in-node brick and
    the round chains a second leaf stage) are bit-identical to single-brick
    rounds, across packing, dedup, and a forced DDA iteration cap (dda=4
    exercises mid-brick resume in BOTH stages). Verified live: stage 2
    serves ~0.7x stage-1 lanes and cuts rounds 27 -> 16 on a 60K-voxel
    scene."""
    grid_res, dps = 256, 1.0 / 256
    m = random_voxels(grid_res, 20000)
    tree = make_tree(m, grid_res, dps)
    n = 4096
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "CAP_DIV", 1)
    monkeypatch.setattr(hako_kernels, "PACK_DIV", pack)
    monkeypatch.setattr(hako_kernels, "UNIQ", uniq)
    monkeypatch.setattr(hako_kernels, "MAX_DDA_ITERS", dda)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "TWO_BRICK", 1)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


@pytest.mark.parametrize("grid_res,uniq,pack,vacp,vacr,twob", [
    (256, 0, 1, 2, 1, 0),   # full rungs then vacuum, 1-block prefix
    (256, 64, 2, 2, 2, 0),  # vacuum composed with dedup + packing rungs
    (256, 0, 1, 999, 1, 0),  # all-vacuum (pick = every block), heavy deferral
    (2048, 0, 2, 2, 1, 0),  # two-stage supernode chain under vacuum
    (256, 0, 1, 2, 1, 1),   # vacuum composed with two-brick rounds
])
def test_hako_vacuum_equivalence(grid_res, uniq, pack, vacp, vacr, twob,
                                 monkeypatch):
    """The straggler-vacuum tail rung (VAC_PICK/VAC_RUN: pick many blocks,
    act-first lane-pack, run the whole round on a small dense prefix) is a
    pure reordering: deferred lanes keep their resume state untouched, so
    results must be bit-identical to vacuum disabled -- including heavy
    deferral (prefix smaller than the active set from round 0) and the
    2048^3 snode chain."""
    dps = 1.0 / grid_res
    if grid_res > 256:
        base = RNG.integers(0, grid_res // 8, size=(40, 3)).astype(np.uint32) * 8
        off = RNG.integers(0, 24, size=(50, 40, 3)).astype(np.uint32)
        c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
        m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    else:
        m = random_voxels(grid_res, 20000)
    tree = make_tree(m, grid_res, dps)
    n = 8192  # 4 ray blocks; CAP_DIV=1 makes cap=4 so the ladder is real
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "CAP_DIV", 1)
    monkeypatch.setattr(hako_kernels, "PACK_DIV", pack)
    monkeypatch.setattr(hako_kernels, "UNIQ", uniq)
    monkeypatch.setattr(hako_kernels, "TWO_BRICK", twob)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "VAC_PICK", vacp)
    monkeypatch.setattr(hako_kernels, "VAC_RUN", vacr)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_hako_snode_capped_resume(monkeypatch):
    """Every snode-chain resume path must be exercised and change nothing:
    1 probe per kernel-A call and 1 coarse-cell visit per DDA call."""
    grid_res = 2048
    dps = 1.0 / grid_res
    base = RNG.integers(0, grid_res // 8, size=(30, 3)).astype(np.uint32) * 8
    off = RNG.integers(0, 24, size=(50, 30, 3)).astype(np.uint32)
    c = (base[None, :, :] + off).reshape(-1, 3) % grid_res
    m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    tree = make_tree(m, grid_res, dps)
    n = 96
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro).astype(np.float32)
    ref = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "MAX_PROBES", 1)
    monkeypatch.setattr(hako_kernels, "MAX_DDA_ITERS", 1)
    got = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_hako_shadow_any_hit():
    grid_res = 64
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 2048)
    tree = make_tree(m, grid_res, dps)
    n = 256
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    t, _, _ = (np.asarray(x) for x in hako_kernels.intersect_hako(tree, ro, rd))
    ts, _, _ = (np.asarray(x) for x in
                hako_kernels.intersect_hako(tree, ro, rd, shadow=True))
    # shadow mode is the same in-order walk minus rank math: same hits
    np.testing.assert_array_equal(t < 1e37, ts < 1e37)
    h = t < 1e37
    np.testing.assert_allclose(t[h], ts[h], rtol=1e-6)


def test_hako_capped_probes_and_iters_resume(monkeypatch):
    """Forcing 1 probe per kernel-A call and 1 sub-brick visit per kernel-B
    call exercises every resume path; results must not change."""
    grid_res = 256
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 8000)
    tree = make_tree(m, grid_res, dps)
    n = 128
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    ref = [np.asarray(x) for x in hako_kernels.intersect_hako(tree, ro, rd)]
    monkeypatch.setattr(hako_kernels, "MAX_PROBES", 1)
    monkeypatch.setattr(hako_kernels, "MAX_DDA_ITERS", 1)
    got = [np.asarray(x) for x in hako_kernels.intersect_hako(tree, ro, rd)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_hako_jitted_ladder_matches_eager(monkeypatch):
    """The jitted while_loop driver (_intersect_padded: block-cap ladder +
    straggler-vacuum rung -- the actual TPU path) must match the eager
    per-round driver bit-exactly. Off-jit calls use the eager driver, so
    without this test the jitted rung sequencing is only compile-checked
    (entry()); the interpret kernels carry optimization barriers so both
    drivers compute identical floats (commit: jit-safe interpret driver)."""
    grid_res = 64
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 2048)
    tree = make_tree(m, grid_res, dps)
    n = 8192  # 4 ray blocks: ladder [4] -> vacuum rung (pick 2, run 1)
    ro = RNG.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[RNG.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + RNG.normal(size=(n, 3)) * 0.2).astype(np.float32)
    monkeypatch.setattr(hako_kernels, "CAP_DIV", 1)
    monkeypatch.setattr(hako_kernels, "VAC_PICK", 2)
    monkeypatch.setattr(hako_kernels, "VAC_RUN", 1)
    eager = [np.asarray(v) for v in hako_kernels.intersect_hako(tree, ro, rd)]

    import jax

    meta, (T, level_rows) = hako_kernels.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta

    @jax.jit
    def jitted(ro_, rd_):
        # Tracer inputs off-TPU route to _intersect_padded(interpret=True):
        # the jitted ladder driver with interpret-mode kernels
        return hako_kernels.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper, ro_, rd_,
            T=T, level_rows=level_rows,
            **hako_kernels.knobs_for_res(grid_res),
        )

    got = [np.asarray(v) for v in jitted(jnp.asarray(ro), jnp.asarray(rd))]
    for r, g in zip(eager, got):
        np.testing.assert_array_equal(r, g)


def test_hako_single_top_level():
    # grid 64 = 16 * 4: T == 1, no VMEM level tables at all
    assert hako.top_levels_for(64) == 1
    m = random_voxels(64, 500)
    tree = make_tree(m, 64, 1.0 / 64)
    assert tree.levels == ()


def test_hako_memory_is_compact():
    grid_res = 256
    m = random_voxels(grid_res, 30000)
    tree = make_tree(m, grid_res, 1.0 / grid_res)
    # fat bricks: 656 B per occupied 16^3 region (pow2-padded brick array)
    assert tree.memory_bytes() <= 2 * 656 * max(tree.n_bricks, 1) + 1 << 20
