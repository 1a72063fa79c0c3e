"""Streamed HakoTree build (ops/hako_stream.py) == monolithic build_hako,
bit for bit, on a Morton-cube terrain stream (utils/shellgen.py).

Scale-axis parity anchor: the reference builds 654M voxels at 16k^3 on a
24 GB card (renderer_introduction.pdf p.8); the stream builder is how this
framework reaches that scale on a 16 GB chip (scripts/scale_shell.py runs
it there). Here the same code paths run at 256^3 on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.ops import hako, hako_stream, octree
from massivevoxelraytracing_tpu.utils import shellgen


@pytest.fixture(scope="module")
def terrain():
    return shellgen.Terrain(256, 64, kmax=8)


@pytest.fixture(scope="module")
def streamed(terrain):
    return hako_stream.build_hako_stream(terrain.chunks(), 256)


def test_generator_sorted_unique_and_counted(terrain):
    parts = []
    for m_hi, m_lo, n in terrain.chunks():
        n = int(n)
        assert n > 0
        m = (np.asarray(m_hi[:n]).astype(np.uint64) << np.uint64(32)) | \
            np.asarray(m_lo[:n]).astype(np.uint64)
        assert np.all(m[1:] > m[:-1]), "chunk not strictly sorted"
        parts.append(m)
    m_all = np.concatenate(parts)
    assert np.all(m_all[1:] > m_all[:-1]), "chunks overlap or out of order"
    assert len(m_all) == terrain.total_voxels(), "tile-pass count disagrees"
    # column fill reaches every (x, y): terrain covers the full 256^2 floor
    from massivevoxelraytracing_tpu.ops import morton as morton_ops
    x, y, _ = (np.asarray(a) for a in morton_ops.decode_magicbits(
        jnp.asarray(m_all >> np.uint64(32), np.uint32),
        jnp.asarray(m_all & np.uint64(0xFFFFFFFF), np.uint32)))
    assert len(np.unique(x.astype(np.int64) * 256 + y)) == 256 * 256


def test_stream_build_equals_monolithic(terrain, streamed):
    parts_hi, parts_lo = [], []
    for m_hi, m_lo, n in terrain.chunks():
        parts_hi.append(np.asarray(m_hi[: int(n)]))
        parts_lo.append(np.asarray(m_lo[: int(n)]))
    hi = np.concatenate(parts_hi)
    lo = np.concatenate(parts_lo)
    n = len(hi)
    pad = octree.bucket(n)
    hi_p = np.full(pad, hako.INVALID, np.uint32)
    lo_p = np.full(pad, hako.INVALID, np.uint32)
    hi_p[:n] = hi
    lo_p[:n] = lo
    mono = hako.build_hako(jnp.asarray(hi_p), jnp.asarray(lo_p), n, 256)

    ts = streamed
    assert ts.n_voxels == mono.n_voxels == n
    assert ts.n_bricks == mono.n_bricks
    assert ts.T == mono.T and ts.res == mono.res
    assert (ts.root_mask_lo, ts.root_mask_hi) == (
        mono.root_mask_lo, mono.root_mask_hi
    )
    assert ts.n_per_level == mono.n_per_level
    for a, b in zip(ts.levels, mono.levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    nb = ts.n_bricks
    np.testing.assert_array_equal(
        np.asarray(ts.bricks[:nb]), np.asarray(mono.bricks[:nb])
    )
    assert (ts.snodes is None) == (mono.snodes is None)
    if ts.snodes is not None:
        ns = ts.n_snodes
        assert ns == mono.n_snodes
        np.testing.assert_array_equal(
            np.asarray(ts.snodes[:ns]), np.asarray(mono.snodes[:ns])
        )


def test_device_park_equals_host_park(terrain, streamed):
    """park='device' (rows never leave the chip; one batched ordering
    check) must be bit-identical to the host-parking default."""
    dev = hako_stream.build_hako_stream(
        terrain.chunks(), 256, park="device"
    )
    host = streamed
    assert dev.n_voxels == host.n_voxels
    assert dev.n_bricks == host.n_bricks
    assert dev.n_per_level == host.n_per_level
    assert (dev.root_mask_lo, dev.root_mask_hi) == (
        host.root_mask_lo, host.root_mask_hi
    )
    nb = dev.n_bricks
    np.testing.assert_array_equal(
        np.asarray(dev.bricks[:nb]), np.asarray(host.bricks[:nb])
    )
    for a, b in zip(dev.levels, host.levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_attributes_match_global_sort():
    """Chunk-local color sort + chunk-order concatenation == one global
    (morton, color) sort: the invariant that lets attributes stream without
    ever materializing the full voxel array."""
    terrain = shellgen.Terrain(256, 64, kmax=8, color=True)
    parts = []
    for m_hi, m_lo, n, col in terrain.chunks():
        n = int(n)
        m = (np.asarray(m_hi[:n]).astype(np.uint64) << np.uint64(32)) | \
            np.asarray(m_lo[:n]).astype(np.uint64)
        parts.append((m, np.asarray(col[:n])))
    m_all = np.concatenate([p[0] for p in parts])
    c_all = np.concatenate([p[1] for p in parts])
    order = np.argsort(m_all, kind="stable")
    np.testing.assert_array_equal(c_all, c_all[order])
    assert np.all(m_all[order] == m_all), "stream already globally sorted"

    tree = hako_stream.build_hako_stream(terrain.chunks(), 256)
    n = tree.n_voxels
    np.testing.assert_array_equal(np.asarray(tree.color[:n]), c_all)
    # colors are plausible terrain bands, not constants
    assert len(np.unique(c_all)) > 3


def test_stream_tree_renders(terrain, streamed):
    """A few rays through the streamed tree vs brute force on the
    reconstructed voxel set (the standard traversal oracle)."""
    from massivevoxelraytracing_tpu.ops import hako_kernels

    tree = streamed
    vox = hako.voxels_from_tree(tree)
    assert len(vox) == tree.n_voxels

    rng = np.random.default_rng(7)
    n_rays = 64
    ro = np.stack([
        rng.uniform(40, 216, n_rays),
        np.full(n_rays, 300.0),
        rng.uniform(40, 216, n_rays),
    ], 1).astype(np.float32)
    target = np.stack([
        rng.uniform(40, 216, n_rays),
        rng.uniform(100, 160, n_rays),
        rng.uniform(40, 216, n_rays),
    ], 1).astype(np.float32)
    rd = (target - ro).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    t, nmaj, vidx = hako_kernels.intersect_hako(tree, ro, rd)
    t = np.asarray(t)

    # brute force over the voxel AABBs of every column the rays cross
    from massivevoxelraytracing_tpu.ops import morton as morton_ops
    x, y, z = (np.asarray(a).astype(np.int64) for a in
               morton_ops.decode_magicbits(
                   jnp.asarray(vox >> np.uint64(32), np.uint32),
                   jnp.asarray(vox & np.uint64(0xFFFFFFFF), np.uint32)))
    lo_c = np.stack([x, y, z], 1).astype(np.float32)
    hits = 0
    for i in range(n_rays):
        with np.errstate(divide="ignore"):
            inv = 1.0 / rd[i]
        t0 = (lo_c - ro[i]) * inv
        t1 = (lo_c + 1.0 - ro[i]) * inv
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        ok = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)
        t_ref = tn[ok].min() if ok.any() else np.float32(np.inf)
        if np.isfinite(t_ref):
            hits += 1
            assert abs(t[i] - t_ref) < 1e-2, (i, t[i], t_ref)
        else:
            assert t[i] > 1e37, (i, t[i])
    assert hits > n_rays // 2  # the scene is actually in the way
