"""Streamed HakoTree build: reference-scale grids (16k^3 / 654M voxels,
renderer_introduction.pdf p.8) without ever holding the full voxel Morton
stream on device.

build_hako (ops/hako.py) needs the whole sorted unique Morton array resident
(5.2 GB at 654M voxels) plus comparable scatter temporaries -- past HBM on a
16 GB chip. This builder instead consumes an ITERATOR of sorted Morton
chunks whose boundaries fall on 16^3 brick boundaries (any Morton-aligned
cube partition of side >= 16 guarantees that, e.g. utils/shellgen.py), so:

  * every chunk's bricks are disjoint from every other chunk's -- the
    per-chunk `_build_bricks` outputs concatenate with NO merge step;
  * per-chunk device peak is O(chunk); finished brick rows park either on
    the HOST (164 u32 = 656 B per brick; 2.6M bricks = 1.7 GB host RAM,
    park="host", the 16 GB-chip default) or stay ON DEVICE as parts
    concatenated once at the end (park="device", for tunneled chips whose
    device->host readback is ~10 MB/s -- 1.7 GB would take hours to park);
  * the levels above the bricks need only the brick Mortons (u32 per
    BRICK, not per voxel) and ride the exact `_assemble_above` path
    build_hako uses, so stream and monolithic builds are bit-identical
    (tests/test_hako_stream.py).

The reference hits this scale by streaming too -- its builder re-voxelizes
per frame into pre-sized GPU buffers (IntersectorOctreeGPU.hpp:40-241) and
the 16k^3 figure is its 24 GB-card headline; chunking at brick granularity
is the TPU-sized equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bits import I32
from .hako import (
    INVALID,
    HakoTree,
    _assemble_above,
    _build_bricks,
    _level_counts,
)
from .octree import bucket


@partial(jax.jit, static_argnames=())
def _chunk_brick_count(m_hi, m_lo, n):
    valid = jnp.arange(m_hi.shape[0], dtype=I32) < n
    bm = jnp.where(valid, (m_hi << 20) | (m_lo >> 12), jnp.uint32(INVALID))
    return _level_counts(bm, valid, n_levels=0)[0]


@jax.jit
def _rebase(rows, off):
    """base (col 130) is the voxel rank inside the CHUNK; make it global."""
    return rows.at[:, 130].add(jnp.uint32(off))


def build_hako_stream(
    chunks, grid_res: int, *,
    lower=None, dps: float = 1.0, has_emission: bool = False,
    park: str = "host",
) -> HakoTree:
    """chunks: iterator of (m_hi, m_lo, n) or (m_hi, m_lo, n, color) or
    (m_hi, m_lo, n, color, emission) -- u32 arrays (device or host, any
    padding past n), each sorted by Morton, globally ascending across
    chunks, globally unique, and split only at 16^3 brick boundaries.
    color/emission are packed rgb8 u32 per voxel IN the chunk's sorted
    order; since chunks are globally ordered, the global attribute array
    (indexed by voxel rank, = brick base + in-brick rank) is just their
    concatenation. Either all chunks carry attributes or none do.

    park: "host" copies finished rows to host RAM per chunk (lowest device
    peak); "device" keeps them on device and defers the chunk-ordering
    check to one batched readback (for tunnel-attached chips)."""
    assert park in ("host", "device")
    on_host = park == "host"
    rows_parts: list = []
    gbm_parts: list = []
    col_parts: list = []
    emi_parts: list = []
    edges: list = []  # device mode: (first, last) brick Morton per chunk
    vox_off = 0
    last_bm = -1
    for chunk in chunks:
        m_hi, m_lo, n_c = chunk[:3]
        n_c = int(n_c)
        if n_c == 0:
            continue
        if len(chunk) > 3:
            c = chunk[3][:n_c]
            col_parts.append(np.asarray(c, np.uint32) if on_host
                             else jnp.asarray(c))
        if len(chunk) > 4:
            e = chunk[4][:n_c]
            emi_parts.append(np.asarray(e, np.uint32) if on_host
                             else jnp.asarray(e))
        assert len(col_parts) in (0, len(rows_parts) + 1), (
            "all chunks must carry attributes, or none"
        )
        assert len(emi_parts) in (0, len(rows_parts) + 1), (
            "all chunks must carry emission, or none"
        )
        m_hi = jnp.asarray(m_hi)
        m_lo = jnp.asarray(m_lo)
        nb_c = int(_chunk_brick_count(m_hi, m_lo, jnp.int32(n_c)))
        rows, g_bm, _ = _build_bricks(
            m_hi, m_lo, jnp.int32(n_c), nb_pad=bucket(nb_c)
        )
        if on_host:
            rows_np = np.array(rows[:nb_c])  # np.array: owned, writable
            gbm_np = np.asarray(g_bm[:nb_c])
            # chunk boundaries on brick boundaries + global order = disjoint
            # ascending brick runs; catch generator bugs here, not in
            # traversal
            assert int(gbm_np[0]) > last_bm, (
                f"chunk overlaps/reorders bricks: {gbm_np[0]} after {last_bm}"
            )
            last_bm = int(gbm_np[-1])
            rows_np[:, 130] += np.uint32(vox_off)
            rows_parts.append(rows_np)
            gbm_parts.append(gbm_np)
        else:
            # rebase at the PADDED shape (few distinct bucket sizes ->
            # few compiles over the tunnel), slice after
            rows_parts.append(_rebase(rows, vox_off)[:nb_c])
            gbm_parts.append(g_bm[:nb_c])
            edges.append(jnp.stack([g_bm[0], g_bm[nb_c - 1]]))
        vox_off += n_c

    if not rows_parts:
        raise ValueError("empty voxel stream")
    nb = sum(p.shape[0] for p in rows_parts)
    assert nb < (1 << 24), f"brick count {nb} exceeds capacity"
    n_voxels = vox_off

    nb_pad = bucket(nb)
    if on_host:
        rows_all = np.zeros((nb_pad, rows_parts[0].shape[1]), np.uint32)
        rows_all[:nb] = np.concatenate(rows_parts)
        del rows_parts
        gbm_all = np.full((nb_pad,), INVALID, np.uint32)
        gbm_all[:nb] = np.concatenate(gbm_parts)
        del gbm_parts
        rows_all = jnp.asarray(rows_all)
        gbm_all = jnp.asarray(gbm_all)
    else:
        # one 2-scalar-per-chunk readback replaces the per-chunk asserts
        ed = np.asarray(jnp.stack(edges))  # [n_chunks, 2]
        assert np.all(ed[1:, 0] > ed[:-1, 1]), "chunks overlap or reorder"
        pad_rows = jnp.zeros(
            (nb_pad - nb, rows_parts[0].shape[1]), jnp.uint32
        )
        rows_all = jnp.concatenate(rows_parts + [pad_rows])
        del rows_parts
        gbm_all = jnp.concatenate(
            gbm_parts + [jnp.full((nb_pad - nb,), INVALID, jnp.uint32)]
        )
        del gbm_parts

    (snode_rows, n_snodes, levels, n_per_level, root_mask_lo, root_mask_hi,
     T, res4h) = _assemble_above(gbm_all, nb, grid_res)

    def _cat_attr(parts):
        pad = bucket(n_voxels)
        if on_host:
            a = np.zeros(pad, np.uint32)
            a[:n_voxels] = np.concatenate(parts)
            return jnp.asarray(a)
        return jnp.concatenate(
            parts + [jnp.zeros((pad - n_voxels,), jnp.uint32)]
        )

    color = _cat_attr(col_parts) if col_parts else None
    emission = _cat_attr(emi_parts) if emi_parts else None

    if lower is None:
        lower = np.zeros(3, np.float32)
    lower = jnp.asarray(lower, jnp.float32)
    return HakoTree(
        bricks=rows_all,
        n_bricks=nb,
        levels=levels,
        n_per_level=n_per_level,
        root_mask_lo=root_mask_lo,
        root_mask_hi=root_mask_hi,
        T=T,
        res=res4h,
        grid_res=grid_res,
        lower=lower,
        upper=lower + jnp.float32(dps) * res4h,
        dps=float(dps),
        snodes=snode_rows,
        n_snodes=n_snodes,
        color=color,
        emission=emission,
        has_emission=bool(has_emission),
        n_voxels=n_voxels,
        build_stats=dict(n_unique=n_voxels, n_dumped=n_voxels,
                         grid_res=grid_res),
    )
