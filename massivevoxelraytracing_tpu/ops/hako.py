"""HakoTree: fat-leaf sparse voxel tree, the TPU round-2 performance
structure.

Measured constraints of this backend (scripts/gather_probe*.py):
  * random HBM row-gathers issue at ~60-125 M rows/s regardless of row
    WIDTH (16 B and 656 B rows cost the same), so the traversal budget is
    set by gathers-per-ray, not bytes;
  * Mosaic has no cross-sublane dynamic gather, but one-hot matmuls on the
    MXU are nearly free for tables of a few thousand rows.

Hence the structure: the bottom of the tree is a single level of FAT
BRICKS -- 16^3 voxels = a 4096-bit occupancy mask per brick, 164 u32 words
per row -- fetched with ONE wide HBM row-gather per brick visit (a ray
typically visits 2-3 bricks). Everything above the bricks is a 4^3-branching
top tree small enough to live in VMEM and be walked inside a Pallas kernel
with one-hot MXU gathers (ops/hako_kernels.py).

Brick row layout (u32 x 164):
  cols   0..127  voxel occupancy words; bit b of word w = voxel with
                 12-bit in-brick Morton index 32*w + b
  cols 128..129  coarse mask (lo, hi): bit s = sub-brick s (= words
                 2s, 2s+1, a 4^3 voxel block) is non-empty
  col  130       base: rank of the brick's first voxel in the global
                 Morton-sorted unique-voxel array (attribute indexing, the
                 role of nVoxelsPSum in the reference, voxCommon.hpp:29-36)
  col  131       brick Morton code (debug / mesh export)
  cols 132..163  per-sub-brick exclusive voxel-count prefix, packed u16x2:
                 col 132+t = prefix[2t] | prefix[2t+1] << 16

Top tree node = (mask u64 over 4^3 children, base), children contiguous in
the child level's Morton order so child index = base + popcount(mask below
cell) -- same rank trick as ops/bricktree.py. Node tables are stored
byte-split as f32 for exact one-hot bf16 MXU gathers: 11 segments of 128
lanes (4 mask_lo bytes, 4 mask_hi bytes, 3 base bytes), node n of segment k
at [n >> 7, 128 * k + (n & 127)].

Capacity: every per-level node count and the brick count must stay below
2^24 (f32-exact one-hot range) -- the same 16.7M cap the reference's
embedded-mask pointers impose (voxCommon.hpp:7-9). 2^24 bricks = 68G voxels.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bits import I32, U32, popcount32, u32

INVALID = 0xFFFFFFFF
BRICK_WORDS = 164
N_TAB_SEG = 11  # table segments: 4 + 4 + 3 bytes


def _c(x):
    return jnp.uint32(x)


# Grids above this get a fat supernode level. Default 512 since round 4:
# at 1024 the fat layout (T=1: the probe is a single root-mask walk;
# snode+brick rows both ride the megakernel's DMA-dedup fetch) replaces
# the top-level node-table gathers, whose one-hot MXU cost is linear in
# the level's node count -- measured 1.93x at 1024^3 (371.7 -> 192.5 ms
# full-frame 1080p on the canonical lattice, 2026-08-21). 256 stays
# non-fat: its only level table is a 64-node SMEM fold (already cheap).
# Env-overridable for A/B.
USE_SNODES_ABOVE = int(os.environ.get("MVRT_SNODES_ABOVE", "512"))


def use_snodes_for(grid_res: int) -> bool:
    # re-read the env var per call (ADVICE r4: the import-time read above
    # silently ignored in-process overrides set after import, e.g. sweeps).
    # Tests monkeypatch USE_SNODES_ABOVE directly and don't set the env
    # var, so the module attr stays the fallback.
    ov = os.environ.get("MVRT_SNODES_ABOVE")
    thr = int(ov) if ov is not None else USE_SNODES_ABOVE
    return grid_res > thr


def top_levels_for(grid_res: int) -> int:
    """T such that the top tree's leaf cell covers one fat row:
    without snodes, 16 * 4^T >= grid_res (leaf cell = one 16^3 brick);
    with snodes, 256 * 4^T >= grid_res (leaf cell = one 16^3-brick
    supernode covering 256^3 voxels). T >= 1."""
    leaf = 256 if use_snodes_for(grid_res) else 16
    t = 1
    while leaf * (4 ** t) < grid_res:
        t += 1
    return t


def pad_res(grid_res: int) -> int:
    leaf = 256 if use_snodes_for(grid_res) else 16
    return leaf * 4 ** top_levels_for(grid_res)


@dataclasses.dataclass
class HakoTree:
    bricks: jax.Array          # u32 [NB_pad, 164]
    n_bricks: int
    levels: tuple              # node tables for top levels 1..T-1
    n_per_level: tuple         # node counts for levels 1..T-1
    root_mask_lo: int          # root node (level T): u64 mask as 2 ints
    root_mask_hi: int
    T: int                     # top (4^3) levels above the fat rows
    res: int                   # padded: (256 if snodes else 16) * 4^T
    grid_res: int              # caller resolution
    lower: jax.Array           # f32 [3]
    upper: jax.Array           # f32 [3] = lower + dps * res
    dps: float
    snodes: jax.Array | None = None  # u32 [NS_pad, 164]: 16^3-brick
    # supernode rows (same layout as bricks; base = brick rank) for grids
    # above USE_SNODES_ABOVE -- keeps every VMEM node table small at any
    # resolution (2048^3+): the mid tree rides the same HBM row-gather
    # path as the bricks instead of a giant one-hot table
    n_snodes: int = 0
    color: jax.Array | None = None
    emission: jax.Array | None = None
    n_voxels: int = 0
    has_emission: bool = False
    build_stats: dict | None = None

    def memory_bytes(self) -> int:
        b = self.bricks.shape[0] * BRICK_WORDS * 4
        if self.snodes is not None:
            b += self.snodes.shape[0] * BRICK_WORDS * 4
        for lv in self.levels:
            b += lv.size * 4
        return b

    @property
    def n_nodes(self) -> int:
        return self.n_bricks + self.n_snodes + sum(self.n_per_level)


@partial(jax.jit, static_argnames=("n_levels",))
def _level_counts(bm, valid, *, n_levels: int):
    """Distinct counts of bm >> 6l for l = 0..n_levels (l=0: brick count)."""
    counts = []
    for l in range(n_levels + 1):
        p = bm >> _c(6 * l)
        ne = jnp.concatenate([jnp.ones((1,), bool), p[1:] != p[:-1]])
        counts.append(jnp.sum((ne & valid).astype(I32)))
    return jnp.stack(counts)


@partial(jax.jit, static_argnames=("nb_pad",))
def _build_bricks(m_hi, m_lo, n_voxels, *, nb_pad: int):
    """Sorted unique voxel Mortons -> brick rows + compacted brick Mortons."""
    p0 = m_hi.shape[0]
    idx = jnp.arange(p0, dtype=I32)
    valid = idx < n_voxels

    bm = jnp.where(valid, (m_hi << 20) | (m_lo >> 12), _c(INVALID))
    ne = jnp.concatenate([jnp.ones((1,), bool), bm[1:] != bm[:-1]])
    boundary = valid & ne
    gid = jnp.cumsum(boundary.astype(I32)) - 1
    gid = jnp.where(valid, gid, nb_pad)  # park invalid out of range

    # voxel occupancy words
    m12 = (m_lo & _c(4095)).astype(I32)
    w = m12 >> 5
    bit = _c(1) << u32(m12 & 31)
    flat = jnp.zeros((nb_pad * 128,), U32)
    flat = flat.at[jnp.where(valid, gid * 128 + w, nb_pad * 128)].add(
        bit, mode="drop"
    )
    words = flat.reshape(nb_pad, 128)

    # coarse mask: sub-brick s <-> words 2s, 2s+1. Strided lane slices, NOT
    # a [NB, 64, 2] reshape: a minor dim of 2 gets tile-padded to 128 lanes
    # (64x memory blowup -- 16 GB of HLO temp at 2048^3 scale).
    w_even = words[:, 0::2]
    w_odd = words[:, 1::2]
    occ = (w_even | w_odd) != 0
    pw = _c(1) << u32(jnp.arange(32))
    coarse_lo = jnp.sum(jnp.where(occ[:, :32], pw[None, :], _c(0)), axis=1)
    coarse_hi = jnp.sum(jnp.where(occ[:, 32:], pw[None, :], _c(0)), axis=1)

    # base = rank of first voxel; brick morton of each group
    gstart = jax.ops.segment_min(idx, gid, num_segments=nb_pad + 1)[:nb_pad]
    gstart = jnp.minimum(gstart, p0 - 1)
    n_b = jnp.sum(boundary.astype(I32))
    gv = jnp.arange(nb_pad, dtype=I32) < n_b
    base = jnp.where(gv, gstart.astype(U32), _c(0))
    g_bm = jnp.where(gv, jnp.take(bm, gstart), _c(INVALID))

    # per-sub-brick exclusive prefix of voxel counts, packed u16 pairs
    pc = popcount32(w_even) + popcount32(w_odd)
    prefix = jnp.cumsum(pc, axis=1) - pc  # exclusive, [NB, 64]
    pru = prefix.astype(U32)
    packed = pru[:, 0::2] | (pru[:, 1::2] << 16)

    rows = jnp.concatenate(
        [
            words,
            coarse_lo[:, None],
            coarse_hi[:, None],
            base[:, None],
            jnp.where(gv, g_bm, _c(0))[:, None],
            packed,
        ],
        axis=1,
    )
    return rows, g_bm, n_b


@partial(jax.jit, static_argnames=("p_out",))
def _build_top_level(t_m, n_in, *, p_out: int):
    """Group child Mortons (sorted, INVALID-padded) into 4^3 parents."""
    p_in = t_m.shape[0]
    idx = jnp.arange(p_in, dtype=I32)
    valid = idx < n_in

    p = t_m >> 6
    cell = (t_m & _c(63)).astype(I32)
    ne = jnp.concatenate([jnp.ones((1,), bool), p[1:] != p[:-1]])
    boundary = valid & ne
    gid = jnp.cumsum(boundary.astype(I32)) - 1
    gid = jnp.where(valid, gid, p_out)

    bit_lo = jnp.where(cell < 32, _c(1) << u32(jnp.minimum(cell, 31)), _c(0))
    bit_hi = jnp.where(cell >= 32, _c(1) << u32(jnp.maximum(cell - 32, 0)), _c(0))
    mask_lo = jnp.zeros((p_out + 1,), U32).at[gid].add(bit_lo)[:p_out]
    mask_hi = jnp.zeros((p_out + 1,), U32).at[gid].add(bit_hi)[:p_out]

    gstart = jax.ops.segment_min(idx, gid, num_segments=p_out + 1)[:p_out]
    gstart = jnp.minimum(gstart, p_in - 1)
    n_groups = jnp.sum(boundary.astype(I32))
    gv = jnp.arange(p_out, dtype=I32) < n_groups
    return dict(
        mask_lo=jnp.where(gv, mask_lo, _c(0)),
        mask_hi=jnp.where(gv, mask_hi, _c(0)),
        base=jnp.where(gv, gstart.astype(U32), _c(0)),
        t_m=jnp.where(gv, jnp.take(p, gstart), _c(INVALID)),
        n_groups=n_groups,
    )


# Node-table formats by level size (kernel A picks the fetch path by the
# table SHAPE; measured on-chip, scripts/hako_shell_micro.py: the one-hot
# MXU gather costs ~13 us/block even for a 56-node level -- the chunked
# small-matmul + relayout glue dominates -- while a fold_select over SMEM
# scalars is ~0.5 us and a per-row lane-gather ~3 us):
SMEM_TABLE_MAX = 64    # (1, 192) u32 in SMEM: scalar fold_select
TAA_TABLE_MAX = 2048   # (48, 128) u32 in VMEM: row taa + fold_select
FLAT_TABLE_MAX = 0     # [n_pad, 16] f32 composite one-hot (off: superseded)


def _table_segs(mask_lo, mask_hi, base):
    return [
        mask_lo & 255, (mask_lo >> 8) & 255, (mask_lo >> 16) & 255,
        (mask_lo >> 24) & 255,
        mask_hi & 255, (mask_hi >> 8) & 255, (mask_hi >> 16) & 255,
        (mask_hi >> 24) & 255,
        base & 255, (base >> 8) & 255, (base >> 16) & 255,
    ]


def _byte_split_table(mask_lo, mask_hi, base) -> np.ndarray:
    """Host: (u32, u32, u32)[n] -> f32 [rows, 11*128] byte-split table."""
    n = len(mask_lo)
    rows = max((n + 127) // 128, 1)
    tab = np.zeros((rows, N_TAB_SEG * 128), np.float32)
    r = np.arange(n) >> 7
    j = np.arange(n) & 127
    for k, s in enumerate(_table_segs(mask_lo, mask_hi, base)):
        tab[r, k * 128 + j] = s.astype(np.float32)
    return tab


def _smem_table(mask_lo, mask_hi, base) -> np.ndarray:
    """Host: u32 [1, 192] SMEM table; col i / 64+i / 128+i = node i's
    (mask_lo, mask_hi, base)."""
    n = len(mask_lo)
    t = np.zeros((1, 192), np.uint32)
    t[0, :n] = mask_lo
    t[0, 64:64 + n] = mask_hi
    t[0, 128:128 + n] = base
    return t


def _taa_table(mask_lo, mask_hi, base) -> np.ndarray:
    """Host: u32 [48, 128] VMEM table; node n of segment k at
    [16 * k + (n >> 7), n & 127]."""
    n = len(mask_lo)
    t = np.zeros((48, 128), np.uint32)
    r = np.arange(n) >> 7
    j = np.arange(n) & 127
    for k, s in enumerate((mask_lo, mask_hi, base)):
        t[16 * k + r, j] = s
    return t


def _flat_table(mask_lo, mask_hi, base) -> np.ndarray:
    """Host: f32 [n_pad, 16] node table (byte segs along lanes) for the
    composite one-hot gather: one [128, n] matmul fetches all segments of a
    node at once -- profitable while n stays small (kernel A picks the path
    by table shape)."""
    n = len(mask_lo)
    n_pad = max(-(-n // 128) * 128, 128)
    tab = np.zeros((n_pad, 16), np.float32)
    for k, s in enumerate(_table_segs(mask_lo, mask_hi, base)):
        tab[:n, k] = s.astype(np.float32)
    return tab


def _assemble_above(g_bm, nb: int, grid_res: int):
    """Everything above the brick rows, from the sorted brick Mortons alone:
    (snode_rows, n_snodes, levels, n_per_level, root_lo, root_hi, T, res4h).

    g_bm: u32 [nb_pad] sorted brick Mortons, INVALID-padded past nb. Shared
    by build_hako (which derives g_bm from the full voxel stream) and
    build_hako_stream (which never holds the full voxel stream at all)."""
    from .octree import bucket

    T = top_levels_for(grid_res)
    snody = use_snodes_for(grid_res)
    res4h = (256 if snody else 16) * 4 ** T

    nb_pad = g_bm.shape[0]
    valid_b = jnp.arange(nb_pad, dtype=I32) < nb
    bm_sorted = jnp.where(valid_b, g_bm, _c(INVALID))
    n_above = T + (2 if snody else 0)
    counts = np.asarray(_level_counts(bm_sorted, valid_b, n_levels=n_above))
    assert counts[0] == nb
    assert counts[n_above] == 1, f"root must be single, got {counts[n_above]}"

    snode_rows = None
    n_snodes = 0
    if snody:
        # supernode fat rows: run the SAME brick builder over the brick
        # mortons (bm < 2^24 fits the lo limb; hi = 0), so a supernode =
        # a 4096-bit occupancy over its 16^3 bricks with base = the rank
        # of its first brick
        ns = int(counts[2])
        assert ns < (1 << 24), f"snode count {ns} exceeds capacity"
        ns_pad = bucket(ns)
        snode_rows, g_sm, _ = _build_bricks(
            jnp.zeros_like(bm_sorted), bm_sorted, jnp.int32(nb), nb_pad=ns_pad
        )
        n_snodes = ns
        t_m0, n_in0 = g_sm, ns
        count_base = 2
    else:
        t_m0, n_in0 = bm_sorted, nb
        count_base = 0

    # top levels 1..T-1 as kernel tables; level T = root scalars
    levels = []
    n_per_level = []
    t_m, n_in = t_m0, n_in0
    lv = None
    counts = counts[count_base:]
    for l in range(1, T + 1):
        p_out = bucket(int(counts[l]))
        lv = _build_top_level(t_m, jnp.int32(n_in), p_out=p_out)
        if l < T:
            n_l = int(counts[l])
            assert n_l < (1 << 24)
            ml = np.asarray(lv["mask_lo"])[:n_l]
            mh = np.asarray(lv["mask_hi"])[:n_l]
            bs = np.asarray(lv["base"])[:n_l]
            if n_l <= SMEM_TABLE_MAX:
                make = _smem_table
            elif n_l <= TAA_TABLE_MAX:
                make = _taa_table
            elif n_l <= FLAT_TABLE_MAX:
                make = _flat_table
            else:
                make = _byte_split_table
            levels.append(jnp.asarray(make(ml, mh, bs)))
            n_per_level.append(n_l)
        t_m, n_in = lv["t_m"], int(counts[l])

    root_mask_lo = int(np.asarray(lv["mask_lo"])[0])
    root_mask_hi = int(np.asarray(lv["mask_hi"])[0])
    assert int(np.asarray(lv["base"])[0]) == 0
    return (snode_rows, n_snodes, tuple(levels), tuple(n_per_level),
            root_mask_lo, root_mask_hi, T, res4h)


def build_hako(
    m_hi, m_lo, n_voxels: int, grid_res: int, *,
    lower=None, dps: float = 1.0, color=None, emission=None,
    has_emission: bool = False,
) -> HakoTree:
    """Build from sorted unique Morton pairs (padded arrays, n_voxels valid)."""
    from .octree import bucket

    p0 = m_hi.shape[0]
    valid = jnp.arange(p0, dtype=I32) < n_voxels
    bm_all = jnp.where(valid, (m_hi << 20) | (m_lo >> 12), _c(INVALID))
    nb = int(np.asarray(_level_counts(bm_all, valid, n_levels=0))[0])
    assert nb < (1 << 24), f"brick count {nb} exceeds capacity"

    nb_pad = bucket(nb)
    rows, g_bm, _ = _build_bricks(m_hi, m_lo, jnp.int32(n_voxels), nb_pad=nb_pad)

    (snode_rows, n_snodes, levels, n_per_level, root_mask_lo, root_mask_hi,
     T, res4h) = _assemble_above(g_bm, nb, grid_res)

    if lower is None:
        lower = np.zeros(3, np.float32)
    lower = jnp.asarray(lower, jnp.float32)
    return HakoTree(
        bricks=rows,
        n_bricks=nb,
        levels=tuple(levels),
        n_per_level=tuple(n_per_level),
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
        n_voxels=int(n_voxels),
        has_emission=bool(has_emission),
    )


def voxels_from_tree(tree: HakoTree) -> np.ndarray:
    """Host: reconstruct sorted voxel Morton codes (u64) from brick rows --
    the build round-trip oracle."""
    rows = np.asarray(tree.bricks[: max(tree.n_bricks, 1)])
    out = []
    for b in range(tree.n_bricks):
        bm = int(rows[b, 131])
        words = rows[b, :128]
        for w in range(128):
            v = int(words[w])
            while v:
                bit = (v & -v).bit_length() - 1
                out.append((bm << 12) | (w << 5) | bit)
                v &= v - 1
    return np.asarray(sorted(out), np.uint64)
