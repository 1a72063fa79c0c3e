"""Pallas/Mosaic traversal kernels for the HakoTree (ops/hako.py).

Replaces the reference's stack-walk hot loop
(octreeTraverse_EfficientParametric, /root/reference/voxCommon.hpp:231-423)
with a TPU-shaped two-kernel pipeline:

  kernel A ("probe"): restart descent from the root through the VMEM top
    tree -- a bounded while_loop of probes, each T unrolled levels of
    {one-hot MXU node gather, in-order 4^3 merge-walk} -- advancing past
    dead subtrees in-kernel and emitting the next fat brick the ray enters
    (or declaring the ray exhausted). Node gathers are one-hot bf16 MXU
    matmuls over byte-split tables followed by a per-lane
    take_along_axis(axis=1) lane select (single-vreg dynamic gather -- the
    one form Mosaic supports, scripts/dyngather_probe2.py).

  XLA row-gather: ONE wide HBM gather per emitted brick (the only HBM
    random access in the whole traversal; measured 57-125 M rows/s
    regardless of width, scripts/gather_probe3.py).

  kernel B ("DDA"): hierarchical in-order walk inside the 16^3 brick --
    coarse 4^3 sub-brick merge-walk, per-lane word-pair fetch by binary
    select tree (no cross-sublane gather exists), then the 4^3 voxel walk;
    voxel rank = brick base + sub-brick prefix + popcount (the reference's
    nVoxelsPSum indexing, voxCommon.hpp:390, as pure bit math). Iterations
    are capped; capped-out lanes resume via their sub-brick t key on the
    next round (the reference's SMALL_STACK restart trick,
    voxCommon.hpp:201-212, as a t-resume instead of a stack).

The in-order scan primitive is a MERGE-WALK, not a 64-cell sweep: cells a
ray crosses in a 4^3 node form a monotone lattice path of <= 10 cells, so
10 unrolled slots of {occupancy test, first-valid record, step the axis
with the nearest crossing} visit exactly the cells the reference's
in-order traversal visits, in the same order, at ~half the VPU cost of
evaluating all 64 cells.

An XLA while_loop alternates A / gather / B until every ray hits or
exhausts. Mirroring (negative ray directions) uses the same XOR trick as
the reference (voxCommon.hpp:242-260) at every 6-bit Morton level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bits import I32, U32

MAX_FLOAT = 3.402823466e38  # python float: jnp scalars get captured as consts in kernels
from .hako import BRICK_WORDS, N_TAB_SEG, HakoTree

S_BLK = 16                 # DEFAULT sublane rows per ray block (the tunable
                           # knob is SBLK below). The driver path threads the
                           # resolved per-resolution value through an s_blk
                           # parameter and never mutates these globals
                           # (round 5; closes the ADVICE-r3 leak) -- they only
                           # serve as the default when s_blk is not passed,
                           # so hand-built kernels in scripts/ that patch
                           # hk.S_BLK/hk.RB before building keep working.
RB = S_BLK * 128           # 2048 rays per grid step (default S_BLK)
SBLK = 16                  # per-res tunable ray-block height (8 or 16): the
                           # block-cap ladder retires work at BLOCK
                           # granularity, and most rounds run lanes at 1-36%
                           # density (scripts/act_stats.py), so 128x8 strips
                           # retire dead work ~2x sooner at the same per-lane
                           # kernel rate. Measured (scripts/run_r3_matrix.sh,
                           # 2026-08-19): 8 wins at 1024^3 (381 vs 429 ms),
                           # 16 wins at 256^3 (114.6 vs 119.6 ms) -- tail
                           # structure differs per scale, so it rides
                           # TUNED_BY_RES like the other knobs.
_MASK16 = 0xFFFF
MAX_PROBES = 4             # kernel A: descents per call. The probe loop runs
                           # to the SLOWEST lane of a 2048-lane block, so huge
                           # caps multiply whole-block cost for stragglers
                           # (P=16 measured 15-20x slower than P=2-4 at
                           # 256^3); with the cheap smem/taa node fetch the
                           # sweet spot moved 2 -> 4 (scripts/hako_sweep2.py:
                           # 23.1 Mrays/s vs 21.7 at 256^3, 12.6 vs ~11 at
                           # 1024^3). Lanes needing more probes go through
                           # another round instead.
MAX_DDA_ITERS = 24         # kernel B: sub-brick visits per call (then t-resume)
CAP_DIV = 8                # round width = nb/CAP_DIV blocks (full-cap rung):
                           # 2026-08 sweep (scripts/cap_sweep.py): nb/8 beats
                           # nb/4 by 10% at 1024^3 (143.6 vs 158.2 ms) and
                           # ties at 256^3; nb/2 OOMs, nb/16 is 5-8% worse
TWO_BRICK = 0              # kernel A also emits the ray's SECOND brick
                           # within the same last-level node (~3 of 4 next
                           # bricks) and the round runs a second leaf stage
                           # on it -- halving A invocations and bookkeeping
                           # per brick visit. Non-fat grids only; unserved
                           # second bricks fall back to the single-brick
                           # resume path bit-exactly.
UNIQ = 0                   # per-block dedup-gather budget (0 disables).
                           # Rays in a block share one 128x128 pixel tile, so
                           # lockstep rounds want few DISTINCT brick rows:
                           # measured 13-48 unique ids per 2048-lane block at
                           # 256^3 (62x duplication among emitting lanes,
                           # scripts/dup_stats.py). With UNIQ=U, three
                           # per-block lax.sorts build (unique ids, per-lane
                           # rank); the HBM gather shrinks to U rows/block and
                           # kernel B regathers per lane from the U-row VMEM
                           # table with byte-split one-hot bf16 MXU matmuls
                           # (exact: products are single 0/1 x <=255 terms --
                           # kernel A's node-fetch trick). Lanes ranked past
                           # the budget defer exactly like pack overflow.
VAC_PICK = 0               # straggler-vacuum tail rung (0 disables): once
                           # <= VAC_PICK blocks are active, rounds PICK
                           # VAC_PICK blocks but lane-pack them act-first
                           # (one stable multi-operand sort, the PACK_DIV
                           # trick at round granularity) and run the WHOLE
                           # round -- kernel A, gather, kernel B -- on a
                           # VAC_RUN-block dense prefix. The block-cap
                           # ladder fixes block-level sparsity but not
                           # intra-block sparsity: measured at 256^3
                           # (scripts/act_stats.py) 70 of 83 rounds are
                           # tail rounds at 1-36% active-lane density, so
                           # kernels run 8192 lane slots for ~100 live
                           # lanes. Over-prefix active lanes defer with
                           # their state untouched (same contract as pack/
                           # dedup overflow). The vacuum rung forces
                           # pack_div=1, uniq=0 (its prefix is already
                           # dense and its gather is tiny).
VAC_RUN = 2                # blocks the vacuum rung actually runs
FUSE_BOOK = 0              # fused bookkeeping (1 enables): kernels read the
                           # persistent [nb, RB] ray/tq/resolved state rows
                           # DIRECTLY via scalar-prefetch BlockSpecs (index
                           # map block i -> sel[i]) and a tiny merge kernel
                           # with input_output_aliasing writes the round's
                           # 5 state arrays back in place -- replacing the
                           # XLA pick (11 row-takes) + put (5 row-scatters)
                           # + final where-merges, which cost ~2.2 ms of the
                           # 7.47 ms round at 1024^3 (scripts/r3_phase_split
                           # .py 2026-08-19: row-granular take/scatter on
                           # this backend prices ~1 us/row, so 16 x 128-row
                           # ops dominate the bookkeeping). Requires
                           # pack_div=1 and no vacuum rung (those paths
                           # permute lanes, which breaks sel-mapped reads).
PACK_DIV = 2               # emit-dense packing: the brick-row gather and
                           # kernel B run on cap/PACK_DIV blocks of lanes
                           # sorted emit-first (1 disables). The row gather is
                           # row-count-priced and ~84% of rows on early rounds
                           # belong to non-emitting lanes; one stable
                           # multi-operand lax.sort (the PT compaction trick,
                           # models/pathtracer.py:205-213 -- measured 3.8 ms
                           # at 3.7M lanes x 19 operands, so <1 ms here) packs
                           # emitters to the front, the gather+DDA run on the
                           # dense prefix, and a second sort by original lane
                           # position unpermutes. Emitters past the budget
                           # defer: they keep their kernel-A resume key (tqe)
                           # and re-probe to the same brick next round.


TRACE_GATHER = None  # eager-mode stats hook: scripts/dup_stats.py appends
                     # (ids, emit) per round's row gather to measure brick-id
                     # duplication within blocks (dedup-gather sizing)
TRACE_ACT = None     # eager-mode stats hook: scripts/act_stats.py appends
                     # (n_blocks_picked, act) per round to measure active-lane
                     # density inside picked blocks (kernel-A packing sizing)


# Per-resolution tuned knob table, consulted by knobs_for_res() for any
# knob whose module attr still holds its factory default -- so env/test
# patches of the module attrs override the table everywhere, while
# default runs (bench.py, scale demos, rtcamp's 128->256 res sweep) get
# the per-scale optimum. Keys are grid resolutions; lookup picks the
# nearest in log space. Values come from on-chip sweeps (sweep_r2.log).
_FACTORY = dict(CAP_DIV=8, PACK_DIV=2, UNIQ=0, TWO_BRICK=0,
                MAX_PROBES=4, MAX_DDA_ITERS=24, VAC_PICK=0, VAC_RUN=2,
                FUSE_BOOK=0, SBLK=16)
# TUNED_BY_RES_BEGIN (rewritten by scripts/pick_knobs.py --apply)
TUNED_BY_RES = {
    # SBLK/FUSE_BOOK columns: scripts/run_r3_matrix.sh 2026-08-19 (the
    # matrix measured every cell bit-identical; 256^3 prefers 16-row
    # blocks, 1024+ prefer 8-row -- the deeper scales are tail-dominated)
    256: dict(CAP_DIV=8, PACK_DIV=1, UNIQ=32, TWO_BRICK=0, MAX_PROBES=4, MAX_DDA_ITERS=24, SBLK=16),  # 18.3 Mrays/s (matrix)
    1024: dict(CAP_DIV=8, PACK_DIV=1, UNIQ=64, TWO_BRICK=1, MAX_PROBES=4, MAX_DDA_ITERS=24, SBLK=8, FUSE_BOOK=1),  # 5.5 Mrays/s (matrix)
    2048: dict(CAP_DIV=8, PACK_DIV=1, UNIQ=64, TWO_BRICK=0, MAX_PROBES=4, MAX_DDA_ITERS=24, SBLK=8),  # 10.4 Mrays/s probe-harness (matrix; FUSEB=1 was 5% worse)
}
# TUNED_BY_RES_END

# PT-profile overlay: the path tracer's wavefronts (NEE + implicit + BSDF
# concatenated, incoherent after bounce 1, straggler-heavy tails) can have
# a different knob optimum than coherent primary tiles -- e.g. UNIQ relies
# on intra-block brick duplication that secondary bounces partly destroy,
# while VAC_PICK bites hardest there (scripts/act_stats.py). Entries here
# override TUNED_BY_RES for knobs_for_res(profile="pt"); explicit module
# -attr overrides (sweeps, env) still win over both tables.
# TUNED_PT_BY_RES_BEGIN
TUNED_PT_BY_RES = {
    # EMPTIED round 5: the r2-swept 256^3 entry (CAP_DIV=8, PACK_DIV=2,
    # VAC_PICK=64, ...; 0.998 s/step) was measured on the legacy on-chip
    # PT path later found to render geometry pixels at zero radiance
    # (docs/STATUS.md round-4 note) -- its timings reflect a different
    # wavefront activity pattern than a correct render produces, so the
    # whole table is untrusted. Re-populate only from sweeps on a
    # correctness-verified path (the megakernel's tables live in
    # hako_mega.MEGA_TUNED_PT).
}
# TUNED_PT_BY_RES_END

_KNOB_TO_ARG = dict(CAP_DIV="cap_div", PACK_DIV="pack_div", UNIQ="uniq",
                    TWO_BRICK="two_brick", MAX_PROBES="max_probes",
                    MAX_DDA_ITERS="max_dda", VAC_PICK="vac_pick",
                    VAC_RUN="vac_run", FUSE_BOOK="fuse_book", SBLK="s_blk")


def _nearest_log(table, grid_res, max_ratio=None):
    """Nearest-in-log-space entry; None if the nearest key is further
    than max_ratio away (overlay entries are FULL knob dicts, so applying
    one far from its measured resolution would clobber the base table's
    per-scale knobs -- e.g. the 256^3 PT entry pins CAP_DIV=8, which is
    ~2x slower than the measured CAP_DIV=64 at 2048^3)."""
    import math

    key = min(
        table, key=lambda k: abs(math.log(k) - math.log(max(grid_res, 1)))
    )
    if max_ratio is not None:
        ratio = max(key, grid_res) / max(min(key, grid_res), 1)
        if ratio > max_ratio:
            return None
    return table[key]


def knobs_for_res(grid_res: int, profile: str = "primary") -> dict:
    """Resolved intersect_rays_hako knob kwargs for a grid resolution.

    Base-table lookups are bounded at 4x in resolution: a 16k^3 scale run
    must NOT silently inherit 2048^3 winners (TWO_BRICK/SBLK were never
    measured there) -- beyond the bound it runs factory defaults, which
    every scale tolerates."""
    tuned = {}
    if TUNED_BY_RES:
        base = _nearest_log(TUNED_BY_RES, grid_res, max_ratio=4.0)
        tuned = dict(base) if base is not None else {}
    if profile == "pt" and TUNED_PT_BY_RES:
        pt = _nearest_log(TUNED_PT_BY_RES, grid_res, max_ratio=2.0)
        if pt is not None:
            tuned.update(pt)
    out = {}
    g = globals()
    for knob, arg in _KNOB_TO_ARG.items():
        if g[knob] != _FACTORY[knob]:
            out[arg] = g[knob]            # explicit override wins
        elif knob in tuned:
            out[arg] = tuned[knob]
    return out


def _u(x):
    return x.astype(U32)


def _pc32(x):
    """popcount of u32 [S,128] (SWAR)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(I32)


def _bit_at(mask_lo, mask_hi, cell):
    c = cell.astype(I32)
    lo = (mask_lo >> _u(jnp.clip(c, 0, 31))) & jnp.uint32(1)
    hi = (mask_hi >> _u(jnp.clip(c - 32, 0, 31))) & jnp.uint32(1)
    return jnp.where(c < 32, lo, hi) == 1


def _pc64_below(mask_lo, mask_hi, cell):
    c = cell.astype(I32)
    below_lo = jnp.where(
        c >= 32, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << _u(jnp.clip(c, 0, 31))) - 1,
    )
    below_hi = jnp.where(
        c >= 32, (jnp.uint32(1) << _u(jnp.clip(c - 32, 0, 31))) - 1, jnp.uint32(0)
    )
    return _pc32(mask_lo & below_lo) + _pc32(mask_hi & below_hi)


def _stable(args, on: bool):
    """interpret-mode only: pin values so XLA fusion cannot rematerialize
    them per-consumer with different FMA contraction (which makes cell picks
    internally inconsistent at boundary ulps). Mosaic compiles each op once,
    so on-TPU kernels skip the barrier (it has no Mosaic lowering)."""
    return jax.lax.optimization_barrier(args) if on else args


def _sel4(tb, k):
    """tb: list of >= 4 arrays; pick tb[k] for per-lane k in [0, 4)."""
    return jnp.where(
        k == 0, tb[0], jnp.where(k == 1, tb[1], jnp.where(k == 2, tb[2], tb[3]))
    )


def _min3(a, b, c):
    return jnp.minimum(a, jnp.minimum(b, c))


def _max3(a, b, c):
    return jnp.maximum(a, jnp.maximum(b, c))


def _coords(c):
    cx = (c & 1) | (((c >> 3) & 1) << 1)
    cy = ((c >> 1) & 1) | (((c >> 4) & 1) << 1)
    cz = ((c >> 2) & 1) | (((c >> 5) & 1) << 1)
    return cx, cy, cz


def _cell_of(cx, cy, cz):
    """Inverse of _coords: 2-bit coords -> 6-bit Morton-layout cell index."""
    return (
        (cx & 1) | ((cy & 1) << 1) | ((cz & 1) << 2)
        | ((cx >> 1) << 3) | ((cy >> 1) << 4) | ((cz >> 1) << 5)
    )


SCAN_IMPL = "walk"  # "walk" (10-slot lattice walk) or "scan" (64-cell
#                     sweep). A third variant, the early-exit while_loop
#                     walk ('walkw'), was measured on-chip in round 3 and
#                     never won a cell; deleted in round 4 (VERDICT r3).


def _plane(t1, dc, k, stable: bool = False):
    """Cell-boundary plane tb[k] = t1 - dc * (4 - k) for a RUNTIME integer
    k in [0, 4]. Affine on demand: same expression everywhere, so every
    site reproduces the identical float, and nothing keeps 5-entry plane
    LISTS live across the walk (the lists caused massive register spilling
    -- the real kernels ran 40x slower than their visible arithmetic,
    scripts/hako_kernel_micro.py calibration).

    In interpret mode (stable=True) a barrier between the multiply and the
    subtract stops XLA from FMA-contracting SOME sites and not others,
    which would make the same (t1, dc, k) produce different floats at
    different sites and break the strict resume/tie comparisons. Mosaic
    compiles one kernel uniformly, so the TPU path skips it."""
    prod = dc * (4 - k).astype(jnp.float32)
    if stable:
        prod = jax.lax.optimization_barrier(prod)
    return t1 - prod


def _scan64_impl(mask_lo, mask_hi, vm6, t1x, t1y, t1z, dcx, dcy, dcz, t_q,
                 stable: bool = False):
    """64-cell in-order sweep (the alternative implementation of _walk64's
    contract; kept selectable for on-chip A/B tuning via SCAN_IMPL --
    its 64 cells are data-independent, which the VLIW VPU may schedule
    better than the walk's serial slot chain)."""
    from .bricktree import _CX, _CY, _CZ

    # _plane (not raw arithmetic) so stable mode pins the same floats the
    # callers re-derive -- the strict resume/tie comparisons rely on it
    tbx = [_plane(t1x, dcx, jnp.int32(k), stable) for k in range(5)]
    tby = [_plane(t1y, dcy, jnp.int32(k), stable) for k in range(5)]
    tbz = [_plane(t1z, dcz, jnp.int32(k), stable) for k in range(5)]
    tq0 = jnp.maximum(t_q, 0.0)
    best_en = jnp.full_like(t1x, MAX_FLOAT)
    best_ex = jnp.full_like(t1x, MAX_FLOAT)
    best_c = jnp.full_like(vm6, 64)
    for c in range(64):
        en = jnp.maximum(tbx[_CX[c]], jnp.maximum(tby[_CY[c]], tbz[_CZ[c]]))
        ex = jnp.minimum(
            tbx[_CX[c] + 1], jnp.minimum(tby[_CY[c] + 1], tbz[_CZ[c] + 1])
        )
        occ = _bit_at(mask_lo, mask_hi, jnp.int32(c) ^ vm6)
        valid = occ & (en < ex) & (ex > tq0)
        better = valid & (en < best_en)
        best_en = jnp.where(better, en, best_en)
        best_ex = jnp.where(better, ex, best_ex)
        best_c = jnp.where(better, jnp.int32(c), best_c)
    out = _stable((best_en, best_ex, best_c), stable)
    return out[0], out[1], out[2]


def _walk64(mask_lo, mask_hi, vm6, t1x, t1y, t1z, dcx, dcy, dcz, t_q,
            stable: bool = False):
    if SCAN_IMPL == "scan":
        return _scan64_impl(mask_lo, mask_hi, vm6, t1x, t1y, t1z,
                            dcx, dcy, dcz, t_q, stable)
    return _walk64_impl(mask_lo, mask_hi, vm6, t1x, t1y, t1z,
                        dcx, dcy, dcz, t_q, stable)


def _walk64_impl(mask_lo, mask_hi, vm6, t1x, t1y, t1z, dcx, dcy, dcz, t_q,
                 stable: bool = False):
    """First occupied cell (in-order) of a 4^3 node along the mirrored ray
    with cell exit strictly past max(t_q, 0). dc* = per-child-cell dt.
    Returns (entry, exit, cell[64=none]); callers derive any cell-boundary
    plane they need via _plane(t1, dc, k) -- exact, since _plane reproduces
    the same float the walk computed. Implemented as a 10-slot monotone
    lattice walk (a ray crosses <= 3*4-2 cells of a 4^3 grid)."""
    tq0 = jnp.maximum(t_q, 0.0)
    z4 = jnp.full_like(vm6, 4)
    z0 = jnp.zeros_like(vm6)

    def pl_(t1, dc, k):
        return _plane(t1, dc, k, stable)

    node_en = _max3(pl_(t1x, dcx, z0), pl_(t1y, dcy, z0),
                    pl_(t1z, dcz, z0))
    node_ex = _min3(t1x, t1y, t1z)
    t_start = jnp.maximum(node_en, tq0)

    def start_coord(t1, dc):
        return (
            (pl_(t1, dc, z0 + 1) <= t_start).astype(I32)
            + (pl_(t1, dc, z0 + 2) <= t_start).astype(I32)
            + (pl_(t1, dc, z0 + 3) <= t_start).astype(I32)
        )

    cx = start_coord(t1x, dcx)
    cy = start_coord(t1y, dcy)
    cz = start_coord(t1z, dcz)
    # true entry of the start cell (scan semantics report the cell's real
    # entry time, which can precede a resume key)
    en = _max3(pl_(t1x, dcx, cx), pl_(t1y, dcy, cy),
               pl_(t1z, dcz, cz))
    nx = pl_(t1x, dcx, jnp.minimum(cx + 1, z4))
    ny = pl_(t1y, dcy, jnp.minimum(cy + 1, z4))
    nz = pl_(t1z, dcz, jnp.minimum(cz + 1, z4))

    alive = t_start < node_ex
    found = jnp.zeros_like(alive)
    best_en = jnp.full_like(t1x, MAX_FLOAT)
    best_ex = jnp.full_like(t1x, MAX_FLOAT)
    best_c = jnp.full_like(vm6, 64)

    for _slot in range(10):
        ex = _min3(nx, ny, nz)
        cell = _cell_of(cx, cy, cz)
        occ = _bit_at(mask_lo, mask_hi, cell ^ vm6)
        valid = alive & occ & (en < ex) & (ex > tq0)
        take = valid & ~found
        best_en = jnp.where(take, en, best_en)
        best_ex = jnp.where(take, ex, best_ex)
        best_c = jnp.where(take, cell, best_c)
        found = found | valid
        if _slot == 9:
            break
        # step the axis whose plane is crossed first (ties: x, then y)
        sx = (nx <= ny) & (nx <= nz)
        sy = ~sx & (ny <= nz)
        sz = ~sx & ~sy
        cx = cx + sx.astype(I32)
        cy = cy + sy.astype(I32)
        cz = cz + sz.astype(I32)
        en = ex
        nx = jnp.where(
            sx & (cx < 4), pl_(t1x, dcx, jnp.minimum(cx + 1, z4)), nx
        )
        ny = jnp.where(
            sy & (cy < 4), pl_(t1y, dcy, jnp.minimum(cy + 1, z4)), ny
        )
        nz = jnp.where(
            sz & (cz < 4), pl_(t1z, dcz, jnp.minimum(cz + 1, z4)), nz
        )
        alive = alive & ~found & (cx < 4) & (cy < 4) & (cz < 4)

    out = _stable((best_en, best_ex, best_c), stable)
    return out[0], out[1], out[2]


GATHER_IMPL = "multsum"  # "multsum" (mask+reduce) or "taa" (dynamic gather)


def _gather_node_flat(tab, n_pad: int, idx):
    """Composite one-hot gather from a flat [n_pad, 16] f32 node table: ONE
    bf16-exact matmul per ray chunk fetches all 11 byte segments of a node
    at once -- ~7x cheaper than the two-level form while the level stays
    small (the [128, n] one-hot build is the linear-in-n part)."""
    idx_t = idx.T  # [128, S]
    chunk_a = []
    for ch in range(idx.shape[0]):  # block height from the data, not the
        # S_BLK module global (the megakernel traces with its own height)
        col = idx_t[:, ch:ch + 1]
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (128, n_pad), 1) == col
        ).astype(jnp.float32)
        chunk_a.append(jnp.dot(oh, tab, preferred_element_type=jnp.float32))
    segs = [
        jnp.concatenate([a[:, k:k + 1] for a in chunk_a], axis=1)
        .T.astype(jnp.int32)
        for k in range(N_TAB_SEG)
    ]  # each [S,128], values 0..255
    mask_lo = _u(segs[0]) | (_u(segs[1]) << 8) | (_u(segs[2]) << 16) | (
        _u(segs[3]) << 24
    )
    mask_hi = _u(segs[4]) | (_u(segs[5]) << 8) | (_u(segs[6]) << 16) | (
        _u(segs[7]) << 24
    )
    base = segs[8] | (segs[9] << 8) | (segs[10] << 16)
    return mask_lo, mask_hi, base


def _gather_node_smem(ref, idx):
    """Node fetch from a (1, 192) u32 SMEM table (levels <= 64 nodes):
    pure fold_select over scalar reads -- ~0.5 us/block vs ~13 us for the
    one-hot MXU path (scripts/hako_shell_micro.py)."""
    c = jnp.clip(idx.astype(I32), 0, 63)
    ml = _fold_select([ref[0, i] for i in range(64)], c, 6)
    mh = _fold_select([ref[0, 64 + i] for i in range(64)], c, 6)
    bs = _fold_select([ref[0, 128 + i] for i in range(64)], c, 6)
    return _u(ml), _u(mh), bs.astype(I32)


def _gather_node_taa(ref, rows_used: int, idx):
    """Node fetch from a (48, 128) u32 VMEM table (levels <= 2048 nodes):
    per-row lane-gather (take_along_axis along lanes, the single form
    Mosaic lowers) + fold_select over the row index."""
    tab = ref[:]
    c = idx.astype(I32)
    r = jnp.clip(c >> 7, 0, max(rows_used - 1, 0))
    j = c & 127
    outs = []
    n_pow2 = 1
    nb = 0
    while n_pow2 < rows_used:
        n_pow2 *= 2
        nb += 1
    for k in range(3):
        vals = []
        for rr in range(rows_used):
            row = tab[16 * k + rr:16 * k + rr + 1, :]  # [1, 128]
            b = jnp.broadcast_to(row, j.shape)
            vals.append(jnp.take_along_axis(b, j, axis=1))
        while len(vals) < n_pow2:
            vals.append(vals[0])
        outs.append(_fold_select(vals, r, nb) if nb else vals[0])
    return _u(outs[0]), _u(outs[1]), outs[2].astype(I32)


def _gather_node_any(tab_ref, form, idx):
    """form: ('smem', 64) | ('taa', rows_used) | ('flat', n_pad) |
    ('split', rows) -- static per level. tab_ref is the kernel REF (memory
    space depends on the form)."""
    kind, dim = form
    if kind == "smem":
        return _gather_node_smem(tab_ref, idx)
    if kind == "taa":
        return _gather_node_taa(tab_ref, dim, idx)
    if kind == "flat":
        return _gather_node_flat(tab_ref[:], dim, idx)
    return _gather_node(tab_ref[:], dim, idx)


def tab_spec(form):
    """BlockSpec for a level table by its (kind, dim) form."""
    kind, dim = form
    if kind == "smem":
        return pl.BlockSpec((1, 192), _rep, memory_space=pltpu.SMEM)
    if kind == "taa":
        return pl.BlockSpec((48, 128), _rep, memory_space=pltpu.VMEM)
    if kind == "flat":
        return pl.BlockSpec((dim, 16), _rep, memory_space=pltpu.VMEM)
    return pl.BlockSpec((dim, N_TAB_SEG * 128), _rep, memory_space=pltpu.VMEM)


def _gather_node(tab, rows_n: int, idx):
    """One-hot MXU gather of (mask_lo, mask_hi, base) for per-lane node
    indices idx [S,128] from a byte-split f32 table [rows_n, 11*128]:
    row select = one-hot matmul (bf16-exact, all values <= 255), lane
    select = take_along_axis along lanes (single-vreg dynamic gather)."""
    idx_t = idx.T  # [128, S]
    segcols = [[] for _ in range(N_TAB_SEG)]
    for ch in range(idx.shape[0]):  # block height from the data (see
        # _gather_node_flat)
        rcol = idx_t[:, ch:ch + 1] >> 7
        lcol = idx_t[:, ch:ch + 1] & 127
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (128, rows_n), 1) == rcol
        ).astype(jnp.float32)
        a = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
        if GATHER_IMPL == "taa":
            lfull = jnp.broadcast_to(lcol, (128, 128))  # Mosaic gather wants
            for k in range(N_TAB_SEG):                  # idx.shape == operand's
                segcols[k].append(
                    jnp.take_along_axis(
                        a[:, k * 128:(k + 1) * 128], lfull, axis=1
                    )[:, :1]
                )
        else:
            lm = (
                jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) == lcol
            ).astype(jnp.float32)
            for k in range(N_TAB_SEG):
                segcols[k].append(
                    jnp.sum(a[:, k * 128:(k + 1) * 128] * lm, axis=1,
                            keepdims=True)
                )
    segs = [
        jnp.concatenate(cs, axis=1).T.astype(jnp.int32) for cs in segcols
    ]  # each [S,128], values 0..255
    mask_lo = _u(segs[0]) | (_u(segs[1]) << 8) | (_u(segs[2]) << 16) | (
        _u(segs[3]) << 24
    )
    mask_hi = _u(segs[4]) | (_u(segs[5]) << 8) | (_u(segs[6]) << 16) | (
        _u(segs[7]) << 24
    )
    base = segs[8] | (segs[9] << 8) | (segs[10] << 16)
    return mask_lo, mask_hi, base


def _ray_preamble(lov, upv, ro, rd, stable: bool = False):
    """Mirrored parametrization (voxCommon.hpp:242-269 TPU form, identical
    to ops/bricktree.py): returns per-axis (t0, t1, dt) + vm6 + enter_ok.
    lov/upv: python lists of 3 scalar values (read from SMEM)."""
    t0, t1, dt = [], [], []
    vm6 = jnp.zeros_like(ro[0], dtype=I32)
    pat = (0b001001, 0b010010, 0b100100)
    for a in range(3):
        lo = lov[a]
        up = upv[a]
        inv = 1.0 / rd[a]
        neg = inv < 0.0
        rom = jnp.where(neg, lo + up - ro[a], ro[a])
        bound = (0.25 * MAX_FLOAT) / jnp.maximum(
            jnp.maximum(jnp.abs(lo - rom), jnp.abs(up - rom)), 1.0
        )
        inva = jnp.minimum(jnp.abs(inv), bound)
        t0a = (lo - rom) * inva
        t1a = (up - rom) * inva
        t0.append(t0a)
        t1.append(t1a)
        dt.append(t1a - t0a)
        vm6 = vm6 | jnp.where(neg, jnp.int32(pat[a]), jnp.int32(0))
    enter_ok = _min3(*t1) >= jnp.maximum(t0[0], jnp.maximum(t0[1], t0[2]))
    out = _stable(tuple(t0 + t1 + dt + [vm6, enter_ok]), stable)
    return list(out[0:3]), list(out[3:6]), list(out[6:9]), out[9], out[10]


# ---------------------------------------------------------------------------
# kernel A: restart probe through the top tree (multi-probe)
# ---------------------------------------------------------------------------

def _probe_from_root(tabs, level_rows, T, t1, dt, vm6, rt_ml, rt_mh,
                     need0, exhausted0, t_q0, *, max_probes: int,
                     stable: bool, twob: bool):
    """The probe while-loop shared by kernel A and the megakernel
    (ops/hako_mega.py): restart descents from the root through the VMEM top
    tree, emitting each active lane's next fat row (or exhaustion). Pure
    code motion out of _make_kernel_a -- the floats are bit-identical.

    Returns (need, tq_new, emit, brick, bt1x, bt1y, bt1z, tqe, exhausted
    [, emit2, brick2, b2x, b2y, b2z])."""
    zf = jnp.zeros_like(t1[0])
    zi = jnp.zeros_like(vm6)

    def probe_body(st):
        if twob:
            (need_i, t_q, emit_i, brick, bt1x, bt1y, bt1z, tqe, exh_i,
             emit2_i, brick2, b2x, b2y, b2z, p) = st
            emit2 = emit2_i != 0
        else:
            (need_i, t_q, emit_i, brick, bt1x, bt1y, bt1z, tqe, exh_i,
             p) = st
        need = need_i != 0
        emit = emit_i != 0
        exh = exh_i != 0
        ok = need
        mask_lo, mask_hi = rt_ml, rt_mh
        base = zi
        cur = [t1[0], t1[1], t1[2]]
        dc = [dt[0] * 0.25, dt[1] * 0.25, dt[2] * 0.25]
        tq_new = t_q

        for depth in range(T):
            en, ex, c, = _walk64(
                mask_lo, mask_hi, vm6, cur[0], cur[1], cur[2],
                dc[0], dc[1], dc[2], t_q, stable=stable,
            )
            found = ok & (c < 64)
            dead = ok & ~found
            node_exit = _min3(cur[0], cur[1], cur[2])
            tq_new = jnp.where(dead, node_exit, tq_new)
            if depth == 0:
                exh = exh | dead
            ok = found

            cx, cy, cz = _coords(c)
            k4 = jnp.full_like(c, 4)
            nt1x = _plane(cur[0], dc[0], jnp.minimum(cx + 1, k4), stable)
            nt1y = _plane(cur[1], dc[1], jnp.minimum(cy + 1, k4), stable)
            nt1z = _plane(cur[2], dc[2], jnp.minimum(cz + 1, k4), stable)
            rank = _pc64_below(mask_lo, mask_hi, c ^ vm6)
            child = base + rank

            if depth == T - 1:
                emit = emit | ok
                brick = jnp.where(ok, child, brick)
                bt1x = jnp.where(ok, nt1x, bt1x)
                bt1y = jnp.where(ok, nt1y, bt1y)
                bt1z = jnp.where(ok, nt1z, bt1z)
                tqe = jnp.where(ok, t_q, tqe)
                tq_new = jnp.where(ok, _min3(nt1x, nt1y, nt1z), tq_new)
                if twob:
                    # second brick in the SAME node: walk again keyed
                    # past the first brick's exit
                    tq2 = _min3(nt1x, nt1y, nt1z)
                    _, _, c2 = _walk64(
                        mask_lo, mask_hi, vm6, cur[0], cur[1], cur[2],
                        dc[0], dc[1], dc[2], tq2, stable=stable,
                    )
                    found2 = ok & (c2 < 64)
                    c2x, c2y, c2z = _coords(c2)
                    n2x = _plane(cur[0], dc[0],
                                 jnp.minimum(c2x + 1, k4), stable)
                    n2y = _plane(cur[1], dc[1],
                                 jnp.minimum(c2y + 1, k4), stable)
                    n2z = _plane(cur[2], dc[2],
                                 jnp.minimum(c2z + 1, k4), stable)
                    rank2 = _pc64_below(mask_lo, mask_hi, c2 ^ vm6)
                    emit2 = emit2 | found2
                    brick2 = jnp.where(found2, base + rank2, brick2)
                    b2x = jnp.where(found2, n2x, b2x)
                    b2y = jnp.where(found2, n2y, b2y)
                    b2z = jnp.where(found2, n2z, b2z)
            else:
                childc = jnp.where(ok, child, 0)
                mask_lo, mask_hi, base = _stable(_gather_node_any(
                    tabs[depth], level_rows[depth], childc
                ), stable)
                cur = [nt1x, nt1y, nt1z]
                dc = [dc[0] * 0.25, dc[1] * 0.25, dc[2] * 0.25]

        need = need & ~emit & ~exh
        if twob:
            return (need.astype(I32), tq_new, emit.astype(I32), brick,
                    bt1x, bt1y, bt1z, tqe, exh.astype(I32),
                    emit2.astype(I32), brick2, b2x, b2y, b2z, p + 1)
        return (need.astype(I32), tq_new, emit.astype(I32), brick,
                bt1x, bt1y, bt1z, tqe, exh.astype(I32), p + 1)

    def probe_cond(st):
        need = st[0]
        p = st[-1]
        return jnp.any(need != 0) & (p < max_probes)

    init = (need0.astype(I32), t_q0, jnp.zeros_like(vm6), zi, zf, zf, zf,
            t_q0, exhausted0.astype(I32))
    if twob:
        init = init + (zi, zi, zf, zf, zf)
    out = jax.lax.while_loop(
        probe_cond, probe_body, init + (jnp.int32(0),)
    )
    return out[:14] if twob else out[:9]


def _make_kernel_a(T: int, level_rows: tuple, stable: bool = False,
                   max_probes: int | None = None, twob: bool = False,
                   fused: bool = False):
    """twob: also emit the SECOND brick along the ray within the same
    last-level node (a second _walk64 keyed past the first brick's exit),
    so the driver can chain two leaf stages per probe round -- halving
    kernel-A invocations and bookkeeping per brick visit. ~3 of 4 next
    bricks lie in the same 4^3 node (the 4th crosses a node face and
    re-probes as usual).

    fused (FUSE_BOOK): the kernel leads with (sel, real) scalar-prefetch
    refs, its ray/tq state inputs arrive sel-mapped straight from the
    persistent [nb*S_BLK, 128] state (no XLA pick), and the activity mask
    input is the raw RESOLVED row (act = resolved==0 & real[i]) instead of
    a precomputed act array."""
    if max_probes is None:
        max_probes = MAX_PROBES  # read at build time so tests can patch it
    n_tabs = T - 1
    assert len(level_rows) == n_tabs

    def kernel(*allrefs):
        if fused:
            sel_ref, real_ref, si_ref, sf_ref = allrefs[:4]
            refs = allrefs[4:]
        else:
            si_ref, sf_ref = allrefs[:2]
            refs = allrefs[2:]
        tabs = refs[:n_tabs]
        if twob:
            (rox, roy, roz, rdx, rdy, rdz, tq_ref, act_ref,
             emit_ref, brick_ref, bt1x_ref, bt1y_ref, bt1z_ref,
             tqe_ref, tqn_ref, exh_ref,
             emit2_ref, brick2_ref, b2x_ref, b2y_ref,
             b2z_ref) = refs[n_tabs:]
        else:
            (rox, roy, roz, rdx, rdy, rdz, tq_ref, act_ref,
             emit_ref, brick_ref, bt1x_ref, bt1y_ref, bt1z_ref,
             tqe_ref, tqn_ref, exh_ref) = refs[n_tabs:]

        ro = (rox[:], roy[:], roz[:])
        rd = (rdx[:], rdy[:], rdz[:])
        lov = [sf_ref[0, a] for a in range(3)]
        upv = [sf_ref[0, 3 + a] for a in range(3)]
        t0, t1, dt, vm6, enter_ok = _ray_preamble(lov, upv, ro, rd, stable)

        if fused:
            # act_ref holds the sel-mapped RESOLVED row; fill slots
            # (sel clipped onto block nb-1) deactivate via real[i]
            act = (act_ref[:] == 0) & (real_ref[pl.program_id(0)] != 0)
        else:
            act = act_ref[:] != 0
        rt_ml = _u(jnp.full_like(vm6, si_ref[0, 0])) | (
            _u(jnp.full_like(vm6, si_ref[0, 1])) << 16
        )
        rt_mh = _u(jnp.full_like(vm6, si_ref[0, 2])) | (
            _u(jnp.full_like(vm6, si_ref[0, 3])) << 16
        )

        t_q0 = tq_ref[:]
        exhausted0 = act & ~enter_ok
        need0 = act & enter_ok

        out = _probe_from_root(
            tabs, level_rows, T, t1, dt, vm6, rt_ml, rt_mh,
            need0, exhausted0, t_q0,
            max_probes=max_probes, stable=stable, twob=twob,
        )
        (need, tq_new, emit, brick, bt1x, bt1y, bt1z, tqe,
         exhausted) = out[:9]

        emit_ref[:] = emit
        brick_ref[:] = jnp.where(emit != 0, brick, 0)
        bt1x_ref[:] = bt1x
        bt1y_ref[:] = bt1y
        bt1z_ref[:] = bt1z
        tqe_ref[:] = tqe
        tqn_ref[:] = tq_new
        exh_ref[:] = exhausted
        if twob:
            emit2, brick2, b2x, b2y, b2z = out[9:14]
            emit2_ref[:] = emit2
            brick2_ref[:] = jnp.where(emit2 != 0, brick2, 0)
            b2x_ref[:] = b2x
            b2y_ref[:] = b2y
            b2z_ref[:] = b2z

    return kernel


# ---------------------------------------------------------------------------
# kernel B: in-brick hierarchical DDA
# ---------------------------------------------------------------------------

def _fold_select(items, sel_bits, nbits):
    """Binary-select items[i] by per-lane index bits (list halving)."""
    cur = list(items)
    for b in range(nbits - 1, -1, -1):
        cond = ((sel_bits >> b) & 1) == 1
        half = len(cur) // 2
        cur = [jnp.where(cond, cur[i + half], cur[i]) for i in range(half)]
    return cur[0]


def _dda_rows(w_ref, m_ref, dt, vm6, bt1, tqe0, go, *, dt_factor: float,
              shadow: bool, leaf: bool, stable: bool, max_iters: int):
    """The in-row hierarchical DDA while-loop shared by kernel B and the
    megakernel (ops/hako_mega.py): walk the 16^3 row whose per-lane words
    sit word-major in w_ref/m_ref scratch. Pure code motion out of
    _make_kernel_b -- the floats are bit-identical.

    Returns (hit, t_hit, nmaj, vr, p3, tqp, more, tqr)."""
    dtb = [dt[a] * dt_factor for a in range(3)]
    dcs = [d * 0.25 for d in dtb]     # coarse (4^3-of-cells) dt
    dcv = [d * 0.0625 for d in dtb]   # fine cell dt

    coarse_lo = m_ref[0]
    coarse_hi = m_ref[1]
    base = m_ref[2].astype(I32)

    zi = jnp.zeros_like(vm6)
    zf = jnp.zeros_like(bt1[0])

    def cond(st):
        return jnp.any(st[0] != 0) & (st[-1] < max_iters)

    def body(st):
        active_i, sub_tq, hit_i, t_hit, nmaj, vr, p3, tqp, i = st
        active = active_i != 0
        hit = hit_i != 0
        en_s, ex_s, cs = _walk64(
            coarse_lo, coarse_hi, vm6, bt1[0], bt1[1], bt1[2],
            dcs[0], dcs[1], dcs[2], sub_tq, stable=stable,
        )
        found_s = active & (cs < 64)
        s_real = jnp.where(found_s, cs ^ vm6, 0)

        w_lo = _fold_select([w_ref[2 * s] for s in range(64)], s_real, 6)
        w_hi = _fold_select(
            [w_ref[2 * s + 1] for s in range(64)], s_real, 6
        )

        sx, sy, sz = _coords(cs)
        k4 = jnp.full_like(cs, 4)
        st1x = _plane(bt1[0], dcs[0], jnp.minimum(sx + 1, k4), stable)
        st1y = _plane(bt1[1], dcs[1], jnp.minimum(sy + 1, k4), stable)
        st1z = _plane(bt1[2], dcs[2], jnp.minimum(sz + 1, k4), stable)

        en_v, ex_v, cv = _walk64(
            w_lo, w_hi, vm6, st1x, st1y, st1z,
            dcv[0], dcv[1], dcv[2], sub_tq, stable=stable,
        )
        found_v = found_s & (cv < 64)
        # leaf: a voxel behind the origin is skipped (en must be
        # strictly ahead); emit: any child row whose interval passes
        # the resume key is the next one to walk
        is_hit = found_v & (en_v > 0.0) if leaf else found_v

        vx, vy, vz = _coords(cv)

        if leaf and shadow:
            vrank = zi
        else:
            pk = _fold_select(
                [m_ref[4 + t] for t in range(32)], s_real >> 1, 5
            )
            pref = jnp.where(
                (s_real & 1) == 1, pk >> 16, pk & jnp.uint32(_MASK16)
            ).astype(I32)
            within = _pc64_below(w_lo, w_hi, cv ^ vm6)
            vrank = base + pref + within

        hit = hit | is_hit
        vr = jnp.where(is_hit, vrank, vr)
        if leaf:
            en_xa = _plane(st1x, dcv[0], vx, stable)
            en_ya = _plane(st1y, dcv[1], vy, stable)
            nm = jnp.where(
                en_v == en_xa, 1, jnp.where(en_v == en_ya, 2, 0)
            )
            t_hit = jnp.where(is_hit, en_v, t_hit)
            nmaj = jnp.where(is_hit, nm, nmaj)
        else:
            # child-row cell EXIT planes become the bt1 of the next
            # fat stage (affine from this stage's planes: exact)
            k4v = jnp.full_like(cv, 4)
            cp1 = _plane(st1x, dcv[0], jnp.minimum(vx + 1, k4v), stable)
            cp2 = _plane(st1y, dcv[1], jnp.minimum(vy + 1, k4v), stable)
            cp3 = _plane(st1z, dcv[2], jnp.minimum(vz + 1, k4v), stable)
            t_hit = jnp.where(is_hit, cp1, t_hit)
            nmaj = jnp.where(
                is_hit, jax.lax.bitcast_convert_type(cp2, I32), nmaj
            )
            p3 = jnp.where(is_hit, cp3, p3)
            tqp = jnp.where(is_hit, sub_tq, tqp)

        skipped = found_v & ~is_hit          # origin-inside voxel
        no_vox = found_s & ~found_v          # coarse cell had nothing left
        sub_tq = jnp.where(
            skipped, ex_v, jnp.where(no_vox, jnp.maximum(sub_tq, ex_s), sub_tq)
        )
        active = found_s & ~is_hit
        return (active.astype(I32), sub_tq, hit.astype(I32), t_hit,
                nmaj, vr, p3, tqp, i + 1)

    init = (go.astype(I32), tqe0, jnp.zeros_like(vm6),
            zf + MAX_FLOAT, zi - 1, zi, zf, zf, jnp.int32(0))
    active, sub_tq, hit, t_hit, nmaj, vr, p3, tqp, _ = jax.lax.while_loop(
        cond, body, init
    )
    return hit, t_hit, nmaj, vr, p3, tqp, active, sub_tq


def _resolve_sblk(s_blk):
    """(S_BLK, RB) for this build: explicit arg wins, else the module
    defaults (so scripts that patch hk.S_BLK before hand-building kernels
    keep working). Callers bind the result to LOCALS named S_BLK/RB,
    shadowing the globals for every read and nested closure below --
    no module state is ever mutated on the driver path."""
    v = int(s_blk) if s_blk else S_BLK
    return v, v * 128


def _make_kernel_b(T: int, shadow: bool, stable: bool = False,
                   max_iters: int | None = None, leaf: bool = True,
                   dedup_u: int = 0, fused: bool = False,
                   s_blk: int | None = None):
    """leaf=True: walk a 16^3-VOXEL brick, report the first voxel hit.
    leaf=False: walk a 16^3-BRICK supernode row (same layout), EMIT the
    first brick whose interval passes the resume key -- outputs mirror
    kernel A's (emit, child, cell planes, tq) so the driver chains
    another row-gather + leaf stage behind it.
    (An in-kernel state-merge variant -- prev t/nmaj/vidx/resolved as
    inputs, 5 final arrays as outputs -- was tried 2026-08-17 and measured
    ~10% SLOWER at 256^3 and 1024^3 than leaving the where-merges to XLA:
    the extra pallas input blocks cost more than the saved XLA pass.)"""
    if max_iters is None:
        max_iters = MAX_DDA_ITERS  # read at build time so tests can patch it
    S_BLK, RB = _resolve_sblk(s_blk)  # locals shadow the globals (see helper)
    dt_factor = 0.25 ** T  # fat-row extent / root extent per axis

    def kernel(*toprefs):
        if fused:
            # fused mode leads with the (sel, real) prefetch refs; the six
            # ray inputs arrive sel-mapped from the persistent state (real
            # is unused here -- go already masks fill slots)
            sf_ref = toprefs[2]
            allrefs = toprefs[3:]
        else:
            sf_ref = toprefs[0]
            allrefs = toprefs[1:]
        if dedup_u:
            u0_ref, u1_ref, u2_ref, u3_ref, rank_ref = allrefs[:5]
            refs = allrefs[5:]
        else:
            wl_ref, ml_ref = allrefs[:2]
            refs = allrefs[2:]
        (rox, roy, roz, rdx, rdy, rdz,
         bt1x_ref, bt1y_ref, bt1z_ref, tqe_ref, go_ref,
         hit_ref, t_ref, nmaj_ref, vr_ref, p3_ref, tqp_ref,
         more_ref, tqr_ref, w_ref, m_ref) = refs

        if dedup_u:
            # regather this block's rows from the U-row unique table:
            # word-major [words, lanes] comes straight out of
            # uniq[words, U] @ onehot[U, lanes] -- no transpose stage.
            # Byte-split bf16 keeps every term a single 0/1 x <=255
            # product (exact; same trick as the node tables).
            U = dedup_u
            rk = rank_ref[:].reshape(1, S_BLK * 128)
            oh = (
                jax.lax.broadcasted_iota(I32, (U, S_BLK * 128), 0) == rk
            ).astype(jnp.bfloat16)
            acc = None
            for b, uref in enumerate((u0_ref, u1_ref, u2_ref, u3_ref)):
                # Mosaic has no f32->u32 cast; hop through i32 (values
                # are exact byte sums in [0, 255], so i32 is lossless)
                pb = jnp.dot(
                    uref[0], oh, preferred_element_type=jnp.float32
                ).astype(jnp.int32).astype(jnp.uint32) << (8 * b)
                acc = pb if acc is None else acc | pb
            full = acc.reshape(BRICK_WORDS, S_BLK, 128)
            w_ref[:, :, :] = full[:128]
            m_ref[:, :, :] = full[128:]
        else:
            # rows arrive LANE-major straight from the XLA take ([RB,
            # words] per block); transpose to word-major in VMEM here.
            # This kills the XLA .T between take and kernel, which cost an
            # extra HBM read+write of the full row buffer (~4.7 ms per
            # 524K-lane round, measured 2026-08-17: take 8.3 ms alone vs
            # 13.0 ms fused with .T)
            for s in range(S_BLK):
                w_ref[:, s, :] = wl_ref[0, s * 128:(s + 1) * 128, :].T
                m_ref[:, s, :] = ml_ref[0, s * 128:(s + 1) * 128, :].T

        ro = (rox[:], roy[:], roz[:])
        rd = (rdx[:], rdy[:], rdz[:])
        lov = [sf_ref[0, a] for a in range(3)]
        upv = [sf_ref[0, 3 + a] for a in range(3)]
        _, _, dt, vm6, _ = _ray_preamble(lov, upv, ro, rd, stable)

        bt1 = [bt1x_ref[:], bt1y_ref[:], bt1z_ref[:]]
        go = go_ref[:] != 0

        hit, t_hit, nmaj, vr, p3, tqp, active, sub_tq = _dda_rows(
            w_ref, m_ref, dt, vm6, bt1, tqe_ref[:], go,
            dt_factor=dt_factor, shadow=shadow, leaf=leaf,
            stable=stable, max_iters=max_iters,
        )

        hit_ref[:] = hit.astype(I32)
        t_ref[:] = t_hit
        nmaj_ref[:] = nmaj
        vr_ref[:] = vr
        p3_ref[:] = p3
        tqp_ref[:] = tqp
        # lanes still working the row when the iteration cap struck
        # resume from their coarse-cell key on the next round
        more_ref[:] = active
        tqr_ref[:] = sub_tq

    return kernel


# ---------------------------------------------------------------------------
# XLA orchestration
# ---------------------------------------------------------------------------

def _blk(i, *_prefetch):
    return (i, 0)


def _rep(i, *_prefetch):
    return (0, 0)


def _selblk(i, sel_ref, *_prefetch):
    """Block index map for sel-mapped state reads/writes (FUSE_BOOK):
    grid step i touches block sel[i] of the persistent [nb*S_BLK, 128]
    state. sel is pre-clipped to nb-1 by the driver; fill slots carry
    real[i]=0 and write their old block back unchanged."""
    return (sel_ref[i], 0)


def _make_merge_kernel(twb: bool):
    """FUSE_BOOK put stage: computes the round's final where-merges and
    writes the 5 state arrays IN PLACE (input_output_aliasing + sel-mapped
    out blocks) -- replacing the XLA pick of the old rows, the elementwise
    merge pass, and the 5 row-scatters. Mirrors _make_round.body lines
    'go = emit * act' .. 'put(...)' exactly (bit-identical floats: the
    same jnp expressions on the same inputs)."""

    def kernel(sel_ref, real_ref, *refs):
        (res_o, tq_o, t_o, nm_o, vi_o,
         emit, tqe, bt1x, bt1y, bt1z, tqn, exh,
         served2, hit, t_hit, nmaj, vr, more, tqr) = refs[:19]
        k = 19
        if twb:
            (b2x, b2y, b2z, srv_b2, hit_b, t_b, nm_b, vr_b,
             more_b, tqr_b) = refs[k:k + 10]
            k += 10
        (res_ref, tq_ref, t_ref, nm_ref, vi_ref) = refs[k:k + 5]

        act = (res_o[:] == 0) & (real_ref[pl.program_id(0)] != 0)
        go = (emit[:] != 0) & act
        tqn_v = jnp.where(
            go & (served2[:] == 0),
            tqe[:],
            jnp.where(
                go,
                jnp.where(more[:] != 0, tqr[:],
                          _min3(bt1x[:], bt1y[:], bt1z[:])),
                tqn[:],
            ),
        )
        hit_v = hit[:] != 0
        t_v = t_hit[:]
        nm_v = nmaj[:]
        vr_v = vr[:]
        if twb:
            sb2 = srv_b2[:] != 0
            tqn_v = jnp.where(
                sb2,
                jnp.where(more_b[:] != 0, tqr_b[:],
                          _min3(b2x[:], b2y[:], b2z[:])),
                tqn_v,
            )
            hit2 = sb2 & (hit_b[:] != 0)
            t_v = jnp.where(hit2, t_b[:], t_v)
            nm_v = jnp.where(hit2, nm_b[:], nm_v)
            vr_v = jnp.where(hit2, vr_b[:], vr_v)
            hit_v = hit_v | hit2
        newhit = act & hit_v
        res_ref[:] = jnp.where(
            act & (newhit | (exh[:] != 0)), jnp.int32(1), res_o[:]
        )
        tq_ref[:] = jnp.where(act, tqn_v, tq_o[:])
        t_ref[:] = jnp.where(newhit, t_v, t_o[:])
        nm_ref[:] = jnp.where(newhit, nm_v, nm_o[:])
        vi_ref[:] = jnp.where(newhit, vr_v, vi_o[:])

    return kernel


def _make_round(
    bricks, snodes, tabs, scal_i, sf, rays_b, *,
    nb: int, cap: int, T: int, level_rows: tuple, shadow: bool,
    interpret: bool, pack_div: int, uniq: int,
    max_probes: int, max_dda: int, two_brick: bool = False,
    run_cap: int | None = None, s_blk: int | None = None,
):
    """Builds one traversal-round function over BLOCK-compacted state.

    Per-ray state lives as [nb, RB] block rows; every round picks up to
    `cap` still-active ray BLOCKS (jnp.nonzero over per-block flags, with a
    round-robin rotation so long-running blocks cannot starve the rest) and
    runs probe kernel -> HBM brick-row gather -> DDA kernel on just those.
    Block-granule takes move 8 KB rows, so compaction costs ~nothing at this
    backend's per-row gather pricing. Lane-granular compaction (nonzero over
    all lanes + per-lane scatter back) was tried and is 15-18x SLOWER end to
    end on this backend: 2M-index gathers/scatters of 7 state arrays run on
    the scalar core and cost ~100 ms per round at full width (measured
    2.5 s/frame vs 137 ms for the identical kernels, 2026-08 session logs).

    run_cap < cap ("vacuum" mode, VAC_PICK/VAC_RUN): the round still PICKS
    cap blocks, but lane-packs them act-first with ONE stable multi-operand
    lax.sort (rides the vectorized merge passes, NOT the scalar-core
    nonzero/scatter path above) and runs kernels + gather on a run_cap-block
    dense prefix; a second sort by original lane position unpermutes.
    Active lanes ranked past the prefix defer with their state untouched.
    """
    S_BLK, RB = _resolve_sblk(s_blk)  # locals shadow the globals (see helper)
    rcap = run_cap if (run_cap is not None and run_cap < cap) else cap
    vac = rcap < cap
    grid = rcap
    s2 = rcap * S_BLK          # kernel working width
    s2f = cap * S_BLK          # full picked width
    shape = (s2, 128)
    bcap = max(rcap // pack_div, 1) if pack_div > 1 else rcap
    pack = bcap < rcap
    s2b = bcap * S_BLK

    smem = pl.BlockSpec((1, 8), _rep, memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((S_BLK, 128), _blk, memory_space=pltpu.VMEM)
    tab_specs = [tab_spec(f) for f in level_rows]

    fat = snodes is not None
    twb = bool(two_brick) and not fat  # fat path stays single-brick
    a_outs = [
        jax.ShapeDtypeStruct(shape, I32),          # emit
        jax.ShapeDtypeStruct(shape, I32),          # brick
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1x
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1y
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1z
        jax.ShapeDtypeStruct(shape, jnp.float32),  # tq_emit
        jax.ShapeDtypeStruct(shape, jnp.float32),  # tq_new
        jax.ShapeDtypeStruct(shape, I32),          # exhausted
    ]
    if twb:
        a_outs += [
            jax.ShapeDtypeStruct(shape, I32),          # emit2
            jax.ShapeDtypeStruct(shape, I32),          # brick2
            jax.ShapeDtypeStruct(shape, jnp.float32),  # b2x
            jax.ShapeDtypeStruct(shape, jnp.float32),  # b2y
            jax.ShapeDtypeStruct(shape, jnp.float32),  # b2z
        ]
    a_call = pl.pallas_call(
        _make_kernel_a(T, level_rows, stable=interpret,
                       max_probes=max_probes, twob=twb),
        grid=(grid,),
        in_specs=[smem, smem] + tab_specs + [vblk] * 8,
        out_specs=[vblk] * len(a_outs),
        out_shape=a_outs,
        interpret=interpret,
    )

    # brick rows ride as TWO gathers (128 occupancy words + 36 metadata
    # words): jnp.take of rows wider than one 128-lane tile prices ~4x
    # per row (11.2 ms vs 2×~3 ms per 524K rows, scripts/gather_price2.py).
    # They arrive LANE-major ([RB, words] blocks) and kernel B transposes
    # them to word-major in VMEM itself (see _make_kernel_b).
    wblk_a = pl.BlockSpec(
        (1, RB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    wblk_m = pl.BlockSpec(
        (1, RB, BRICK_WORDS - 128), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    ublk = pl.BlockSpec(
        (1, BRICK_WORDS, max(uniq, 1)), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def make_b(dt_exp, leaf):
        # with packing, kernel B runs on the bcap-block dense prefix
        bshape = (s2b, 128)
        row_specs = (
            [ublk] * 4 + [vblk] if uniq else [wblk_a, wblk_m]
        )
        return pl.pallas_call(
            _make_kernel_b(dt_exp, shadow, stable=interpret, leaf=leaf,
                           dedup_u=uniq, max_iters=max_dda, s_blk=S_BLK),
            grid=(bcap,),
            in_specs=[smem] + row_specs + [vblk] * 11,
            scratch_shapes=[
                pltpu.VMEM((128, S_BLK, 128), jnp.uint32),
                pltpu.VMEM((BRICK_WORDS - 128, S_BLK, 128), jnp.uint32),
            ],
            out_specs=[vblk] * 8,
            out_shape=[
                jax.ShapeDtypeStruct(bshape, I32),          # hit / emit
                jax.ShapeDtypeStruct(bshape, jnp.float32),  # t / plane x
                jax.ShapeDtypeStruct(bshape, I32),          # nmajor / plane y
                jax.ShapeDtypeStruct(bshape, I32),          # vrank / child
                jax.ShapeDtypeStruct(bshape, jnp.float32),  # plane z (emit)
                jax.ShapeDtypeStruct(bshape, jnp.float32),  # tq pass (emit)
                jax.ShapeDtypeStruct(bshape, I32),          # more (iter-capped)
                jax.ShapeDtypeStruct(bshape, jnp.float32),  # resume sub_tq
            ],
            interpret=interpret,
        )

    # the supernode stage walks with the TOP-tree leaf extent; the brick
    # stage below it is 16x finer per axis (= 2 more 4^3 levels)
    b_leaf = make_b(T + 2 if fat else T, True)
    if fat:
        b_snode = make_b(T, False)

    def gather_rows(table_pair, emit, child):
        tab_a, tab_m = table_pair
        ids = jnp.where(emit != 0, child, 0).reshape(-1)
        if (TRACE_GATHER is not None and interpret
                and not isinstance(ids, jax.core.Tracer)):
            # eager interpret runs only: under the jit-safe interpret
            # driver (outer jit off-TPU) these are tracers, not values
            TRACE_GATHER.append(
                (np.asarray(ids), np.asarray(emit.reshape(-1) != 0))
            )
        rows_a = jnp.take(tab_a, ids, axis=0, mode="clip")  # [bcap*RB, 128]
        rows_m = jnp.take(tab_m, ids, axis=0, mode="clip")  # [bcap*RB, 36]
        return (
            rows_a.reshape(bcap, RB, 128),
            rows_m.reshape(bcap, RB, BRICK_WORDS - 128),
        )

    def dedup_rows(table_pair, emit, child):
        """Per-block dedup of the round's brick ids: gather only each
        block's <=UNIQ distinct rows; kernel B regathers per lane by RANK
        on the MXU. Returns (4 byte planes [bcap, 164, U] bf16,
        rank [s2b, 128] i32 pre-clipped for the one-hot, rank_ok i32 --
        lanes ranked past the budget must defer like pack overflow)."""
        tab_a, tab_m = table_pair
        ids = jnp.where(
            emit != 0, child, jnp.int32(0x7FFFFFFF)
        ).reshape(bcap, RB)
        pos = jnp.broadcast_to(
            jnp.arange(RB, dtype=I32)[None, :], (bcap, RB)
        )
        ids_s, pos_s = jax.lax.sort(
            (ids, pos), dimension=1, num_keys=1, is_stable=True
        )
        bnd = jnp.concatenate(
            [jnp.ones((bcap, 1), I32),
             (ids_s[:, 1:] != ids_s[:, :-1]).astype(I32)], axis=1,
        )
        rank_s = jnp.cumsum(bnd, axis=1) - 1
        # compact the boundary (= unique, rank-ordered) ids to the front
        _, uids = jax.lax.sort(
            (1 - bnd, ids_s), dimension=1, num_keys=1, is_stable=True
        )
        uids = jax.lax.slice(uids, (0, 0), (bcap, uniq))
        # rank back in lane order
        _, rank_l = jax.lax.sort(
            (pos_s, rank_s), dimension=1, num_keys=1, is_stable=False
        )
        rank_ok = (rank_l < uniq).astype(I32).reshape(s2b, 128)
        rank_blk = jnp.minimum(rank_l, uniq - 1).reshape(s2b, 128)

        rows = jnp.concatenate(
            [
                jnp.take(tab_a, uids.reshape(-1), axis=0, mode="clip"),
                jnp.take(tab_m, uids.reshape(-1), axis=0, mode="clip"),
            ],
            axis=1,
        )  # [bcap*U, 164]
        planes = [
            jnp.transpose(
                ((rows >> (8 * b)) & jnp.uint32(0xFF))
                .astype(jnp.bfloat16)
                .reshape(bcap, uniq, BRICK_WORDS),
                (0, 2, 1),
            )
            for b in range(4)
        ]
        return planes, rank_blk, rank_ok

    n_lanes = rcap * RB
    m_lanes = bcap * RB

    def row_stage(bfn, table, go_in, child_in, rays_in, p1, p2, p3, tqe_in):
        """One fetch-rows + DDA-kernel stage; returns (kernel outs, served
        flag). With dedup the HBM fetch is UNIQ rows per block and lanes
        ranked past the budget are unserved (they defer on their resume
        key, exactly like pack overflow)."""
        if uniq:
            planes, rank_blk, rank_ok = dedup_rows(table, go_in, child_in)
            go2 = go_in * rank_ok
            outs = bfn(sf, *planes, rank_blk, *rays_in, p1, p2, p3,
                       tqe_in, go2)
            return outs, go2
        w_a, w_m = gather_rows(table, go_in, child_in)
        outs = bfn(sf, w_a, w_m, *rays_in, p1, p2, p3, tqe_in, go_in)
        return outs, go_in

    def pack_lanes(go, child, p1, p2, p3, tqe, rays_c):
        """Stable emit-first sort of the cap-block lane state; returns the
        bcap-block dense prefix (kernel B inputs) + the sort permutation and
        a per-sorted-lane served flag for the unpermute."""
        fl = [x.reshape(-1) for x in (child, p1, p2, p3, tqe, *rays_c)]
        key = jnp.where(go.reshape(-1) != 0, jnp.uint32(0), jnp.uint32(1))
        pos = jnp.arange(n_lanes, dtype=I32)
        out = jax.lax.sort((key, pos, *fl), is_stable=True)
        key_s, pos_s = out[0], out[1]

        def head(x):
            return jax.lax.slice(x, (0,), (m_lanes,)).reshape(s2b, 128)

        child_p, p1p, p2p, p3p, tqep = (head(x) for x in out[2:7])
        rays_p = [head(x) for x in out[7:13]]
        go_p = head((key_s == 0).astype(I32))
        served_s = (
            (pos < m_lanes) & (key_s == 0)
        ).astype(I32)  # in SORTED order
        return child_p, p1p, p2p, p3p, tqep, rays_p, go_p, pos_s, served_s

    def unpack_lanes(pos_s, served_s, outs, fills):
        """Inverse permutation of pack_lanes via one sort keyed on original
        lane position; bcap-prefix outputs are padded with inactive fills."""
        padded = [
            jnp.concatenate(
                [o.reshape(-1),
                 jnp.full((n_lanes - m_lanes,), f, o.dtype)]
            )
            for o, f in zip(outs, fills)
        ]
        res = jax.lax.sort((pos_s, served_s, *padded), is_stable=False)
        return [x.reshape(s2, 128) for x in res[1:]]

    def body(st):
        it, resolved, t_q, t_out, nmaj_out, vidx_out = st
        actb = jnp.any(resolved == 0, axis=1)  # [nb]
        # round-robin rotation: without it, one long-running block starves
        # all blocks behind it (nonzero picks lowest indices first)
        shift = (it * cap) % nb
        sel_r = jnp.nonzero(
            jnp.roll(actb, -shift), size=cap, fill_value=nb
        )[0]
        sel = jnp.where(sel_r < nb, (sel_r + shift) % nb, nb)  # [cap]

        def pick(x):
            return jnp.take(x, sel, axis=0, mode="clip").reshape(s2f, 128)

        rays_f = [pick(x) for x in rays_b]
        tq_f = pick(t_q)
        res_f = pick(resolved)
        t_f = pick(t_out)
        nm_f = pick(nmaj_out)
        vi_f = pick(vidx_out)
        # fill slots (sel == nb) clip-load block nb-1; without this mask
        # its still-active lanes would run kernels + row gathers AGAIN in
        # every underfull tail round (and consume pack/vacuum prefix
        # slots), with the duplicate results dropped by put(mode="drop")
        real = jnp.repeat((sel < nb).astype(I32), S_BLK)[:, None]
        act_f = (res_f == 0).astype(I32) * real
        if (TRACE_ACT is not None and interpret
                and not isinstance(sel, jax.core.Tracer)):
            TRACE_ACT.append(
                (int(np.sum(np.asarray(sel) < nb)), np.asarray(act_f))
            )

        if vac:
            # act-first lane pack across the cap picked blocks; the round
            # runs on the rcap-block dense prefix. Stable sort keeps source
            # -block neighborhoods adjacent, so packed blocks retain most
            # of their pixel-tile brick locality.
            nlf = cap * RB
            key = jnp.where(
                act_f.reshape(-1) != 0, jnp.uint32(0), jnp.uint32(1)
            )
            posf = jnp.arange(nlf, dtype=I32)
            srt = jax.lax.sort(
                (key, posf, *[x.reshape(-1) for x in rays_f],
                 tq_f.reshape(-1), res_f.reshape(-1), t_f.reshape(-1),
                 nm_f.reshape(-1), vi_f.reshape(-1)),
                num_keys=1, is_stable=True,
            )
            key_s, pos_s = srt[0], srt[1]

            def headk(x):
                return jax.lax.slice(x, (0,), (n_lanes,)).reshape(s2, 128)

            rays_c = [headk(x) for x in srt[2:8]]
            tq_c = headk(srt[8])
            res_cur = headk(srt[9])
            t_cur = headk(srt[10])
            nm_cur = headk(srt[11])
            vi_cur = headk(srt[12])
            act = (headk(key_s) == 0).astype(I32)
        else:
            rays_c = rays_f
            tq_c = tq_f
            res_cur, t_cur, nm_cur, vi_cur = res_f, t_f, nm_f, vi_f
            act = act_f

        a_out = a_call(scal_i, sf, *tabs, *rays_c, tq_c, act)
        emit, child, bt1x, bt1y, bt1z, tqe, tqn, exh = a_out[:8]
        if twb:
            emit2, child2, b2x, b2y, b2z = a_out[8:13]

        if fat:
            # stage 1: supernode row walk emits the next BRICK + planes
            go_s = emit * act
            if pack:
                (child_p, b1p, b2p, b3p, tqep, rays_p, go_p, pos_s,
                 served_s) = pack_lanes(
                    go_s, child, bt1x, bt1y, bt1z, tqe, rays_c)
                (emit2p, bp1p, bp2ip, brickp, bp3p, btqp, more_sp,
                 tqr_sp), go_srv = row_stage(
                    b_snode, snodes, go_p, child_p, rays_p,
                    b1p, b2p, b3p, tqep)
                if uniq:
                    served_s = jnp.concatenate(
                        [go_srv.reshape(-1),
                         jnp.zeros((n_lanes - m_lanes,), I32)]
                    )
                (served1, emit2, bp1, bp2f, brick, bp3, btq, more_s,
                 tqr_s) = unpack_lanes(
                    pos_s, served_s,
                    [emit2p, bp1p,
                     jax.lax.bitcast_convert_type(bp2ip, jnp.float32),
                     brickp, bp3p, btqp, more_sp, tqr_sp],
                    [0, 0.0, 0.0, 0, 0.0, 0.0, 0, 0.0])
            else:
                (emit2, bp1, bp2i, brick, bp3, btq, more_s,
                 tqr_s), served1 = row_stage(
                    b_snode, snodes, go_s, child, rays_c,
                    bt1x, bt1y, bt1z, tqe)
                bp2f = jax.lax.bitcast_convert_type(bp2i, jnp.float32)
            # lanes whose supernode held nothing past tq advance to the
            # supernode exit (same planes the kernel consumed); capped
            # lanes resume from their coarse key; emitters past the pack
            # budget re-probe from their kernel-A emit key
            tqn = jnp.where(
                (go_s != 0) & (served1 == 0),
                tqe,
                jnp.where(
                    (go_s != 0) & (emit2 == 0),
                    jnp.where(more_s != 0, tqr_s, _min3(bt1x, bt1y, bt1z)),
                    tqn,
                ),
            )
            emit = emit2
            bt1x = bp1
            bt1y = bp2f
            bt1z = bp3
            tqe = btq
            child = brick

        def leaf_stage(go_st, child_st, p1, p2, p3, tqe_st):
            """One packed/dedup'd brick-DDA pass over the round's lanes;
            returns per-lane (served, hit, t, nmaj, vrank, capped, tqr)."""
            if pack:
                (child_p, b1p, b2p, b3p, tqep, rays_p, go_p, pos_s,
                 served_s) = pack_lanes(
                    go_st, child_st, p1, p2, p3, tqe_st, rays_c)
                (hitp, tp, nmajp, vrp, _p3, _tqp, morep,
                 tqrp), go_srv = row_stage(
                    b_leaf, bricks, go_p, child_p, rays_p,
                    b1p, b2p, b3p, tqep)
                if uniq:
                    served_s = jnp.concatenate(
                        [go_srv.reshape(-1),
                         jnp.zeros((n_lanes - m_lanes,), I32)]
                    )
                return unpack_lanes(
                    pos_s, served_s, [hitp, tp, nmajp, vrp, morep, tqrp],
                    [0, 0.0, -1, 0, 0, 0.0])
            (hit_, t_, nmaj_, vr_, _p3, _tqp, more_,
             tqr_), served_ = row_stage(
                b_leaf, bricks, go_st, child_st, rays_c, p1, p2, p3, tqe_st)
            return served_, hit_, t_, nmaj_, vr_, more_, tqr_

        go = emit * act
        served2, hit, t_hit, nmaj, vr, more, tq_resume = leaf_stage(
            go, child, bt1x, bt1y, bt1z, tqe)
        # resume key: lanes the DDA iteration cap stopped mid-brick resume
        # from their sub-brick key; finished bricks resume from the brick
        # exit, derived from the SAME bt1 planes the DDA kernel consumes
        # (not the kernel-internal min3, which an XLA rematerialization
        # could compute with different rounding); emitters past the pack
        # budget re-probe from the brick emit key (tqe) next round
        tqn = jnp.where(
            (go != 0) & (served2 == 0),
            tqe,
            jnp.where(
                go != 0,
                jnp.where(more != 0, tq_resume, _min3(bt1x, bt1y, bt1z)),
                tqn,
            ),
        )
        if twb:
            # second leaf stage: lanes that finished brick 1 without a hit
            # or an iteration cap walk their second in-node brick, keyed
            # past brick 1's exit. Unserved-brick2 lanes already resume
            # from the brick-1 exit above, so the next probe re-emits
            # brick 2 as its first brick -- identical to single-brick.
            b1_exit = _min3(bt1x, bt1y, bt1z)
            go_b2 = ((go != 0) & (served2 != 0) & (hit == 0)
                     & (more == 0) & (emit2 != 0)).astype(I32)
            srv_b2, hit_b, t_b, nm_b, vr_b, more_b, tqr_b = leaf_stage(
                go_b2, child2, b2x, b2y, b2z, b1_exit)
            tqn = jnp.where(
                srv_b2 != 0,
                jnp.where(more_b != 0, tqr_b, _min3(b2x, b2y, b2z)),
                tqn,
            )
            hit2 = (srv_b2 != 0) & (hit_b != 0)
            t_hit = jnp.where(hit2, t_b, t_hit)
            nmaj = jnp.where(hit2, nm_b, nmaj)
            vr = jnp.where(hit2, vr_b, vr)
            hit = jnp.where(hit2, jnp.int32(1), hit)
        newhit = (act != 0) & (hit != 0)
        t_c = jnp.where(newhit, t_hit, t_cur)
        nm_c = jnp.where(newhit, nmaj, nm_cur)
        vi_c = jnp.where(newhit, vr, vi_cur)
        res_c = jnp.where(
            (act != 0) & (newhit | (exh != 0)), 1, res_cur
        )
        tq_n = jnp.where(act != 0, tqn, tq_c)

        if vac:
            # unpermute the rcap-block prefix back to the cap picked blocks;
            # lanes past the prefix (deferred actives + the sorted-away
            # inactive tail) keep their original state untouched
            served_s = (jnp.arange(nlf, dtype=I32) < n_lanes).astype(I32)

            def padk(x, fill):
                return jnp.concatenate([
                    x.reshape(-1),
                    jnp.full((nlf - n_lanes,), fill, x.dtype),
                ])

            unp = jax.lax.sort(
                (pos_s, served_s, padk(res_c, 0), padk(tq_n, 0.0),
                 padk(t_c, 0.0), padk(nm_c, 0), padk(vi_c, 0)),
                num_keys=1, is_stable=False,
            )
            sv = unp[1].reshape(s2f, 128) != 0
            res_c = jnp.where(sv, unp[2].reshape(s2f, 128), res_f)
            tq_n = jnp.where(sv, unp[3].reshape(s2f, 128), tq_f)
            t_c = jnp.where(sv, unp[4].reshape(s2f, 128), t_f)
            nm_c = jnp.where(sv, unp[5].reshape(s2f, 128), nm_f)
            vi_c = jnp.where(sv, unp[6].reshape(s2f, 128), vi_f)

        def put(x, v):
            return x.at[sel].set(v.reshape(cap, RB), mode="drop")

        return (
            it + 1,
            put(resolved, res_c),
            put(t_q, tq_n),
            put(t_out, t_c),
            put(nmaj_out, nm_c),
            put(vidx_out, vi_c),
        )

    return body


def _make_round_fused(
    bricks, snodes, tabs, scal_i, sf, rays_s, *,
    nb: int, cap: int, T: int, level_rows: tuple, shadow: bool,
    interpret: bool, uniq: int, max_probes: int, max_dda: int,
    two_brick: bool = False, s_blk: int | None = None,
):
    """FUSE_BOOK round: the same traversal round as _make_round with
    pack_div=1/uniq>0/no vacuum, but with the XLA pick/put bookkeeping
    fused away:

      * kernel A and kernel B read the persistent per-ray state rows
        DIRECTLY via scalar-prefetch BlockSpecs (block i -> sel[i]);
      * a merge kernel computes the final where-merges and writes the 5
        state arrays in place (input_output_aliases + sel-mapped outs).

    State arrays carry ONE SPARE BLOCK (index nb): underfull rounds point
    their fill slots there (real[i]=0), so a fill write can never clobber
    a genuine block's update. rays_s are the spare-padded (nb+1)*S_BLK
    views. Bit-identical to the unfused round by construction: the same
    jnp expressions run on the same values, only their residence moved
    (tests/test_hako.py::test_hako_fuse_book_equivalence)."""
    S_BLK, RB = _resolve_sblk(s_blk)  # locals shadow the globals (see helper)
    s2 = cap * S_BLK
    shape = (s2, 128)
    smem = pl.BlockSpec((1, 8), _rep, memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((S_BLK, 128), _blk, memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((S_BLK, 128), _selblk, memory_space=pltpu.VMEM)
    tab_specs = [tab_spec(f) for f in level_rows]

    fat = snodes is not None
    twb = bool(two_brick) and not fat
    a_outs = [
        jax.ShapeDtypeStruct(shape, I32),          # emit
        jax.ShapeDtypeStruct(shape, I32),          # brick
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1x
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1y
        jax.ShapeDtypeStruct(shape, jnp.float32),  # bt1z
        jax.ShapeDtypeStruct(shape, jnp.float32),  # tq_emit
        jax.ShapeDtypeStruct(shape, jnp.float32),  # tq_new
        jax.ShapeDtypeStruct(shape, I32),          # exhausted
    ]
    if twb:
        a_outs += [
            jax.ShapeDtypeStruct(shape, I32),
            jax.ShapeDtypeStruct(shape, I32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ]
    a_call = pl.pallas_call(
        _make_kernel_a(T, level_rows, stable=interpret,
                       max_probes=max_probes, twob=twb, fused=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # sel (clipped), real
            grid=(cap,),
            in_specs=[smem, smem] + tab_specs + [sblk] * 8,
            out_specs=[vblk] * len(a_outs),
        ),
        out_shape=a_outs,
        interpret=interpret,
    )

    ublk = pl.BlockSpec(
        (1, BRICK_WORDS, max(uniq, 1)), lambda i, *_: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def make_b(dt_exp, leaf):
        return pl.pallas_call(
            _make_kernel_b(dt_exp, shadow, stable=interpret, leaf=leaf,
                           dedup_u=uniq, max_iters=max_dda, fused=True,
                           s_blk=S_BLK),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(cap,),
                in_specs=([smem] + [ublk] * 4 + [vblk]
                          + [sblk] * 6 + [vblk] * 5),
                out_specs=[vblk] * 8,
                scratch_shapes=[
                    pltpu.VMEM((128, S_BLK, 128), jnp.uint32),
                    pltpu.VMEM((BRICK_WORDS - 128, S_BLK, 128), jnp.uint32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(shape, I32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, I32),
                jax.ShapeDtypeStruct(shape, I32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, I32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
            ],
            interpret=interpret,
        )

    b_leaf = make_b(T + 2 if fat else T, True)
    if fat:
        b_snode = make_b(T, False)

    n_state = (nb + 1) * S_BLK
    sshape = (n_state, 128)
    n_merge_in = 19 + (10 if twb else 0)
    merge_call = pl.pallas_call(
        _make_merge_kernel(twb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cap,),
            in_specs=[sblk] * 5 + [vblk] * (n_merge_in - 5),
            out_specs=[sblk] * 5,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(sshape, I32),
            jax.ShapeDtypeStruct(sshape, jnp.float32),
            jax.ShapeDtypeStruct(sshape, jnp.float32),
            jax.ShapeDtypeStruct(sshape, I32),
            jax.ShapeDtypeStruct(sshape, I32),
        ],
        # args: (sel, real, res, tq, t, nm, vi, ...) -- aliasing indices
        # count the scalar-prefetch args (verified on-chip + interpret)
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )

    tab_a, tab_m = bricks

    def dedup_rows(table_pair, emit, child):
        ta, tm = table_pair
        ids = jnp.where(
            emit != 0, child, jnp.int32(0x7FFFFFFF)
        ).reshape(cap, RB)
        pos = jnp.broadcast_to(
            jnp.arange(RB, dtype=I32)[None, :], (cap, RB)
        )
        ids_s, pos_s = jax.lax.sort(
            (ids, pos), dimension=1, num_keys=1, is_stable=True
        )
        bnd = jnp.concatenate(
            [jnp.ones((cap, 1), I32),
             (ids_s[:, 1:] != ids_s[:, :-1]).astype(I32)], axis=1,
        )
        rank_s = jnp.cumsum(bnd, axis=1) - 1
        _, uids = jax.lax.sort(
            (1 - bnd, ids_s), dimension=1, num_keys=1, is_stable=True
        )
        uids = jax.lax.slice(uids, (0, 0), (cap, uniq))
        _, rank_l = jax.lax.sort(
            (pos_s, rank_s), dimension=1, num_keys=1, is_stable=False
        )
        rank_ok = (rank_l < uniq).astype(I32).reshape(s2, 128)
        rank_blk = jnp.minimum(rank_l, uniq - 1).reshape(s2, 128)
        rows = jnp.concatenate(
            [
                jnp.take(ta, uids.reshape(-1), axis=0, mode="clip"),
                jnp.take(tm, uids.reshape(-1), axis=0, mode="clip"),
            ],
            axis=1,
        )
        planes = [
            jnp.transpose(
                ((rows >> (8 * b)) & jnp.uint32(0xFF))
                .astype(jnp.bfloat16)
                .reshape(cap, uniq, BRICK_WORDS),
                (0, 2, 1),
            )
            for b in range(4)
        ]
        return planes, rank_blk, rank_ok

    def body(st):
        it, resolved, t_q, t_out, nmaj_out, vidx_out = st
        actb = jnp.any(resolved[:nb] == 0, axis=1)  # spare block excluded
        shift = (it * cap) % nb
        sel_r = jnp.nonzero(
            jnp.roll(actb, -shift), size=cap, fill_value=nb
        )[0]
        sel = jnp.where(sel_r < nb, (sel_r + shift) % nb, nb)  # fills -> spare
        real = (sel < nb).astype(I32)
        res_s = resolved.reshape(n_state, 128)
        tq_s = t_q.reshape(n_state, 128)

        a_out = a_call(sel, real, scal_i, sf, *tabs, *rays_s, tq_s, res_s)
        emit, child, bt1x, bt1y, bt1z, tqe, tqn, exh = a_out[:8]
        if twb:
            emit2, child2, b2x, b2y, b2z = a_out[8:13]

        def row_stage(bfn, table, go_in, child_in, p1, p2, p3, tqe_in):
            planes, rank_blk, rank_ok = dedup_rows(table, go_in, child_in)
            go2 = go_in * rank_ok
            outs = bfn(sel, real, sf, *planes, rank_blk, *rays_s,
                       p1, p2, p3, tqe_in, go2)
            return outs, go2

        # act for go-masking: emit already carries it (kernel A computed
        # act = resolved==0 & real in-kernel, and emit requires act)
        if fat:
            go_s = emit
            (emit2f, bp1, bp2i, brick, bp3, btq, more_s,
             tqr_s), served1 = row_stage(
                b_snode, snodes, go_s, child, bt1x, bt1y, bt1z, tqe)
            bp2f = jax.lax.bitcast_convert_type(bp2i, jnp.float32)
            tqn = jnp.where(
                (go_s != 0) & (served1 == 0),
                tqe,
                jnp.where(
                    (go_s != 0) & (emit2f == 0),
                    jnp.where(more_s != 0, tqr_s, _min3(bt1x, bt1y, bt1z)),
                    tqn,
                ),
            )
            emit = emit2f
            bt1x, bt1y, bt1z = bp1, bp2f, bp3
            tqe = btq
            child = brick

        go = emit
        (hit, t_hit, nmaj, vr, _p3, _tqp, more, tq_resume), served2 = (
            row_stage(b_leaf, bricks, go, child, bt1x, bt1y, bt1z, tqe)
        )
        margs = [emit, tqe, bt1x, bt1y, bt1z, tqn, exh,
                 served2, hit, t_hit, nmaj, vr, more, tq_resume]
        if twb:
            b1_exit = _min3(bt1x, bt1y, bt1z)
            go_b2 = ((go != 0) & (served2 != 0) & (hit == 0)
                     & (more == 0) & (emit2 != 0)).astype(I32)
            (hit_b, t_b, nm_b, vr_b, _pb, _tb, more_b, tqr_b), srv_b2 = (
                row_stage(b_leaf, bricks, go_b2, child2, b2x, b2y, b2z,
                          b1_exit)
            )
            margs += [b2x, b2y, b2z, srv_b2, hit_b, t_b, nm_b, vr_b,
                      more_b, tqr_b]

        res_n, tq_n, t_n, nm_n, vi_n = merge_call(
            sel, real,
            res_s, tq_s,
            t_out.reshape(n_state, 128),
            nmaj_out.reshape(n_state, 128),
            vidx_out.reshape(n_state, 128),
            *margs,
        )
        return (
            it + 1,
            res_n.reshape(nb + 1, RB),
            tq_n.reshape(nb + 1, RB),
            t_n.reshape(nb + 1, RB),
            nm_n.reshape(nb + 1, RB),
            vi_n.reshape(nb + 1, RB),
        )

    return body


def _init_state(nb, s_blk=None):
    S_BLK, RB = _resolve_sblk(s_blk)
    z = jnp.zeros((nb, RB), I32)
    return (
        jnp.int32(0), z, jnp.zeros((nb, RB), jnp.float32),
        jnp.full((nb, RB), MAX_FLOAT), z - 1, z,
    )


def _driver_setup(ro, rd, lower, upper, cap, max_rounds, uniq,
                  vac_pick, vac_run, nb, s_blk=None):
    """Shared preamble of the jitted and eager drivers (round budget,
    blocked ray state, scene floats, vacuum clamps) -- ONE copy, so the
    two drivers cannot drift (they must stay bit-identical,
    tests/test_hako.py::test_hako_jitted_ladder_matches_eager)."""
    S_BLK, RB = _resolve_sblk(s_blk)
    if max_rounds is None:
        # every block needs ~(brick visits per lane) picks; narrow caps
        # (the 2048^3 optimum is nb/64) need proportionally more rounds --
        # a fixed 256 silently truncated narrow-cap frames to wrong misses
        max_rounds = 64 * max(nb // cap, 1) + 256
        if uniq:
            # dedup budget serves >=uniq lanes per block-round; fully
            # incoherent blocks (worst case) need RB/uniq x more rounds.
            # The loop exits on convergence, so this only bounds safety.
            max_rounds *= max(RB // uniq, 1)
        if vac_pick:
            # vacuum rounds serve at most vac_run of vac_pick blocks'
            # worth of active lanes; safety bound only (exits on converge)
            max_rounds += 64 * max(vac_pick // max(vac_run, 1), 1) + 256
    rays_b = [
        x.reshape(nb, RB)
        for x in (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])
    ]
    sf = jnp.concatenate(
        [lower.astype(jnp.float32), upper.astype(jnp.float32),
         jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)
    vacp = min(vac_pick, nb) if vac_pick else 0
    vacr = max(min(vac_run, vacp), 1) if vacp else 0
    return max_rounds, rays_b, sf, vacp, vacr


def _fuse_ok(fuse_book, uniq, pack_div, vac_pick):
    """FUSE_BOOK requires the straight-line round shape: per-block dedup
    (uniq>0) with no lane permutation (pack_div=1, no vacuum rung)."""
    return bool(fuse_book) and uniq > 0 and pack_div == 1 and not vac_pick


def _init_state_fused(nb, s_blk=None):
    """Fused state carries ONE SPARE BLOCK (index nb): underfull rounds
    point fill slots there so a fill write can never clobber a genuine
    block. The spare starts resolved=1 (never picked, never counted)."""
    S_BLK, RB = _resolve_sblk(s_blk)
    z = jnp.zeros((nb + 1, RB), I32)
    resolved = z.at[nb].set(1)
    return (
        jnp.int32(0), resolved, jnp.zeros((nb + 1, RB), jnp.float32),
        jnp.full((nb + 1, RB), MAX_FLOAT), z - 1, z,
    )


def _run_rungs_fused(
    bricks, snodes, tabs, scal_i, sf, rays_b, *,
    nb, cap, max_rounds, T, level_rows, shadow, interpret,
    uniq, max_probes, max_dda, two_brick, s_blk=None,
):
    """The cap ladder driven through _make_round_fused. Shared by the
    jitted and eager drivers (identical rung arithmetic to the legacy
    ladder; the vacuum rung never applies -- _fuse_ok excludes it)."""
    S_BLK, RB = _resolve_sblk(s_blk)
    # spare ray block: origin far outside the root AABB (misses), rd=1
    rays_p = [
        jnp.concatenate([x, jnp.full((1, RB), fill, x.dtype)])
        for x, fill in zip(rays_b, (1e9, 1e9, 1e9, 1.0, 1.0, 1.0))
    ]
    rays_s = [x.reshape((nb + 1) * S_BLK, 128) for x in rays_p]
    ladder = [cap]
    while ladder[-1] > 16:
        ladder.append(max(ladder[-1] // 2, 16))
    if ladder[-1] > 8:
        ladder.append(8)
    st = _init_state_fused(nb, S_BLK)
    for k, c in enumerate(ladder):
        body = _make_round_fused(
            bricks, snodes, tabs, scal_i, sf, rays_s,
            nb=nb, cap=c, T=T, level_rows=level_rows, shadow=shadow,
            interpret=interpret, uniq=uniq,
            max_probes=max_probes, max_dda=max_dda, two_brick=two_brick,
            s_blk=S_BLK,
        )
        if k + 1 < len(ladder):
            nxt = ladder[k + 1]

            def cond(st, nxt=nxt):
                nblk = jnp.sum(jnp.any(st[1] == 0, axis=1).astype(I32))
                return (st[0] < max_rounds) & (nblk > nxt)
        else:
            def cond(st):
                return (st[0] < max_rounds) & jnp.any(st[1] == 0)

        st = jax.lax.while_loop(cond, body, st)
    _, _, _, t_out, nmaj_out, vidx_out = st
    R = nb * RB
    return (
        t_out[:nb].reshape(R), nmaj_out[:nb].reshape(R),
        vidx_out[:nb].reshape(R).astype(U32),
    )


@partial(
    jax.jit,
    static_argnames=(
        "T", "level_rows", "shadow", "max_rounds", "cap_blocks",
        "pack_div", "uniq", "max_probes", "max_dda", "two_brick",
        "vac_pick", "vac_run", "fuse_book", "s_blk", "interpret",
    ),
)
def _intersect_padded(
    bricks, snodes, tabs, scal_i, lower, upper, ro, rd, *,
    T: int, level_rows: tuple, shadow: bool, max_rounds: int | None = None,
    cap_blocks: int | None = None, pack_div: int = 2, uniq: int = 0,
    max_probes: int = 4, max_dda: int = 24, two_brick: bool = False,
    vac_pick: int = 0, vac_run: int = 2, fuse_book: bool = False,
    s_blk: int = 0, interpret: bool = False,
):
    """TPU path: jitted while_loop of block-compacted rounds.

    The tuning knobs (cap_blocks/pack_div/uniq/max_probes/max_dda) are
    STATIC ARGS so the jit cache keys on them -- module-attr reads inside
    the trace would silently go stale across calls (the reason sweeps used
    to need one process per combo). cap_blocks is REQUIRED for the same
    reason: a CAP_DIV module-attr fallback here would be read once at
    trace time and silently reused from the jit cache."""
    assert cap_blocks, "resolve cap_blocks in the caller (intersect_rays_hako)"
    # resolve the per-res block height for every kernel-make below; s_blk
    # is a static arg, so each (s_blk, ...) combination gets its own
    # consistent executable. Locals shadow the module globals -- nothing
    # is mutated (round 5; closes the ADVICE-r3 leak).
    S_BLK, RB = _resolve_sblk(s_blk)
    R = ro.shape[0]
    nb = R // RB
    cap = cap_blocks
    max_rounds, rays_b, sf, vacp, vacr = _driver_setup(
        ro, rd, lower, upper, cap, max_rounds, uniq, vac_pick, vac_run, nb,
        S_BLK,
    )
    if _fuse_ok(fuse_book, uniq, pack_div, vacp):
        return _run_rungs_fused(
            bricks, snodes, tabs, scal_i, sf, rays_b,
            nb=nb, cap=cap, max_rounds=max_rounds, T=T,
            level_rows=level_rows, shadow=shadow, interpret=interpret,
            uniq=uniq, max_probes=max_probes, max_dda=max_dda,
            two_brick=two_brick, s_blk=S_BLK,
        )

    # block-cap ladder: full-cap rounds while many blocks are active, then
    # progressively narrower rounds for the straggler tail (a round at cap
    # C pads its unfilled slots with inactive blocks whose kernels, row
    # gathers, and transposes all still run at full width -- traced ~3.1 ms
    # per 63-wide tail round with only a handful of live blocks). Rungs
    # halve geometrically: each rung runs while more than the NEXT rung's
    # width of blocks is active, so padding waste is bounded at ~2x
    # everywhere on the decay curve (measured 2026-08-17 at 2048^3:
    # [144,16,8] = 738 ms, [144,72,16,8] = 622 ms, geometric = see STATUS)
    ladder = [cap]
    while ladder[-1] > 16:
        ladder.append(max(ladder[-1] // 2, 16))
    if ladder[-1] > 8:
        ladder.append(8)
    # straggler-vacuum tail: once <= vac_pick blocks are active, pick them
    # all but lane-pack act-first and run on a vac_run-block prefix (see
    # _make_round's run_cap and the VAC_PICK knob comment). Forces
    # pack_div=1/uniq=0: the packed prefix is already dense and its row
    # gather is vac_run*RB rows at most.
    rungs = [(c, None) for c in ladder if c > vacp]
    if vacp:
        rungs.append((vacp, vacr))
    st = _init_state(nb, S_BLK)
    for k, (c, rc) in enumerate(rungs):
        body = _make_round(
            bricks, snodes, tabs, scal_i, sf, rays_b,
            nb=nb, cap=c, T=T, level_rows=level_rows, shadow=shadow,
            interpret=interpret,
            pack_div=1 if rc else pack_div, uniq=0 if rc else uniq,
            max_probes=max_probes, max_dda=max_dda, two_brick=two_brick,
            run_cap=rc, s_blk=S_BLK,
        )
        if k + 1 < len(rungs):
            nxt = rungs[k + 1][0]

            def cond(st, nxt=nxt):
                nblk = jnp.sum(jnp.any(st[1] == 0, axis=1).astype(I32))
                return (st[0] < max_rounds) & (nblk > nxt)
        else:
            def cond(st):
                return (st[0] < max_rounds) & jnp.any(st[1] == 0)

        st = jax.lax.while_loop(cond, body, st)
    _, _, _, t_out, nmaj_out, vidx_out = st
    return (
        t_out.reshape(R), nmaj_out.reshape(R), vidx_out.reshape(R).astype(U32)
    )


def _intersect_padded_eager(
    bricks, snodes, tabs, scal_i, lower, upper, ro, rd, *,
    T: int, level_rows: tuple, shadow: bool, max_rounds: int | None = None,
    cap_blocks: int | None = None, pack_div: int = 2, uniq: int = 0,
    max_probes: int = 4, max_dda: int = 24, two_brick: bool = False,
    vac_pick: int = 0, vac_run: int = 2, fuse_book: bool = False,
    s_blk: int = 0,
):
    """CPU/interpret path: the same rounds driven by a Python loop.

    Interpret-mode pallas kernels inlined into a jitted while_loop get fused
    with surrounding XLA ops, and XLA may rematerialize shared subexpressions
    with different FMA contraction per consumer -- which breaks the strict
    resume-key comparisons this traversal relies on. Eager per-round calls
    keep every kernel a single consistent compilation (exactly the situation
    on the real TPU, where Mosaic compiles kernels separately and the issue
    cannot arise)."""
    S_BLK, RB = _resolve_sblk(s_blk)  # locals shadow the globals (see helper)
    R = ro.shape[0]
    nb = R // RB
    # eager runs per call, so a module-attr fallback here is always fresh
    cap = cap_blocks if cap_blocks else max(nb // CAP_DIV, 1)
    max_rounds, rays_b, sf, vacp, vacr = _driver_setup(
        ro, rd, lower, upper, cap, max_rounds, uniq, vac_pick, vac_run, nb,
        S_BLK,
    )
    if _fuse_ok(fuse_book, uniq, pack_div, vacp):
        rays_p = [
            jnp.concatenate([x, jnp.full((1, RB), fill, x.dtype)])
            for x, fill in zip(rays_b, (1e9, 1e9, 1e9, 1.0, 1.0, 1.0))
        ]
        rays_s = [x.reshape((nb + 1) * S_BLK, 128) for x in rays_p]
        fbody = _make_round_fused(
            bricks, snodes, tabs, scal_i, sf, rays_s,
            nb=nb, cap=cap, T=T, level_rows=level_rows, shadow=shadow,
            interpret=True, uniq=uniq,
            max_probes=max_probes, max_dda=max_dda, two_brick=two_brick,
            s_blk=S_BLK,
        )
        st = _init_state_fused(nb, S_BLK)
        while int(st[0]) < max_rounds and bool(jnp.any(st[1] == 0)):
            st = fbody(st)
        _, _, _, t_out, nmaj_out, vidx_out = st
        return (
            t_out[:nb].reshape(R), nmaj_out[:nb].reshape(R),
            vidx_out[:nb].reshape(R).astype(U32),
        )
    body = _make_round(
        bricks, snodes, tabs, scal_i, sf, rays_b,
        nb=nb, cap=cap, T=T, level_rows=level_rows, shadow=shadow,
        interpret=True, pack_div=pack_div, uniq=uniq,
        max_probes=max_probes, max_dda=max_dda, two_brick=two_brick,
        s_blk=S_BLK,
    )
    vac_body = None
    if vacp:
        vac_body = _make_round(
            bricks, snodes, tabs, scal_i, sf, rays_b,
            nb=nb, cap=vacp, T=T, level_rows=level_rows, shadow=shadow,
            interpret=True, pack_div=1, uniq=0,
            max_probes=max_probes, max_dda=max_dda, two_brick=two_brick,
            run_cap=vacr, s_blk=S_BLK,
        )
    st = _init_state(nb, S_BLK)
    while int(st[0]) < max_rounds and bool(jnp.any(st[1] == 0)):
        if vac_body is not None and cap > vacp:
            nblk = int(jnp.sum(jnp.any(st[1] == 0, axis=1).astype(I32)))
            st = body(st) if nblk > vacp else vac_body(st)
        else:
            st = (vac_body or body)(st)
    _, _, _, t_out, nmaj_out, vidx_out = st
    return (
        t_out.reshape(R), nmaj_out.reshape(R), vidx_out.reshape(R).astype(U32)
    )


def intersect_rays_hako(
    bricks, snodes, tabs, scal_i, lower, upper, ro, rd, *,
    T: int, level_rows: tuple, shadow: bool = False,
    max_rounds: int | None = None,
    interpret: bool | None = None, cap_blocks: int | None = None,
    cap_div: int | None = None,
    pack_div: int | None = None, uniq: int | None = None,
    max_probes: int | None = None, max_dda: int | None = None,
    two_brick: bool | None = None,
    vac_pick: int | None = None, vac_run: int | None = None,
    fuse_book: int | None = None, s_blk: int | None = None,
):
    """Full-frame traversal; pads the ray count to a multiple of RB.

    Tuning knobs default to the module attrs (CAP_DIV/PACK_DIV/UNIQ/
    MAX_PROBES/MAX_DDA_ITERS) resolved HERE, outside any trace, and ride
    the jit cache key as static args -- so per-call overrides and
    module-attr sweeps are both safe in one process."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # resolve the block height BEFORE the padding arithmetic: RB below must
    # match the S_BLK the kernels trace with. s_blk=None (direct callers /
    # tests that patch hk.S_BLK themselves) takes the module default; the
    # resolved value is threaded down as a static arg -- module globals are
    # never mutated (round 5; closes the ADVICE-r3 leak).
    s_blk, RB = _resolve_sblk(s_blk)
    R = ro.shape[0]
    rpad = -(-R // RB) * RB
    if rpad != R:
        ro = jnp.concatenate([ro, jnp.zeros((rpad - R, 3), ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((rpad - R, 3), rd.dtype)])
    if cap_blocks is None:
        cap_blocks = max(
            (rpad // RB) // (CAP_DIV if cap_div is None else cap_div), 1
        )
    kw = {}
    if interpret and isinstance(ro, jax.core.Tracer):
        # called under an outer jit off-TPU (e.g. the driver's entry()
        # compile check): the eager per-round Python loop cannot trace, so
        # run the jitted while_loop driver with interpret-mode kernels.
        # Caveat (why eager stays the off-jit default, see
        # _intersect_padded_eager's docstring): fused interpret kernels can
        # rematerialize shared float exprs with different FMA contraction,
        # which the strict resume-key comparisons rely on being identical.
        fn, kw = _intersect_padded, dict(interpret=True)
    else:
        fn = _intersect_padded_eager if interpret else _intersect_padded
    t, nmaj, vidx = fn(
        bricks, snodes, tabs, scal_i, lower, upper, ro, rd,
        T=T, level_rows=level_rows, shadow=shadow, max_rounds=max_rounds,
        cap_blocks=cap_blocks, **kw,
        pack_div=PACK_DIV if pack_div is None else pack_div,
        uniq=UNIQ if uniq is None else uniq,
        max_probes=MAX_PROBES if max_probes is None else max_probes,
        max_dda=MAX_DDA_ITERS if max_dda is None else max_dda,
        two_brick=bool(TWO_BRICK) if two_brick is None else bool(two_brick),
        vac_pick=VAC_PICK if vac_pick is None else vac_pick,
        vac_run=VAC_RUN if vac_run is None else vac_run,
        fuse_book=bool(FUSE_BOOK) if fuse_book is None else bool(fuse_book),
        s_blk=s_blk,
    )
    return t[:R], nmaj[:R], vidx[:R]


def hako_args(tree: HakoTree):
    """(meta pytree, static (T, level_rows)) for the accel dispatch.

    meta's bricks/snodes are (occupancy[:, :128], metadata[:, 128:]) pairs:
    the row gather runs as two <=128-lane-tile takes (4x cheaper per row
    than one 164-wide take, scripts/gather_price2.py). Split once per tree
    and memoized (PT calls this per bounce)."""
    cached = getattr(tree, "_hako_args_cache", None)
    if cached is not None:
        return cached
    scal_i = jnp.asarray(
        [[tree.root_mask_lo & _MASK16, tree.root_mask_lo >> 16,
          tree.root_mask_hi & _MASK16, tree.root_mask_hi >> 16,
          0, 0, 0, 0]], I32,
    )
    level_rows = []
    for tarr, n_l in zip(tree.levels, tree.n_per_level):
        if tarr.shape == (1, 192):
            level_rows.append(("smem", 64))
        elif tarr.shape == (48, 128):
            level_rows.append(("taa", max(-(-n_l // 128), 1)))
        elif tarr.shape[1] == 16:
            level_rows.append(("flat", tarr.shape[0]))
        else:
            level_rows.append(("split", tarr.shape[0]))
    level_rows = tuple(level_rows)
    # kernel A consumes tables root-down: level T-1 first
    tabs = tuple(reversed(tree.levels))
    rows_rootdown = tuple(reversed(level_rows))
    bricks = (tree.bricks[:, :128], tree.bricks[:, 128:])
    snodes = (
        None if tree.snodes is None
        else (tree.snodes[:, :128], tree.snodes[:, 128:])
    )
    out = (
        (bricks, snodes, tabs, scal_i),
        (tree.T, rows_rootdown),
    )
    tree._hako_args_cache = out
    return out


def intersect_hako(tree: HakoTree, ro, rd, shadow: bool = False):
    meta, (T, level_rows) = hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    return intersect_rays_hako(
        bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
        jnp.asarray(ro, jnp.float32),
        jnp.asarray(rd, jnp.float32),
        T=T, level_rows=level_rows, shadow=shadow,
        **knobs_for_res(int(tree.grid_res)),
    )
