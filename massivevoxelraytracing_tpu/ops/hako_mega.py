"""HakoMega: the whole HakoTree traversal as ONE persistent Pallas
megakernel (round-4 architecture; replaces the XLA round driver of
ops/hako_kernels.py for the hot path).

The reference's hot loop is a single in-kernel stack walk per ray
(octreeTraverse_EfficientParametric, /root/reference/voxCommon.hpp:231-562):
one kernel launch per frame, zero host/driver involvement per node visit.
The round-3 TPU architecture chopped a ray's walk into ~50 globally
synchronized XLA while_loop rounds of {probe kernel, XLA row-gather, DDA
kernel, bookkeeping}, paying fixed costs per round the reference pays zero
of, and forcing straggler blocks to drag whole 524K-lane rounds (70 of 83
rounds measured at 1-36% active density). This module restores the
reference's shape on the TPU's terms:

  * grid = ALL ray blocks; each grid step owns one S_BLK x 128-lane block
    START TO FINISH. The per-block round loop (probe -> fetch -> DDA ->
    merge) runs INSIDE the kernel, so a block that needs 3 rounds pays 3
    and one that needs 80 pays 80 -- no global synchronization, no
    block-cap ladder, no pick/put bookkeeping, no vacuum/packing knobs.
  * the fat brick rows stay in HBM and are fetched with in-kernel
    per-row ASYNC DMA (pltpu.make_async_copy by scalar index; measured
    ~24 M rows/s pipelined, scripts/dma_gather_probe3.py): a serial
    min-extraction loop dedups each round's <= U distinct row ids
    (blocks are coherent pixel tiles: 13-48 distinct bricks per 2048
    lanes, scripts/dup_stats.py), issues one DMA per distinct row, and
    ranks every lane -- replacing the legacy driver's three XLA sorts +
    host-width row takes.
  * per-lane rows re-materialize from the U-row VMEM table with the
    byte-split one-hot bf16 MXU matmul (exact: every product is a single
    0/1 x <=255 term -- the same trick as the legacy UNIQ path).

The probe and DDA bodies are the SHARED functions _probe_from_root /
_dda_rows (ops/hako_kernels.py) -- bit-identical floats by construction;
per-lane results are independent of round scheduling (a lane deferred by
the U budget re-probes from its resume key to the same row), so outputs
match intersect_rays_hako exactly (tests/test_hako_mega.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bits import I32, U32
from .hako import BRICK_WORDS, HakoTree
from .hako_kernels import (
    MAX_FLOAT,
    _MASK16,
    _blk,
    _dda_rows,
    _min3,
    _probe_from_root,
    _ray_preamble,
    _rep,
    _stable,
    _u,
    tab_spec,
)

INF_ID = 0x7FFFFFFF

# Megakernel knobs (few, by design -- the ladder/pack/vacuum/fuse family
# of the legacy driver does not exist here):
MEGA_U = 32          # per-round distinct-row fetch budget per block
MEGA_S_BLK = 8       # sublane rows per ray block (1024 lanes)
MEGA_PROBES = 4      # probe descents per round (stragglers loop in-block)
MEGA_DDA = 24        # DDA iterations per round
MEGA_CONT = 1        # table-hit continue rounds: the resident U-row table
                     # persists across rounds for BOTH row stages (the fat
                     # path's snode stage gets its own table + row
                     # materialization scratch; see _make_megakernel)

# Per-resolution winners (on-chip sweeps; same contract as the legacy
# TUNED_BY_RES but over the megakernel's 4-knob space). Entries may be
# empty -- the module defaults above apply.
# Primary winners (docs/logs/r5_pt_sweep.log + prim sweep, 2026-08-21,
# 1080p on the 1024^3 lattice): 181.6 ms / 11.42 Mrays/s at U=64 S=16
# (r4 default U=32 S=8: 210.6 ms). Coherent tiles like tall blocks and a
# bigger resident table; PT wavefronts prefer S=8 (see MEGA_TUNED_PT).
# U=16 is 30% worse; PROBES neutral.
MEGA_TUNED = {
    1024: dict(uniq=64, s_blk=16),
    # 2048 cells (r5): inherited 1024 winners were already near-optimal
    # (295.3 ms); U=128/cont=0 edges them out (292.2 ms, 7.10 Mrays/s)
    2048: dict(uniq=128, s_blk=16, cont=0),
}
# PT wavefront winners (docs/logs/r5_pt_sweep.log, 2026-08-21, 960x540
# 16 spp on the 1024^3 lattice): U is the only live knob -- incoherent
# bounces overflow the per-round fetch budget, so raise it to the compile
# ceiling (U=256 and cont at U>=128 both crash the remote Mosaic compile;
# cont vs no-cont is noise at U=64). S=16 was 12% slower; PROBES/DDA
# perfectly neutral. 36.2 -> 26.6 s/step on knobs alone.
MEGA_TUNED_PT = {
    # s_blk pinned: the overlay lands on top of MEGA_TUNED's s_blk=16
    # primary winner, and PT wavefronts measured 12% slower at S=16
    1024: dict(uniq=128, cont=0, s_blk=8),
    # 256^3 PT is barely fetch-bound (few distinct bricks): 38.2 s vs
    # 39.6 for the inherited primary knobs at 1080p (r5 sweep)
    256: dict(uniq=128, cont=0, s_blk=8),
}


def mega_knobs(grid_res: int, profile: str = "primary") -> dict:
    """Resolved intersect_rays_hako_mega knob kwargs for a resolution."""
    from .hako_kernels import _nearest_log

    out = {}
    if MEGA_TUNED:
        base = _nearest_log(MEGA_TUNED, grid_res, max_ratio=4.0)
        if base:
            out.update(base)
    if profile == "pt" and MEGA_TUNED_PT:
        pt = _nearest_log(MEGA_TUNED_PT, grid_res, max_ratio=2.0)
        if pt:
            out.update(pt)
    return out


def _make_megakernel(T: int, level_rows: tuple, *, fat: bool, shadow: bool,
                     s_blk: int, uniq: int, max_probes: int, max_dda: int,
                     max_rounds: int, cont: bool, stable: bool):
    n_tabs = T - 1
    S = s_blk
    U = uniq

    def kernel(*refs):
        scal_ref, sf_ref = refs[:2]
        tabs = refs[2:2 + n_tabs]
        k = 2 + n_tabs
        bricks_w, bricks_m = refs[k:k + 2]
        k += 2
        if fat:
            snodes_w, snodes_m = refs[k:k + 2]
            k += 2
        rox, roy, roz, rdx, rdy, rdz = refs[k:k + 6]
        k += 6
        t_ref, nmaj_ref, vidx_ref = refs[k:k + 3]
        k += 3
        w_ref, m_ref, wbuf, mbuf, uid_ref, sems = refs[k:k + 6]
        k += 6
        nu_ref = snode_bufs = snode_mats = None
        if cont:
            nu_ref = refs[k]
            k += 1
            nu_ref[0] = jnp.int32(0)  # resident-table entry count
            if fat:
                # the snode stage gets its OWN resident table AND row
                # materialization so the brick-side state survives rounds
                # (cont + skip-regather need both to persist)
                snode_bufs = refs[k:k + 5]
                snode_bufs[4][0] = jnp.int32(0)
                snode_mats = refs[k + 5:k + 7]

        ro = (rox[:], roy[:], roz[:])
        rd = (rdx[:], rdy[:], rdz[:])
        lov = [sf_ref[0, a] for a in range(3)]
        upv = [sf_ref[0, 3 + a] for a in range(3)]
        _t0, t1, dt, vm6, enter_ok = _ray_preamble(lov, upv, ro, rd, stable)

        rt_ml = _u(jnp.full_like(vm6, scal_ref[0, 0])) | (
            _u(jnp.full_like(vm6, scal_ref[0, 1])) << 16
        )
        rt_mh = _u(jnp.full_like(vm6, scal_ref[0, 2])) | (
            _u(jnp.full_like(vm6, scal_ref[0, 3])) << 16
        )

        def row_stage(hbm_w, hbm_m, leaf, dt_exp, go, child, p1, p2, p3,
                      tqe, use_cont=False, bufs=None, mats=None,
                      prev_rank=None):
            """Dedup + DMA-fetch the round's distinct rows, re-materialize
            per-lane rows in w_ref/m_ref, run the in-row DDA. Returns
            (_dda_rows outputs, served). Lanes ranked past the U budget
            defer on their kernel-A resume key (tqe), exactly like the
            legacy UNIQ overflow contract.

            use_cont (MEGA_CONT): the U-row table PERSISTS across rounds;
            when every active lane's row is already resident (coherent
            tiles advance through the same few bricks), the serial dedup +
            DMA fetch is skipped entirely and lanes rank by tag match.
            Results are bit-identical: a resident row has the same content
            as a re-fetched one, and per-lane resume chains don't depend
            on which round served them.

            Rows ride TWO [1, 128] DMAs (occupancy + padded metadata):
            Mosaic requires in-kernel HBM row slices 128-lane aligned --
            a [1, 164] slice of a (8,128)-tiled memref does not lower."""
            wb, mb, uidr, sem, nur = (
                bufs if bufs is not None
                else (wbuf, mbuf, uid_ref, sems, nu_ref)
            )
            rem = jnp.where(go, child, INF_ID)
            rank0 = jnp.full_like(child, U)

            def dma_w(u, j):
                return pltpu.make_async_copy(
                    hbm_w.at[pl.ds(j, 1)], wb.at[pl.ds(u, 1)],
                    sem.at[0, u],
                )

            def dma_m(u, j):
                return pltpu.make_async_copy(
                    hbm_m.at[pl.ds(j, 1)], mb.at[pl.ds(u, 1)],
                    sem.at[1, u],
                )

            if use_cont:
                def tag_rank(nu):
                    """Rank go-lanes by tag match against the resident
                    table (ids within one fetch are unique)."""
                    rank = rank0
                    for u in range(U):
                        hitu = go & (child == uidr[u]) & (u < nu)
                        rank = jnp.where(hitu, jnp.int32(u), rank)
                    return rank

                miss = go & (tag_rank(nur[0]) == U)
                need_fetch = jnp.any(miss)

                @pl.when(need_fetch)
                def _fetch():
                    def ded_cond(c):
                        return (c[0] < U) & (c[1] < INF_ID)

                    def ded_body(c):
                        u, m, rem = c
                        uidr[u] = m
                        dma_w(u, m).start()
                        dma_m(u, m).start()
                        rem = jnp.where(rem == m, INF_ID, rem)
                        return u + 1, jnp.min(rem), rem

                    nuniq, _m, _r = jax.lax.while_loop(
                        ded_cond, ded_body, (jnp.int32(0), jnp.min(rem), rem)
                    )
                    nur[0] = nuniq

                    def wait_body(u, _):
                        dma_w(u, uidr[u]).wait()
                        dma_m(u, uidr[u]).wait()
                        return 0

                    jax.lax.fori_loop(0, nuniq, wait_body, 0)

                rank = tag_rank(nur[0])
                served = go & (rank < U)
            else:
                def ded_cond(c):
                    return (c[0] < U) & (c[1] < INF_ID)

                def ded_body(c):
                    u, m, rem, rank = c
                    uidr[u] = m
                    dma_w(u, m).start()
                    dma_m(u, m).start()
                    is_m = rem == m
                    rank = jnp.where(is_m, u, rank)
                    rem = jnp.where(is_m, INF_ID, rem)
                    return u + 1, jnp.min(rem), rem, rank

                m0 = jnp.min(rem)
                nuniq, _m, _r, rank = jax.lax.while_loop(
                    ded_cond, ded_body, (jnp.int32(0), m0, rem, rank0)
                )
                served = go & (rank < U)

                def wait_body(u, _):
                    dma_w(u, uidr[u]).wait()
                    dma_m(u, uidr[u]).wait()
                    return 0

                jax.lax.fori_loop(0, nuniq, wait_body, 0)

            wr, mr = (w_ref, m_ref) if mats is None else mats

            def do_regather():
                # byte-split one-hot MXU regather: [words, U] planes x
                # [U, lanes] (exact: every product is one 0/1 x <=255 term)
                rows_wt = wb[:].T   # [128, U]
                rows_mt = mb[:].T[:64]  # meta needs 36 rows; 64 = tile-rnd
                rk = rank.reshape(1, S * 128)
                oh = (
                    jax.lax.broadcasted_iota(I32, (U, S * 128), 0) == rk
                ).astype(jnp.bfloat16)

                def regather(rows_t):
                    acc = None
                    for b in range(4):
                        # Mosaic has no u32->bf16 cast; hop u32 -> i32 ->
                        # f32 -> bf16 (values <= 255, exact at every step)
                        pb = ((rows_t >> jnp.uint32(8 * b))
                              & jnp.uint32(0xFF)
                              ).astype(I32).astype(jnp.float32).astype(
                                  jnp.bfloat16)
                        v = jnp.dot(
                            pb, oh, preferred_element_type=jnp.float32
                        ).astype(jnp.int32).astype(jnp.uint32) << (8 * b)
                        acc = v if acc is None else acc | v
                    return acc

                wr[:, :, :] = regather(rows_wt).reshape(128, S, 128)
                n_meta = BRICK_WORDS - 128
                mr[:, :, :] = regather(rows_mt)[:n_meta].reshape(
                    n_meta, S, 128)

            if use_cont and prev_rank is not None:
                # skip-regather: if nothing was fetched and no SERVED
                # lane's rank moved since last round, wr/mr already hold
                # every served lane's row (unserved lanes' rows are stale
                # but unread -- _dda_rows masks by `served`)
                changed = need_fetch | jnp.any(served & (rank != prev_rank))
                pl.when(changed)(do_regather)
            else:
                do_regather()

            outs = _stable(_dda_rows(
                wr, mr, dt, vm6,
                list(_stable((p1, p2, p3), stable)), tqe, served,
                dt_factor=0.25 ** dt_exp, shadow=shadow, leaf=leaf,
                stable=stable, max_iters=max_dda,
            ), stable)
            return outs, served.astype(I32), rank

        zf = jnp.zeros_like(t1[0])
        zi = jnp.zeros_like(vm6)
        false0 = jnp.zeros_like(enter_ok)

        def round_cond(st):
            return jnp.any(st[1] == 0) & (st[0] < max_rounds)

        def round_body(st):
            rnd, resolved, t_q, t_out, nm_out, vi_out, pr_s, pr_b = st
            act = resolved == 0

            # In interpret mode, pin the stage-boundary values the way the
            # legacy driver's kernel boundaries do (each legacy kernel is a
            # separate compilation; arrays crossing the boundary are hard
            # barriers). Without this, XLA:CPU may constant-fold e.g. the
            # probe's chained dc = dt*0.25*0.25 differently here than in
            # the standalone kernel A, drifting resume keys by 1 ulp.
            (need, tqn, emit, child, bt1x, bt1y, bt1z, tqe,
             exh) = _stable(_probe_from_root(
                tabs, level_rows, T, t1, dt, vm6, rt_ml, rt_mh,
                act, false0, t_q,
                max_probes=max_probes, stable=stable, twob=False,
            ), stable)

            if fat:
                # stage 1: supernode row walk emits the next BRICK + planes
                go_s = emit != 0
                (emit2, bp1, bp2i, brick, bp3, btq, more_s,
                 tqr_s), served1, pr_s = row_stage(
                    snodes_w, snodes_m, False, T, go_s, child,
                    bt1x, bt1y, bt1z, tqe,
                    use_cont=cont, bufs=snode_bufs, mats=snode_mats,
                    prev_rank=pr_s if cont else None)
                bp2f = jax.lax.bitcast_convert_type(bp2i, jnp.float32)
                tqn = jnp.where(
                    go_s & (served1 == 0),
                    tqe,
                    jnp.where(
                        go_s & (emit2 == 0),
                        jnp.where(more_s != 0, tqr_s,
                                  _min3(bt1x, bt1y, bt1z)),
                        tqn,
                    ),
                )
                emit = emit2
                bt1x, bt1y, bt1z = bp1, bp2f, bp3
                tqe = btq
                child = brick

            go = emit != 0
            (hit, t_hit, nmaj, vr, _p3, _tqp, more, tqr), served2, pr_b = (
                row_stage(bricks_w, bricks_m, True, T + 2 if fat else T,
                          go, child, bt1x, bt1y, bt1z, tqe, use_cont=cont,
                          prev_rank=pr_b if cont else None)
            )

            # merge (same expressions as hako_kernels._make_merge_kernel)
            tqn_v = jnp.where(
                go & (served2 == 0),
                tqe,
                jnp.where(
                    go,
                    jnp.where(more != 0, tqr, _min3(bt1x, bt1y, bt1z)),
                    tqn,
                ),
            )
            newhit = act & (hit != 0)
            resolved = jnp.where(
                act & (newhit | (exh != 0)), jnp.int32(1), resolved
            )
            t_q = jnp.where(act, tqn_v, t_q)
            t_out = jnp.where(newhit, t_hit, t_out)
            nm_out = jnp.where(newhit, nmaj, nm_out)
            vi_out = jnp.where(newhit, vr, vi_out)
            return (rnd + 1, resolved, t_q, t_out, nm_out, vi_out,
                    pr_s, pr_b)

        st0 = (
            jnp.int32(0),
            jnp.where(enter_ok, 0, 1).astype(I32),  # no-enter lanes = miss
            zf,
            zf + MAX_FLOAT,
            zi - 1,
            zi,
            zi - 1,  # snode-stage prev ranks (-1 = nothing resident)
            zi - 1,  # brick-stage prev ranks
        )
        _, _, _, t_out, nm_out, vi_out, _, _ = jax.lax.while_loop(
            round_cond, round_body, st0
        )
        t_ref[:] = t_out
        nmaj_ref[:] = nm_out
        vidx_ref[:] = vi_out

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "T", "level_rows", "shadow", "s_blk", "uniq", "max_probes",
        "max_dda", "max_rounds", "cont", "interpret",
    ),
)
def _intersect_mega(
    bricks, snodes, tabs, scal_i, lower, upper, ro, rd, *,
    T: int, level_rows: tuple, shadow: bool,
    s_blk: int, uniq: int, max_probes: int, max_dda: int,
    max_rounds: int, cont: bool, interpret: bool,
):
    S = s_blk
    RB = S * 128
    R = ro.shape[0]
    nb = R // RB
    fat = snodes is not None

    rays = [
        x.reshape(nb * S, 128)
        for x in (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])
    ]
    sf = jnp.concatenate(
        [lower.astype(jnp.float32), upper.astype(jnp.float32),
         jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)

    smem = pl.BlockSpec((1, 8), _rep, memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((S, 128), _blk, memory_space=pltpu.VMEM)
    # row tables stay in HBM explicitly: under ANY the compiler places a
    # table that happens to fit (256^3 bricks = 4 MB) in VMEM, and Mosaic
    # then rejects the in-kernel dynamic row slice of the tiled memref
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    if interpret:
        hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    tab_specs = [tab_spec(f) for f in level_rows]

    cont = bool(cont)
    shape = (nb * S, 128)
    kernel = _make_megakernel(
        T, level_rows, fat=fat, shadow=shadow, s_blk=S, uniq=uniq,
        max_probes=max_probes, max_dda=max_dda, max_rounds=max_rounds,
        cont=cont, stable=interpret,
    )
    row_tabs = bricks if not fat else bricks + snodes  # (w, m) pairs
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=(
            [smem, smem] + tab_specs + [hbm] * len(row_tabs)
            + [vblk] * 6
        ),
        out_specs=[vblk] * 3,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),  # t
            jax.ShapeDtypeStruct(shape, I32),          # nmajor
            jax.ShapeDtypeStruct(shape, I32),          # vrank
        ],
        scratch_shapes=[
            pltpu.VMEM((128, S, 128), U32),            # w_ref
            pltpu.VMEM((BRICK_WORDS - 128, S, 128), U32),  # m_ref
            pltpu.VMEM((uniq, 128), U32),              # wbuf
            pltpu.VMEM((uniq, 128), U32),              # mbuf
            pltpu.SMEM((uniq,), I32),                  # uid_ref
            pltpu.SemaphoreType.DMA((2, uniq)),
        ] + ([pltpu.SMEM((1,), I32)] if cont else [])  # nu_ref
        + ([
            pltpu.VMEM((uniq, 128), U32),              # snode wbuf
            pltpu.VMEM((uniq, 128), U32),              # snode mbuf
            pltpu.SMEM((uniq,), I32),                  # snode uid_ref
            pltpu.SemaphoreType.DMA((2, uniq)),
            pltpu.SMEM((1,), I32),                     # snode nu_ref
            pltpu.VMEM((128, S, 128), U32),            # snode w mat
            pltpu.VMEM((BRICK_WORDS - 128, S, 128), U32),  # snode m mat
        ] if (cont and fat) else []),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scal_i, sf, *tabs, *row_tabs, *rays)
    t_out, nmaj_out, vidx_out = out
    return (
        t_out.reshape(R), nmaj_out.reshape(R), vidx_out.reshape(R).astype(U32)
    )


def default_max_rounds(res4h: int, RB: int, uniq: int) -> int:
    """Safety bound only (the round loop exits on convergence): worst-case
    fat-row visits along a ray (~3 * res/16) times the U-overflow factor
    for fully incoherent blocks, plus probe/DDA-cap slack."""
    v = 3 * max(res4h // 16, 4) + 64
    return v * max(RB // max(uniq, 1), 1)


def intersect_rays_hako_mega(
    bricks, snodes, tabs, scal_i, lower, upper, ro, rd, *,
    T: int, level_rows: tuple, shadow: bool = False,
    interpret: bool | None = None,
    uniq: int | None = None, s_blk: int | None = None,
    max_probes: int | None = None, max_dda: int | None = None,
    max_rounds: int | None = None, cont: int | None = None,
):
    """Full-frame megakernel traversal; pads the ray count to a block
    multiple. bricks/snodes are (w [N, 128], m [N, 128]) pairs from
    hako_mega_args (metadata zero-padded to a full lane tile)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s_blk = MEGA_S_BLK if s_blk is None else int(s_blk)
    uniq = MEGA_U if uniq is None else int(uniq)
    max_probes = MEGA_PROBES if max_probes is None else int(max_probes)
    max_dda = MEGA_DDA if max_dda is None else int(max_dda)
    cont = MEGA_CONT if cont is None else int(cont)
    RB = s_blk * 128
    R = ro.shape[0]
    rpad = -(-R // RB) * RB
    if rpad != R:
        ro = jnp.concatenate([ro, jnp.full((rpad - R, 3), 1e9, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((rpad - R, 3), rd.dtype)])
    if max_rounds is None:
        # static formula from the padded resolution implied by T
        fat = snodes is not None
        res4h = (256 if fat else 16) * 4 ** T
        max_rounds = default_max_rounds(res4h, RB, uniq)
    t, nmaj, vidx = _intersect_mega(
        bricks, snodes, tabs, scal_i, lower, upper, ro, rd,
        T=T, level_rows=level_rows, shadow=shadow,
        s_blk=s_blk, uniq=uniq, max_probes=max_probes, max_dda=max_dda,
        max_rounds=int(max_rounds), cont=bool(cont), interpret=interpret,
    )
    return t[:R], nmaj[:R], vidx[:R]


def _split_pad(rows):
    """u32 [N, 164] row table -> ((w [N, 128], m [N, 128])) with the 36
    metadata words zero-padded to a full 128-lane tile: in-kernel DMA row
    slices must be 128-lane aligned (Mosaic tiling constraint)."""
    w = rows[:, :128]
    m = rows[:, 128:]
    m = jnp.concatenate(
        [m, jnp.zeros((rows.shape[0], 256 - BRICK_WORDS), rows.dtype)],
        axis=1,
    )
    return w, m


def hako_mega_args(tree: HakoTree):
    """(meta pytree, static (T, level_rows)) for the accel dispatch --
    the megakernel flavor: row tables as 128-lane-aligned (w, m) pairs."""
    cached = getattr(tree, "_hako_mega_args_cache", None)
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
    tabs = tuple(reversed(tree.levels))
    rows_rootdown = tuple(reversed(level_rows))
    out = (
        (_split_pad(tree.bricks),
         None if tree.snodes is None else _split_pad(tree.snodes),
         tabs, scal_i),
        (tree.T, rows_rootdown),
    )
    tree._hako_mega_args_cache = out
    return out


def intersect_hako_mega(tree: HakoTree, ro, rd, shadow: bool = False, **kw):
    meta, (T, level_rows) = hako_mega_args(tree)
    bricks, snodes, tabs, scal_i = meta
    return intersect_rays_hako_mega(
        bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
        jnp.asarray(ro, jnp.float32),
        jnp.asarray(rd, jnp.float32),
        T=T, level_rows=level_rows, shadow=shadow, **kw,
    )
