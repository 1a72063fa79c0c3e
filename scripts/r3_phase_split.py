"""Phase split of the TUNED traversal round (round-3 knobs: PACK_DIV=1,
UNIQ, TWO_BRICK) on the canonical lattice scene, from the shared treecache.

Measures, at the top rung width (cap = nb // CAP_DIV):
  - kernel A (probe walk, tuned MAX_PROBES)
  - dedup_rows (3 axis-1 sorts + unique-row take + byte planes)
  - kernel B (uniq regather path, tuned MAX_DDA_ITERS)
  - pick/put bookkeeping (block select + state take/scatter)
  - one full jitted round body (cross-check vs the sum of phases)
  - full frame + per-rung round counts (replicates the driver's cap ladder)

Usage: RES=1024 python scripts/r3_phase_split.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from massivevoxelraytracing_tpu.models import raycast  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402


def timeit(fn, iters=16):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    grid_res = int(os.environ.get("RES", 1024))
    width, height = 1920, 1088
    if os.environ.get("SBLK"):
        hk.S_BLK = int(os.environ["SBLK"])
        hk.RB = hk.S_BLK * 128
    knobs = hk.knobs_for_res(grid_res)
    print(f"RES={grid_res} SBLK={hk.S_BLK} knobs={knobs}", flush=True)
    cap_div = knobs["cap_div"]
    uniq = knobs["uniq"]
    probes = knobs["max_probes"]
    dda = knobs["max_dda"]
    twob = bool(knobs.get("two_brick", 0))

    tree = treecache.lattice_tree(grid_res)
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    fat = snodes is not None
    print(f"tree: voxels={tree.n_voxels} bricks={tree.n_bricks} fat={fat}",
          flush=True)

    lo = np.asarray(tree.lower)
    hi = np.asarray(tree.upper)
    center = (lo + hi) / 2
    extent = float((hi - lo).max())
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    packet = raycast.MAX_RAY_PACKET
    order_pad, _ = raycast._cached_order(width, height, packet)
    idx = np.asarray(order_pad)
    live = idx >= 0
    safe = np.maximum(idx, 0)
    px = (safe % width).astype(np.float32)
    py = (safe // width).astype(np.float32)
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * (px + 0.5) / width) * (width / height)
    v = th - 2.0 * th * (py + 0.5) / height
    rd = (u[:, None] * np.asarray(cam.right)
          + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)
    ro = np.where(live[:, None], np.asarray(cam.o)[None, :], 1e9).astype(
        np.float32)

    R = len(ro)
    nb = R // hk.RB
    cap = max(nb // cap_div, 1)
    s2 = cap * hk.S_BLK
    shape = (s2, 128)
    print(f"R={R} nb={nb} cap={cap} (top rung)", flush=True)

    rays_c = [jnp.asarray(x[: cap * hk.RB].reshape(shape)) for x in
              (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])]
    tq_c = jnp.zeros(shape, jnp.float32)
    act = jnp.ones(shape, jnp.int32)
    sf = jnp.concatenate([tree.lower.astype(jnp.float32),
                          tree.upper.astype(jnp.float32),
                          jnp.zeros(2, jnp.float32)]).reshape(1, 8)

    smem = pl.BlockSpec((1, 8), hk._rep, memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((hk.S_BLK, 128), hk._blk, memory_space=pltpu.VMEM)
    tab_specs = [hk.tab_spec(f) for f in level_rows]

    # ---- kernel A (tuned probes, twob emits)
    a_outs = [
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
    ]
    twb = twob and not fat
    if twb:
        a_outs += [
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ]
    a_call = pl.pallas_call(
        hk._make_kernel_a(T, level_rows, stable=False, max_probes=probes,
                          twob=twb),
        grid=(cap,),
        in_specs=[smem, smem] + tab_specs + [vblk] * 8,
        out_specs=[vblk] * len(a_outs),
        out_shape=a_outs,
    )
    a_jit = jax.jit(lambda *a: a_call(*a))
    dt_a = timeit(lambda: a_jit(scal_i, sf, *tabs, *rays_c, tq_c, act))
    print(f"kernel A  ({cap} blk, P={probes}, twob={twb}): {dt_a*1e3:7.2f} ms"
          f"  ({dt_a/cap*1e6:6.1f} us/blk)", flush=True)
    a_out = a_jit(scal_i, sf, *tabs, *rays_c, tq_c, act)
    emit, child = a_out[0], a_out[1]
    bt1x, bt1y, bt1z, tqe = a_out[2], a_out[3], a_out[4], a_out[5]
    print(f"   emit={float(jnp.mean((emit != 0) * 1.0)):.3f}", flush=True)

    tab_a, tab_m = bricks
    U = uniq

    # ---- dedup_rows (exactly _make_round.dedup_rows with pack_div=1)
    @jax.jit
    def dedup(emit, child):
        ids = jnp.where(emit != 0, child, jnp.int32(0x7FFFFFFF)).reshape(
            cap, hk.RB)
        pos = jnp.broadcast_to(jnp.arange(hk.RB, dtype=jnp.int32)[None, :],
                               (cap, hk.RB))
        ids_s, pos_s = jax.lax.sort((ids, pos), dimension=1, num_keys=1,
                                    is_stable=True)
        bnd = jnp.concatenate(
            [jnp.ones((cap, 1), jnp.int32),
             (ids_s[:, 1:] != ids_s[:, :-1]).astype(jnp.int32)], axis=1)
        rank_s = jnp.cumsum(bnd, axis=1) - 1
        _, uids = jax.lax.sort((1 - bnd, ids_s), dimension=1, num_keys=1,
                               is_stable=True)
        uids = jax.lax.slice(uids, (0, 0), (cap, U))
        _, rank_l = jax.lax.sort((pos_s, rank_s), dimension=1, num_keys=1,
                                 is_stable=False)
        rank_ok = (rank_l < U).astype(jnp.int32).reshape(s2, 128)
        rank_blk = jnp.minimum(rank_l, U - 1).reshape(s2, 128)
        rows = jnp.concatenate(
            [jnp.take(tab_a, uids.reshape(-1), axis=0, mode="clip"),
             jnp.take(tab_m, uids.reshape(-1), axis=0, mode="clip")], axis=1)
        planes = [
            jnp.transpose(((rows >> (8 * b)) & jnp.uint32(0xFF))
                          .astype(jnp.bfloat16)
                          .reshape(cap, U, hk.BRICK_WORDS), (0, 2, 1))
            for b in range(4)
        ]
        return planes, rank_blk, rank_ok

    dt_d = timeit(lambda: dedup(emit, child))
    print(f"dedup     ({cap} blk, U={U}): {dt_d*1e3:7.2f} ms", flush=True)
    planes, rank_blk, rank_ok = dedup(emit, child)
    go2 = emit * act * rank_ok

    # sub-split of dedup: the 3 sorts alone vs the take+planes
    @jax.jit
    def dedup_sorts(emit, child):
        ids = jnp.where(emit != 0, child, jnp.int32(0x7FFFFFFF)).reshape(
            cap, hk.RB)
        pos = jnp.broadcast_to(jnp.arange(hk.RB, dtype=jnp.int32)[None, :],
                               (cap, hk.RB))
        ids_s, pos_s = jax.lax.sort((ids, pos), dimension=1, num_keys=1,
                                    is_stable=True)
        bnd = jnp.concatenate(
            [jnp.ones((cap, 1), jnp.int32),
             (ids_s[:, 1:] != ids_s[:, :-1]).astype(jnp.int32)], axis=1)
        rank_s = jnp.cumsum(bnd, axis=1) - 1
        _, uids = jax.lax.sort((1 - bnd, ids_s), dimension=1, num_keys=1,
                               is_stable=True)
        _, rank_l = jax.lax.sort((pos_s, rank_s), dimension=1, num_keys=1,
                                 is_stable=False)
        return uids, rank_l

    dt_ds = timeit(lambda: dedup_sorts(emit, child))
    print(f"   dedup sorts only: {dt_ds*1e3:7.2f} ms "
          f"(take+planes = {(dt_d-dt_ds)*1e3:.2f})", flush=True)

    # ---- kernel B (uniq regather path)
    ublk = pl.BlockSpec((1, hk.BRICK_WORDS, max(U, 1)),
                        lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    b_call = pl.pallas_call(
        hk._make_kernel_b(T + 2 if fat else T, False, stable=False,
                          leaf=True, dedup_u=U, max_iters=dda),
        grid=(cap,),
        in_specs=[smem] + [ublk] * 4 + [vblk] + [vblk] * 11,
        scratch_shapes=[
            pltpu.VMEM((128, hk.S_BLK, 128), jnp.uint32),
            pltpu.VMEM((hk.BRICK_WORDS - 128, hk.S_BLK, 128), jnp.uint32),
        ],
        out_specs=[vblk] * 8,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ],
    )
    b_jit = jax.jit(lambda *a: b_call(*a))
    dt_b = timeit(lambda: b_jit(sf, *planes, rank_blk, *rays_c,
                                bt1x, bt1y, bt1z, tqe, go2))
    print(f"kernel B  ({cap} blk, D={dda}, U={U}): {dt_b*1e3:7.2f} ms"
          f"  ({dt_b/cap*1e6:6.1f} us/blk)", flush=True)

    # ---- bookkeeping: block pick (11 takes) + put (5 scatters)
    resolved = jnp.zeros((nb, hk.RB), jnp.int32)
    t_q = jnp.zeros((nb, hk.RB), jnp.float32)
    t_o = jnp.full((nb, hk.RB), hk.MAX_FLOAT)
    nm_o = jnp.zeros((nb, hk.RB), jnp.int32)
    vi_o = jnp.zeros((nb, hk.RB), jnp.int32)
    rays_b = [jnp.asarray(x.reshape(nb, hk.RB)) for x in
              (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])]

    @jax.jit
    def bookkeeping(it, resolved, t_q, t_o, nm_o, vi_o):
        actb = jnp.any(resolved == 0, axis=1)
        shift = (it * cap) % nb
        sel_r = jnp.nonzero(jnp.roll(actb, -shift), size=cap,
                            fill_value=nb)[0]
        sel = jnp.where(sel_r < nb, (sel_r + shift) % nb, nb)

        def pick(x):
            return jnp.take(x, sel, axis=0, mode="clip")

        vals = [pick(x) for x in rays_b] + [pick(t_q), pick(resolved),
                                            pick(t_o), pick(nm_o), pick(vi_o)]
        s = sum(v.sum() for v in vals[:1])  # keep takes alive

        def put(x, v):
            return x.at[sel].set(v, mode="drop")

        return (put(resolved, vals[7]), put(t_q, vals[6] + 0.0),
                put(t_o, vals[8]), put(nm_o, vals[9]), put(vi_o, vals[10]), s)

    dt_k = timeit(lambda: bookkeeping(jnp.int32(1), resolved, t_q, t_o,
                                      nm_o, vi_o))
    print(f"bookkeep  (pick 11 + put 5, nb={nb}): {dt_k*1e3:7.2f} ms",
          flush=True)

    # ---- one full jitted round body (tuned knobs) for cross-check
    body = hk._make_round(
        bricks, snodes, tabs, scal_i, sf, rays_b,
        nb=nb, cap=cap, T=T, level_rows=level_rows, shadow=False,
        interpret=False, pack_div=knobs["pack_div"], uniq=U,
        max_probes=probes, max_dda=dda, two_brick=twob)
    body_jit = jax.jit(body)
    st0 = hk._init_state(nb)
    dt_r = timeit(lambda: body_jit(st0))
    n_stage = (2 if twb else 1) + (1 if fat else 0)
    print(f"full round body (cap={cap}): {dt_r*1e3:7.2f} ms  "
          f"[sum of phases ~ {(dt_a + n_stage*(dt_d+dt_b) + dt_k)*1e3:.2f}]",
          flush=True)

    # ---- full frame + per-rung round counts (replicating the cap ladder)
    ladder = [cap]
    while ladder[-1] > 16:
        ladder.append(max(ladder[-1] // 2, 16))
    if ladder[-1] > 8:
        ladder.append(8)
    max_rounds, rays_b2, sf2, _, _ = hk._driver_setup(
        jnp.asarray(ro), jnp.asarray(rd), tree.lower, tree.upper, cap,
        None, U, 0, 2, nb)

    st = hk._init_state(nb)
    counts = []
    t0 = time.time()
    for k, c in enumerate(ladder):
        bdy = hk._make_round(
            bricks, snodes, tabs, scal_i, sf2, rays_b2,
            nb=nb, cap=c, T=T, level_rows=level_rows, shadow=False,
            interpret=False, pack_div=knobs["pack_div"], uniq=U,
            max_probes=probes, max_dda=dda, two_brick=twob)
        if k + 1 < len(ladder):
            nxt = ladder[k + 1]

            def cond(st, nxt=nxt):
                nblk = jnp.sum(jnp.any(st[1] == 0, axis=1).astype(jnp.int32))
                return (st[0] < max_rounds) & (nblk > nxt)
        else:
            def cond(st):
                return (st[0] < max_rounds) & jnp.any(st[1] == 0)
        st = jax.jit(
            lambda st, cond=cond, bdy=bdy: jax.lax.while_loop(cond, bdy, st)
        )(st)
        counts.append(int(st[0]))
    jax.block_until_ready(st)
    print(f"ladder rounds (cumulative) {list(zip(ladder, counts))} "
          f"cold {time.time()-t0:.1f}s", flush=True)

    def full():
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            jnp.asarray(ro), jnp.asarray(rd),
            T=T, level_rows=level_rows, shadow=False,
            cap_div=cap_div, pack_div=knobs["pack_div"], uniq=U,
            max_probes=probes, max_dda=dda,
            two_brick=knobs.get("two_brick", 0),
            vac_pick=knobs.get("vac_pick", 0),
            vac_run=knobs.get("vac_run", 2))
        return float(jnp.sum(jnp.where(t < 1e37, t, 0.0)))

    dt_f = timeit(lambda: full(), iters=3)
    print(f"full frame: {dt_f*1e3:.1f} ms = {R/dt_f/1e6:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
