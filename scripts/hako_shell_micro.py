"""Isolate kernel A's non-compute cost: time (a) an I/O shell with kernel
A's exact BlockSpec layout (8 in + 8 out separate [S,128] blocks) that just
copies, (b) the same data as ONE consolidated [8,S,128] in / [8,S,128] out
block, (c) shell + ray preamble, (d) shell + preamble + 2 probes (= the
real kernel A). All at grid=256 like a real full-coverage round."""

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

from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402

if os.environ.get("SBLK"):
    hk.S_BLK = int(os.environ["SBLK"])
    hk.RB = hk.S_BLK * 128
S = hk.S_BLK
GRID = 256
SHAPE = (GRID * S, 128)
BLK = (S, 128)


def timeit(fn, iters=16):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def report(name, dt):
    print(f"{name:44s}: {dt*1e3:7.3f} ms  ({dt/GRID*1e6:6.2f} us/block)",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    eight = [
        jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
        for _ in range(8)
    ]
    one = jnp.stack([x.reshape(GRID, S, 128) for x in eight], 1)  # [G,8,S,128]

    vblk = pl.BlockSpec(BLK, hk._blk, memory_space=pltpu.VMEM)

    # (a) 8-in/8-out separate blocks, copy only
    def k_copy8(*refs):
        ins, outs = refs[:8], refs[8:]
        for i, o in zip(ins, outs):
            o[:] = i[:] + 1.0

    call8 = pl.pallas_call(
        k_copy8, grid=(GRID,), in_specs=[vblk] * 8, out_specs=[vblk] * 8,
        out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 8,
    )
    j8 = jax.jit(lambda *a: call8(*a))
    report("shell: 8 separate in + 8 out", timeit(lambda: j8(*eight)))

    # (b) one consolidated [8,S,128] block each way
    cblk = pl.BlockSpec((1, 8, S, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def k_copy1(ir, orf):
        orf[:] = ir[:] + 1.0

    call1 = pl.pallas_call(
        k_copy1, grid=(GRID,), in_specs=[cblk], out_specs=cblk,
        out_shape=jax.ShapeDtypeStruct((GRID, 8, S, 128), jnp.float32),
    )
    j1 = jax.jit(lambda a: call1(a))
    report("shell: 1 consolidated in + 1 out", timeit(lambda: j1(one)))

    # (c) 8/8 shell + ray preamble
    def k_pre(*refs):
        ins, outs = refs[:8], refs[8:]
        ro = (ins[0][:], ins[1][:], ins[2][:])
        rd = (ins[3][:], ins[4][:], ins[5][:])
        lov = [0.0, 0.0, 0.0]
        upv = [1.0, 1.0, 1.0]
        t0, t1, dt, vm6, ok = hk._ray_preamble(lov, upv, ro, rd)
        outs[0][:] = t0[0] + t1[0]
        outs[1][:] = t0[1] + t1[1]
        outs[2][:] = t0[2] + t1[2]
        outs[3][:] = dt[0]
        outs[4][:] = dt[1]
        outs[5][:] = dt[2]
        outs[6][:] = vm6.astype(jnp.float32)
        outs[7][:] = ok.astype(jnp.float32)

    callp = pl.pallas_call(
        k_pre, grid=(GRID,), in_specs=[vblk] * 8, out_specs=[vblk] * 8,
        out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 8,
    )
    jp = jax.jit(lambda *a: callp(*a))
    report("shell + ray preamble", timeit(lambda: jp(*eight)))

    # (d) the real kernel A on the same rays (random tree of 56 nodes)
    import massivevoxelraytracing_tpu.ops.hako as hako_ops
    from massivevoxelraytracing_tpu.ops import morton

    grid_res = 256
    c = rng.integers(0, grid_res, size=(60000, 3)).astype(np.uint32)
    m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    from massivevoxelraytracing_tpu.ops import octree
    pad = octree.bucket(len(m))
    hi, lo = morton.np_pack_pair(m)
    hi = np.concatenate([hi, np.full(pad - len(m), 0xFFFFFFFF, np.uint32)])
    lo = np.concatenate([lo, np.full(pad - len(m), 0xFFFFFFFF, np.uint32)])
    tree = hako_ops.build_hako(
        jnp.asarray(hi), jnp.asarray(lo), len(m), grid_res,
        lower=np.zeros(3, np.float32), dps=1.0 / grid_res)
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    print(f"tree: T={T} level_rows={level_rows}", flush=True)

    sf = jnp.concatenate(
        [tree.lower.astype(jnp.float32), tree.upper.astype(jnp.float32),
         jnp.zeros(2, jnp.float32)]).reshape(1, 8)
    smem = pl.BlockSpec((1, 8), hk._rep, memory_space=pltpu.SMEM)
    tab_specs = [hk.tab_spec(f) for f in level_rows]
    for P in (1, 2):
        a_call = pl.pallas_call(
            hk._make_kernel_a(T, level_rows, stable=False, max_probes=P),
            grid=(GRID,),
            in_specs=[smem, smem] + tab_specs + [vblk] * 8,
            out_specs=[vblk] * 8,
            out_shape=[
                jax.ShapeDtypeStruct(SHAPE, jnp.int32),
                jax.ShapeDtypeStruct(SHAPE, jnp.int32),
                jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                jax.ShapeDtypeStruct(SHAPE, jnp.int32),
            ],
        )
        ja = jax.jit(lambda *a: a_call(*a))
        tq = jnp.zeros(SHAPE, jnp.float32)
        act = jnp.ones(SHAPE, jnp.int32)
        args = (scal_i, sf, *tabs, *eight[:6], tq, act)
        report(f"real kernel A (P={P})", timeit(lambda: ja(*args)))

    # (e) kernel A variant: probe loop UNROLLED (no while_loop)
    # approximated by max_probes=1 twice chained is not equivalent; instead
    # time a single walk64+gather+walk64 body without the loop scaffolding
    def k_body(si_ref, sfr, *refs):
        tabs_r = refs[:len(tab_specs)]
        ins = refs[len(tab_specs):len(tab_specs) + 8]
        outs = refs[len(tab_specs) + 8:]
        ro = (ins[0][:], ins[1][:], ins[2][:])
        rd = (ins[3][:], ins[4][:], ins[5][:])
        lov = [sfr[0, a] for a in range(3)]
        upv = [sfr[0, 3 + a] for a in range(3)]
        t0, t1, dt, vm6, ok = hk._ray_preamble(lov, upv, ro, rd)
        rt_ml = hk._u(jnp.full_like(vm6, si_ref[0, 0]))
        rt_mh = hk._u(jnp.full_like(vm6, si_ref[0, 2]))
        cur = [t1[0], t1[1], t1[2]]
        dc = [dt[0] * 0.25, dt[1] * 0.25, dt[2] * 0.25]
        mask_lo, mask_hi = rt_ml, rt_mh
        base = jnp.zeros_like(vm6)
        tq = ins[6][:]
        for depth in range(T):
            en, ex, c = hk._walk64(
                mask_lo, mask_hi, vm6, cur[0], cur[1], cur[2],
                dc[0], dc[1], dc[2], tq)
            cx, cy, cz = hk._coords(c)
            k4 = jnp.full_like(c, 4)
            nt1x = hk._plane(cur[0], dc[0], jnp.minimum(cx + 1, k4))
            nt1y = hk._plane(cur[1], dc[1], jnp.minimum(cy + 1, k4))
            nt1z = hk._plane(cur[2], dc[2], jnp.minimum(cz + 1, k4))
            rank = hk._pc64_below(mask_lo, mask_hi, c ^ vm6)
            child = base + rank
            if depth < T - 1:
                mask_lo, mask_hi, base = hk._gather_node_any(
                    tabs_r[depth], level_rows[depth], child)
                cur = [nt1x, nt1y, nt1z]
                dc = [d * 0.25 for d in dc]
        outs[0][:] = child
        outs[1][:] = c
        outs[2][:] = en
        outs[3][:] = ex
        outs[4][:] = nt1x
        outs[5][:] = nt1y
        outs[6][:] = nt1z
        outs[7][:] = rank

    callb = pl.pallas_call(
        k_body, grid=(GRID,),
        in_specs=[smem, smem] + tab_specs + [vblk] * 8,
        out_specs=[vblk] * 8,
        out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.int32)] * 2
        + [jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 5
        + [jax.ShapeDtypeStruct(SHAPE, jnp.int32)],
    )
    jb = jax.jit(lambda *a: callb(*a))
    args_b = (scal_i, sf, *tabs, *eight)
    report("unrolled probe body (no while_loop)", timeit(lambda: jb(*args_b)))


def staged(tree=None):
    """Stage the probe body: preamble+walk / +rank / +gather+walk2, to
    locate the ~13 us."""
    import massivevoxelraytracing_tpu.ops.hako as hako_ops
    from massivevoxelraytracing_tpu.ops import morton, octree

    rng = np.random.default_rng(0)
    eight = [
        jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
        for _ in range(8)
    ]
    vblk = pl.BlockSpec(BLK, hk._blk, memory_space=pltpu.VMEM)
    grid_res = 256
    c = rng.integers(0, grid_res, size=(60000, 3)).astype(np.uint32)
    m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
    pad = octree.bucket(len(m))
    hi, lo = morton.np_pack_pair(m)
    hi = np.concatenate([hi, np.full(pad - len(m), 0xFFFFFFFF, np.uint32)])
    lo = np.concatenate([lo, np.full(pad - len(m), 0xFFFFFFFF, np.uint32)])
    tree = hako_ops.build_hako(
        jnp.asarray(hi), jnp.asarray(lo), len(m), grid_res,
        lower=np.zeros(3, np.float32), dps=1.0 / grid_res)
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    sf = jnp.concatenate(
        [tree.lower.astype(jnp.float32), tree.upper.astype(jnp.float32),
         jnp.zeros(2, jnp.float32)]).reshape(1, 8)
    smem = pl.BlockSpec((1, 8), hk._rep, memory_space=pltpu.SMEM)
    tab_specs = [hk.tab_spec(f) for f in level_rows]

    def make(stage):
        def k(si_ref, sfr, *refs):
            tabs_r = refs[:len(tab_specs)]
            ins = refs[len(tab_specs):len(tab_specs) + 8]
            outs = refs[len(tab_specs) + 8:]
            ro = (ins[0][:], ins[1][:], ins[2][:])
            rd = (ins[3][:], ins[4][:], ins[5][:])
            lov = [sfr[0, a] for a in range(3)]
            upv = [sfr[0, 3 + a] for a in range(3)]
            t0, t1, dt, vm6, okp = hk._ray_preamble(lov, upv, ro, rd)
            rt_ml = hk._u(jnp.full_like(vm6, si_ref[0, 0]))
            rt_mh = hk._u(jnp.full_like(vm6, si_ref[0, 2]))
            cur = [t1[0], t1[1], t1[2]]
            dc = [dt[0] * 0.25, dt[1] * 0.25, dt[2] * 0.25]
            tq = ins[6][:]
            en, ex, c = hk._walk64(
                rt_ml, rt_mh, vm6, cur[0], cur[1], cur[2],
                dc[0], dc[1], dc[2], tq)
            child = c
            rank = c
            if stage >= 1:
                cx, cy, cz = hk._coords(c)
                k4 = jnp.full_like(c, 4)
                nt1x = hk._plane(cur[0], dc[0], jnp.minimum(cx + 1, k4))
                nt1y = hk._plane(cur[1], dc[1], jnp.minimum(cy + 1, k4))
                nt1z = hk._plane(cur[2], dc[2], jnp.minimum(cz + 1, k4))
                rank = hk._pc64_below(rt_ml, rt_mh, c ^ vm6)
                child = rank
            if stage >= 2:
                ml2, mh2, b2 = hk._gather_node_any(
                    tabs_r[0], level_rows[0], jnp.clip(child, 0, 55))
                child = b2 + rank
            if stage >= 3:
                en2, ex2, c2 = hk._walk64(
                    ml2, mh2, vm6, nt1x, nt1y, nt1z,
                    dc[0] * 0.25, dc[1] * 0.25, dc[2] * 0.25, tq)
                child = child + c2
            outs[0][:] = child
            outs[1][:] = en
            outs[2][:] = ex
        return k

    for stage, name in ((0, "preamble+walk"), (1, "+coords/planes/rank"),
                        (2, "+smem gather"), (3, "+second walk")):
        call = pl.pallas_call(
            make(stage), grid=(GRID,),
            in_specs=[smem, smem] + tab_specs + [vblk] * 8,
            out_specs=[vblk] * 3,
            out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.int32),
                       jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                       jax.ShapeDtypeStruct(SHAPE, jnp.float32)],
        )
        jitted = jax.jit(lambda *a, c=call: c(*a))
        tq = jnp.zeros(SHAPE, jnp.float32)
        args = (scal_i, sf, *tabs, *eight[:6], tq, tq)
        report(f"stage {stage}: {name}", timeit(lambda: jitted(*args)))


if __name__ == "__main__":
    if os.environ.get("STAGED"):
        staged()
    else:
        main()
