"""Micro-time the pieces inside kernel A/B: walk64 alone, node gather
alone (flat vs split vs fold_select-from-SMEM), fold_select word fetch.
Each piece runs in its own pallas kernel over the same block shape, looped
K times in-kernel so per-launch overhead is amortized away."""

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

S = hk.S_BLK
SHAPE = (S, 128)
K = 64          # in-kernel repeats
GRID = 64       # blocks per launch


def timeit(fn, iters=8):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return dt / (K * GRID)  # seconds per block-piece


def run_case(name, kernel, inputs, n_out=1, out_dtype=jnp.float32):
    vblk = pl.BlockSpec(SHAPE, hk._blk, memory_space=pltpu.VMEM)
    specs = []
    for a in inputs:
        if a.shape == SHAPE:
            specs.append(vblk)
        else:
            ms = pltpu.SMEM if (a.ndim == 2 and a.shape[0] == 1) else pltpu.VMEM
            specs.append(
                pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                             memory_space=ms)
            )
    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=specs,
        out_specs=[vblk] * n_out,
        out_shape=[jax.ShapeDtypeStruct(SHAPE, out_dtype)] * n_out,
    )
    jitted = jax.jit(lambda *a: call(*a))
    dt = timeit(lambda: jitted(*inputs))
    print(f"{name:34s}: {dt*1e9:8.1f} ns/block ({dt*1e9/2048:6.2f} ns/lane)",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    f = lambda: jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
    u = lambda hi: jnp.asarray(
        rng.integers(0, hi, SHAPE).astype(np.uint32))

    t1x, t1y, t1z = f(), f(), f()
    dcx, dcy, dcz = f(), f(), f()
    tq = jnp.zeros(SHAPE, jnp.float32)
    ml, mh = u(1 << 32), u(1 << 32)

    # --- walk64
    def k_walk(mlr, mhr, xr, yr, zr, ar, br, cr, tqr, out):
        vm6 = jnp.zeros(SHAPE, jnp.int32)
        acc = tqr[:]
        for _ in range(K):
            en, ex, c, _, _, _ = hk._walk64(
                mlr[:], mhr[:], vm6, xr[:], yr[:], zr[:],
                ar[:], br[:], cr[:], acc)
            acc = acc + en * 1e-9  # serialize repeats
        out[:] = acc

    run_case("walk64 (10-slot lattice)", k_walk,
             [ml, mh, t1x, t1y, t1z, dcx, dcy, dcz, tq])

    # --- scan64
    hk.SCAN_IMPL = "scan"
    run_case("scan64 (64-cell sweep)", k_walk,
             [ml, mh, t1x, t1y, t1z, dcx, dcy, dcz, tq])
    hk.SCAN_IMPL = "walk"

    # --- node gather: flat table (n=128) and split table (rows=1,8)
    idx = jnp.asarray(rng.integers(0, 56, SHAPE).astype(np.int32))
    flat = jnp.asarray(rng.uniform(0, 255, (128, 16)).astype(np.float32))

    def k_gflat(tabr, idxr, out):
        acc = jnp.zeros(SHAPE, jnp.int32)
        for _ in range(K):
            a, b, c = hk._gather_node_flat(tabr[:], 128, idxr[:] + acc)
            acc = (acc + c) & 31
        out[:] = acc

    run_case("gather flat n=128", k_gflat, [flat, idx], out_dtype=jnp.int32)

    for rows in (1, 8, 32):
        split = jnp.asarray(
            rng.uniform(0, 255, (rows, hk.N_TAB_SEG * 128)).astype(np.float32))

        def k_gsplit(tabr, idxr, out, rows=rows):
            acc = jnp.zeros(SHAPE, jnp.int32)
            for _ in range(K):
                a, b, c = hk._gather_node(tabr[:], rows, idxr[:] + acc)
                acc = (acc + c) & 31
            out[:] = acc

        run_case(f"gather split rows={rows}", k_gsplit, [split, idx],
                 out_dtype=jnp.int32)

    # --- fold_select over a 64-entry SMEM-free broadcast table
    tab3 = jnp.asarray(
        rng.integers(0, 1 << 32, (1, 192)).astype(np.uint32))

    def k_fold(tabr, idxr, out):
        items_l = [tabr[0, 3 * i] for i in range(64)]
        items_h = [tabr[0, 3 * i + 1] for i in range(64)]
        items_b = [tabr[0, 3 * i + 2] for i in range(64)]
        acc = jnp.zeros(SHAPE, jnp.int32)
        for _ in range(K):
            sel = (idxr[:] + acc) & 63
            a = hk._fold_select(items_l, sel, 6)
            b = hk._fold_select(items_h, sel, 6)
            c = hk._fold_select(items_b, sel, 6)
            acc = (acc + (a ^ b ^ c).astype(jnp.int32)) & 31
        out[:] = acc

    run_case("fold_select 64x3 u32 scalars", k_fold, [tab3, idx],
             out_dtype=jnp.int32)

    # --- fold_select word fetch (kernel B's 128-word fetch)
    words = jnp.asarray(
        rng.integers(0, 1 << 32, (hk.BRICK_WORDS, S, 128)).astype(np.uint32))

    def k_words(wr, idxr, out):
        acc = jnp.zeros(SHAPE, jnp.int32)
        for _ in range(K):
            s_real = (idxr[:] + acc) & 63
            w_lo = hk._fold_select([wr[2 * s] for s in range(64)], s_real, 6)
            w_hi = hk._fold_select(
                [wr[2 * s + 1] for s in range(64)], s_real, 6)
            acc = (acc + (w_lo ^ w_hi).astype(jnp.int32)) & 31
        out[:] = acc

    run_case("fold_select 128 brick words", k_words, [words, idx],
             out_dtype=jnp.int32)


def calibrate():
    """Known-op-count kernels to validate the harness: 1024 chained fmas
    (latency-bound) and 8 independent chains (throughput-bound)."""
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
    b0 = jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))

    def k_chain(ar, br, out):
        a = ar[:]
        b = br[:]
        for _ in range(1024):
            a = a * 1.0000001 + b
        out[:] = a

    def k_par8(ar, br, out):
        b = ar[:]
        acc = [ar[:] + float(i) for i in range(8)]
        for _ in range(128):
            acc = [x * 1.0000001 + b for x in acc]
        r = acc[0]
        for x in acc[1:]:
            r = r + x
        out[:] = r

    for name, k in (("calib 1024 chained fma", k_chain),
                    ("calib 8x128 parallel fma", k_par8)):
        vblk = pl.BlockSpec(SHAPE, hk._blk, memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            k, grid=(GRID,), in_specs=[vblk, vblk], out_specs=vblk,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        )
        jitted = jax.jit(lambda *a, c=call: c(*a))
        jax.block_until_ready(jitted(a0, b0))
        t0 = time.perf_counter()
        outs = [jitted(a0, b0) for _ in range(16)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 16 / GRID
        print(f"{name:34s}: {dt*1e9:8.1f} ns/block", flush=True)


if __name__ == "__main__":
    calibrate()
    if os.environ.get("FULL"):
        main()
