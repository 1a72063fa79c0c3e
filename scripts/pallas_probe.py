"""Probe what Mosaic/Pallas supports on this chip+toolchain for the traversal
kernel design: per-lane dynamic gather from VMEM at various table sizes, loop
overhead inside a kernel, and one-hot MXU gather throughput.

Run: python scripts/pallas_probe.py [probe ...]
Each probe prints ok/fail + a rough rate. One TPU process at a time.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe_gather_vmem(n_table, r=2048, k=64):
    """k dependent rounds of per-lane gather from a VMEM table of n_table u32."""

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take(tbl.reshape(-1), idx.reshape(-1), axis=0).reshape(idx.shape)
            return (idx + v) & (n_table - 1)

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r // 128, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, n_table, (8, n_table // 8)), jnp.int32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_table, (r // 128, 128)), jnp.int32
    )
    try:
        dt, out = timeit(run, tbl, idx)
        rate = r * k / dt / 1e9
        print(f"gather_vmem n={n_table:>8} r={r} k={k}: ok {dt*1e6:9.1f} us  "
              f"{rate:8.3f} G gathers/s")
    except Exception as e:
        print(f"gather_vmem n={n_table:>8}: FAIL {type(e).__name__}: {str(e)[:300]}")


def probe_gather_2d(n_rows, cols=128, r=2048, k=16):
    """Row-gather: fetch a whole 128-wide row per lane-group via one-hot MXU:
    onehot[r, n_rows] @ table[n_rows, cols]."""

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, carry):
            idx, acc = carry
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (r, n_rows), 1)
                == idx[:, None]
            ).astype(jnp.float32)
            rows = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            idx = (idx + rows[:, 0].astype(jnp.int32)) & (n_rows - 1)
            return idx, acc + rows[:, 1]

        idx, acc = jax.lax.fori_loop(
            0, k, body, (idx_ref[:].reshape(-1), jnp.zeros((r,), jnp.float32))
        )
        out_ref[:] = acc.reshape(r // 128, 128)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r // 128, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, 7, (n_rows, cols)), jnp.float32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, (r // 128, 128)), jnp.int32
    )
    try:
        dt, out = timeit(run, tbl, idx)
        rate = r * k / dt / 1e9
        print(f"onehot_mxu  n={n_rows:>8} r={r} k={k}: ok {dt*1e6:9.1f} us  "
              f"{rate:8.3f} G row-gathers/s")
    except Exception as e:
        print(f"onehot_mxu  n={n_rows:>8}: FAIL {type(e).__name__}: {str(e)[:300]}")


def probe_loop_overhead(r=2048, k=256):
    """Pure VPU loop: measures per-iteration cost of fori_loop inside pallas."""

    def kernel(x_ref, out_ref):
        def body(i, x):
            return x * 1.000001 + 0.5

        out_ref[:] = jax.lax.fori_loop(0, k, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((r // 128, 128), jnp.float32)
    dt, _ = timeit(run, x)
    print(f"loop_ovh    r={r} k={k}: {dt*1e6:9.1f} us total, "
          f"{dt/k*1e9:8.1f} ns/iter")


def probe_xla_gather(n_table, r=1 << 20):
    """Baseline: plain XLA jnp.take outside pallas (HBM gather)."""

    @jax.jit
    def run(tbl, idx):
        return jnp.take(tbl, idx, mode="clip")

    tbl = jnp.arange(n_table, dtype=jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_table, (r,)), jnp.int32
    )
    dt, _ = timeit(run, tbl, idx, iters=5)
    print(f"xla_take    n={n_table:>9} r={r}: {dt*1e6:9.1f} us  "
          f"{r/dt/1e9:8.3f} G gathers/s")


def probe_dma_hbm_gather(n_table=1 << 20, r=2048, rows=8):
    """Per-lane-group DMA gather from HBM: r/rows scalar-issued row DMAs."""

    def kernel(idx_ref, tbl_hbm, out_ref, scratch, sems):
        nblk = r // rows

        def body(i, _):
            j = idx_ref[i // 128, i % 128]
            dma = pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(j, rows)], scratch.at[i % 8], sems.at[i % 8]
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, nblk, body, 0)
        out_ref[:] = scratch[0][None, :]

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, rows, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)

    tbl = jnp.zeros((n_table, 128), jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_table - rows, (r // 128, 128)),
        jnp.int32,
    )
    try:
        dt, _ = timeit(run, tbl, idx, iters=5)
        nblk = r // rows
        print(f"dma_gather  n={n_table} blocks={nblk}: {dt*1e6:9.1f} us  "
              f"{nblk/dt/1e6:8.3f} M dma/s")
    except Exception as e:
        print(f"dma_gather: FAIL {type(e).__name__}: {str(e)[:300]}")


ALL = {
    "loop": lambda: probe_loop_overhead(),
    "g256": lambda: probe_gather_vmem(256),
    "g1k": lambda: probe_gather_vmem(1024),
    "g8k": lambda: probe_gather_vmem(8192),
    "g64k": lambda: probe_gather_vmem(1 << 16),
    "g512k": lambda: probe_gather_vmem(1 << 19),
    "oh1k": lambda: probe_gather_2d(1024),
    "oh8k": lambda: probe_gather_2d(8192),
    "xla1m": lambda: probe_xla_gather(1 << 20),
    "dma": lambda: probe_dma_hbm_gather(),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()
