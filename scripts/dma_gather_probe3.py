"""Pipelined per-row DMA gather from HBM vs jnp.take, at the hako brick-row
shapes. CHAINED timing: call k+1's ids depend on call k's output rows, so
async dispatch cannot hide device time (the tunneled backend's
block_until_ready returns before execution finishes -- measured: unchained
harnesses report >5 TB/s). One device_get at the end; tunnel RTT (~50 ms)
is amortized over iters.

Run on TPU: python scripts/dma_gather_probe3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_chained(step, ids0, iters=20):
    """step: ids -> (rows..., ids_next). Chains ids through iters calls."""
    ids = ids0
    out = step(ids)
    ids = out[-1]
    _ = np.asarray(ids[:1])  # settle compile + one RTT
    ids = ids0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(ids)
        ids = out[-1]
    _ = np.asarray(ids[:1])
    return (time.perf_counter() - t0) / iters


def make_deriver(n_table):
    @jax.jit
    def derive(rows):
        return (rows[:, :1].reshape(-1).astype(jnp.int32) & (n_table - 1))
    return derive


def take_ref(n_table, n_rows, cols=128, iters=20):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(
        rng.integers(0, 1 << 30, (n_table, cols), dtype=np.uint32))
    ids0 = jnp.asarray(rng.integers(0, n_table, (n_rows,)), jnp.int32)

    @jax.jit
    def step(ids):
        rows = jnp.take(tbl, ids, axis=0, mode="clip")
        nxt = (rows[:, :1].reshape(-1).astype(jnp.int32) & (n_table - 1))
        return rows, nxt

    dt = timeit_chained(step, ids0, iters=iters)
    rate = n_rows / dt / 1e6
    bw = n_rows * cols * 4 / dt / 1e9
    print(f"take cols={cols:4d}:            {dt*1e6:9.1f} us  "
          f"{rate:8.1f} M rows/s  {bw:7.1f} GB/s", flush=True)


def dma_gather(n_table, n_rows, L=2048, D=8, cols=128, iters=20):
    grid = n_rows // L

    def kernel(idx_ref, tbl_hbm, out_ref, sems):
        def issue(i):
            j = idx_ref[0, 0, i]
            return pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(j, 1)], out_ref.at[pl.ds(i, 1)],
                sems.at[i % D],
            )

        def body(i, _):
            @pl.when(i >= D)
            def _():
                issue(i - D).wait()
            issue(i).start()
            return 0

        jax.lax.fori_loop(0, L, body, 0)

        def drain(i, _):
            issue(L - D + i).wait()
            return 0

        jax.lax.fori_loop(0, D, drain, 0)

    gather = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((L, cols), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, cols), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(
        rng.integers(0, 1 << 30, (n_table, cols), dtype=np.uint32))
    ids0 = jnp.asarray(rng.integers(0, n_table, (n_rows,)), jnp.int32)

    @jax.jit
    def step(ids):
        rows = gather(ids.reshape(grid, 1, L), tbl)
        nxt = (rows[:, :1].reshape(-1).astype(jnp.int32) & (n_table - 1))
        return rows, nxt

    try:
        dt = timeit_chained(step, ids0, iters=iters)
        rate = n_rows / dt / 1e6
        bw = n_rows * cols * 4 / dt / 1e9
        print(f"dma  cols={cols:4d} L={L} D={D:3d}: {dt*1e6:9.1f} us  "
              f"{rate:8.1f} M rows/s  {bw:7.1f} GB/s", flush=True)
    except Exception as e:
        print(f"dma  cols={cols:4d} L={L} D={D:3d}: FAIL "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    N_TABLE = 1 << 18
    N_ROWS = 1 << 18
    take_ref(N_TABLE, N_ROWS, cols=128)
    for D in (8, 16, 32, 64):
        dma_gather(N_TABLE, N_ROWS, L=2048, D=D, cols=128)
    dma_gather(N_TABLE, N_ROWS, L=4096, D=32, cols=128)
    # mask-table width (36 u32 = 144 B); does Mosaic take narrow rows?
    dma_gather(N_TABLE, N_ROWS, L=2048, D=32, cols=36)
    take_ref(N_TABLE, N_ROWS, cols=36)
