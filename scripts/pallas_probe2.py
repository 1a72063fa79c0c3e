"""Probe 2D gather forms in Mosaic: take_along_axis on axis 0 (cross-sublane,
per-column) and axis 1 (cross-lane shuffle). If both work, an arbitrary
per-lane gather from an (N/128, 128)-tiled table = axis0-gather + axis1-gather.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def run_kernel(kernel, outshape, *arrs):
    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*outshape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)

    return timeit(run, *arrs)


def probe_axis0(n_rows, r_rows=16, k=64):
    """out[i,j] = tbl[idx[i,j], j] -- cross-sublane gather, per column."""

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx, axis=0)
            return (idx + v) & (n_rows - 1)

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, n_rows, (n_rows, 128)), jnp.int32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, (r_rows, 128)), jnp.int32
    )
    try:
        dt, _ = run_kernel(kernel, ((r_rows, 128), jnp.int32), tbl, idx)
        n = r_rows * 128 * k
        print(f"axis0 n_rows={n_rows:>7}: ok {dt*1e6:9.1f} us  "
              f"{n/dt/1e9:7.3f} G/s")
    except Exception as e:
        print(f"axis0 n_rows={n_rows:>7}: FAIL {type(e).__name__}: {str(e)[:250]}")


def probe_axis1(r_rows=16, k=64):
    """out[i,j] = tbl[i, idx[i,j]] -- cross-lane shuffle."""

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx, axis=1)
            return (idx + v) & 127

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (r_rows, 128)), jnp.int32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, 128, (r_rows, 128)), jnp.int32
    )
    try:
        dt, _ = run_kernel(kernel, ((r_rows, 128), jnp.int32), tbl, idx)
        n = r_rows * 128 * k
        print(f"axis1 lane-shuffle: ok {dt*1e6:9.1f} us  {n/dt/1e9:7.3f} G/s")
    except Exception as e:
        print(f"axis1 lane-shuffle: FAIL {type(e).__name__}: {str(e)[:250]}")


def probe_full(n_entries, r_rows=16, k=64):
    """Arbitrary per-lane gather from (N/128, 128) table:
    step 1: rows = take_along_axis(tbl, idx >> 7, axis=0)   [wrong lanes]
    -- that fetches tbl[row, j] not tbl[row, idx&127]; fix with axis1 shuffle:
    step 2: out = take_along_axis(rows, idx & 127, axis=1)
    BUT step 1's gather must fetch per-lane rows: lane j gets row idx[i,j]>>7,
    so rows[i,j] = tbl[idx[i,j]>>7, j]; the axis-1 shuffle then needs
    rows[i, ...] at lane idx&127 whose row came from lane idx&127's request.
    That composition is only correct if idx>>7 is uniform per sublane-row OR
    we pre-shuffle idx. Correct order: first shuffle the *lane request* so
    lane j asks for the row that contains its target... Simplest correct
    combo: idx_l = idx & 127; row = idx >> 7;
      rows_for_lane = take_along_axis(tbl, shuffle(row to lane idx_l?)...)
    Instead: gather twice --
      step A: idxs = take_along_axis(row, inv-perm?...)
    We probe the cheap correct variant: out[i,j] = tbl[row[i,j], lane[i,j]]
    = axis1( axis0(tbl, row), lane ) is WRONG in general; the right identity:
      tmp[i,j]  = tbl[row[i,j], j]         for all j  (axis0, 128 candidates)
    needs row[i,j] = row of the entry lane j *holds*, i.e. we must first move
    each lane's row-request to the lane that owns the entry's column: that is
    itself an axis1 shuffle of `row` by... not expressible without scatter.
    Alternative correct 2-step: broadcast-row trick --
      rows = axis0(tbl, row)     # rows[i,j] = tbl[row[i,j], j]
      out  = axis1(rows, lane)   # = tbl[row[i,lane[i,j]], lane[i,j]]
    correct iff row[i, lane[i,j]] == row[i,j]: NOT general.
    For the general case use the transpose trick: gather row via axis0 with
    row' = axis1(row, lane-inverse)... needs inverse permutation (scatter).
    => The robust general gather: one-hot matmul over rows + axis1 shuffle:
      rowmat = onehot(row) @ tbl      # [R,128] each lane j: tbl[row[i,?],j]
    no -- onehot(row[i,j]) differs per lane too.
    PRACTICAL resolution probed here: per-lane gather where the table is
    REPLICATED per lane: tbl_rep (N, 128) with tbl_rep[e, j] = T[e]; then
      out[i,j] = axis0(tbl_rep, idx)[i,j] = T[idx[i,j]]  -- fully general!
    Cost: 512B VMEM per entry word. This probe measures that layout.
    """

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx, axis=0)
            return (idx + v) & (n_entries - 1)

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    t = np.random.default_rng(0).integers(0, n_entries, (n_entries, 1))
    tbl = jnp.asarray(np.broadcast_to(t, (n_entries, 128)), jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_entries, (r_rows, 128)), jnp.int32
    )
    try:
        dt, _ = run_kernel(kernel, ((r_rows, 128), jnp.int32), tbl, idx)
        n = r_rows * 128 * k
        print(f"replicated n={n_entries:>7}: ok {dt*1e6:9.1f} us  "
              f"{n/dt/1e9:7.3f} G/s  (vmem {n_entries*512/1e6:.1f} MB/word)")
    except Exception as e:
        print(f"replicated n={n_entries:>7}: FAIL {type(e).__name__}: {str(e)[:250]}")


ALL = {
    "a0_256": lambda: probe_axis0(256),
    "a0_2k": lambda: probe_axis0(2048),
    "a0_16k": lambda: probe_axis0(1 << 14),
    "a1": lambda: probe_axis1(),
    "rep4k": lambda: probe_full(4096),
    "rep32k": lambda: probe_full(1 << 15),
}

if __name__ == "__main__":
    for nm in (sys.argv[1:] or list(ALL)):
        ALL[nm]()
