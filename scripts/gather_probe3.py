"""Defeat-proof probes:
  chase   - dependent pointer-chase via XLA take (true gather rate)
  chase_rows - same but row-gather [N, 8] u32 (the 16^3-brick fetch shape)
  a0small - Pallas take_along_axis axis=0, one-shot, tiny tables
  vmem    - max single VMEM scratch allocation
  ohg     - one-hot-rows MXU + axis1 shuffle full gather in Pallas (validated)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe_chase(n=1 << 20, r=1 << 21, k=16):
    rng = np.random.default_rng(0)
    perm = rng.permutation(n).astype(np.int32)
    tbl = jnp.asarray(perm)
    idx0 = jnp.asarray(rng.integers(0, n, (r,)), jnp.int32)

    @jax.jit
    def chase(tbl, idx):
        def body(i, idx):
            return jnp.take(tbl, idx, mode="clip")
        return jax.lax.fori_loop(0, k, body, idx)

    dt, _ = timeit(chase, tbl, idx0)
    print(f"chase flat n={n} r={r} k={k}: {dt*1e3:8.2f} ms  "
          f"{r*k/dt/1e9:6.2f} G deps-gathers/s")


def probe_chase_rows(n=1 << 18, r=1 << 21, k=16, cols=8):
    rng = np.random.default_rng(0)
    tbl = rng.integers(0, n, (n, cols)).astype(np.uint32)
    tbl[:, 0] = rng.permutation(n).astype(np.uint32)
    tbl = jnp.asarray(tbl)
    idx0 = jnp.asarray(rng.integers(0, n, (r,)), jnp.int32)

    @jax.jit
    def chase(tbl, idx):
        def body(i, idx):
            rows = jnp.take(tbl, idx, axis=0, mode="clip")
            return rows[:, 0].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, idx)

    dt, _ = timeit(chase, tbl, idx0)
    print(f"chase rows{cols} n={n} r={r} k={k}: {dt*1e3:8.2f} ms  "
          f"{r*k/dt/1e9:6.2f} G deps-row-gathers/s")


def probe_a0small():
    for n_rows, r_rows in [(8, 16), (32, 16), (128, 16), (1024, 16)]:
        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def run(tbl, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((r_rows, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl, idx)

        tbl = jnp.asarray(
            np.random.default_rng(0).integers(0, 99, (n_rows, 128)), jnp.int32
        )
        idxn = np.random.default_rng(1).integers(0, n_rows, (r_rows, 128))
        idx = jnp.asarray(idxn, jnp.int32)
        try:
            out = np.asarray(jax.block_until_ready(run(tbl, idx)))
            ref = np.take_along_axis(np.asarray(tbl), idxn, axis=0)
            ok = np.array_equal(out, ref)
            print(f"a0 one-shot n_rows={n_rows:>5}: ok correct={ok}")
        except Exception as e:
            print(f"a0 one-shot n_rows={n_rows:>5}: FAIL {type(e).__name__}: {str(e)[:160]}")


def probe_vmem():
    for mb in [16, 32, 64, 100, 120]:
        n = mb * 1024 * 1024 // 4 // 128

        def kernel(x_ref, out_ref, scratch):
            scratch[0, :] = x_ref[0, :] * 2.0
            out_ref[:] = scratch[0, :][None, :] + scratch[n - 1, :][None, :]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            )(x)

        try:
            jax.block_until_ready(run(jnp.ones((1, 128), jnp.float32)))
            print(f"vmem scratch {mb} MB: ok")
        except Exception as e:
            print(f"vmem scratch {mb} MB: FAIL {type(e).__name__}: {str(e)[:120]}")
            break


def probe_ohg(n_rows=128, r_rows=16, k=32):
    """Full arbitrary gather from (n_rows,128) table: one-hot rows @ tbl
    (MXU, f32 exact to 2^24) then axis1 lane shuffle. Validated + timed."""
    n = n_rows * 128

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:].astype(jnp.float32)

        def body(i, idx):
            row = (idx >> 7).reshape(-1)  # [R]
            lane = idx & 127
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (r_rows * 128, n_rows), 1)
                == row[:, None]
            ).astype(jnp.float32)
            rows = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            rows = rows.reshape(r_rows, 128, 128)
            # lane shuffle: out[i,j] = rows[i, j, lane[i,j]] -- need
            # take_along_axis on last axis of 3d... reshape to 2d rows:
            v = jnp.take_along_axis(
                rows.reshape(r_rows * 128, 128),
                (lane.reshape(-1))[:, None],
                axis=1,
            ).reshape(r_rows, 128)
            return (idx + v.astype(jnp.int32)) & (n - 1)

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r_rows, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbln = rng.integers(0, n, (n_rows, 128)).astype(np.int32)
    idxn = rng.integers(0, n, (r_rows, 128)).astype(np.int32)
    try:
        dt, out = timeit(run, jnp.asarray(tbln), jnp.asarray(idxn))
        # validate 1 step on host
        flat = tbln.reshape(-1)
        exp = idxn.copy()
        for _ in range(k):
            exp = (exp + flat[exp]) & (n - 1)
        ok = np.array_equal(np.asarray(out), exp)
        r = r_rows * 128
        print(f"ohg n={n:>7} r={r}: correct={ok} {dt*1e6:9.1f} us  "
              f"{r*k/dt/1e9:6.3f} G gathers/s")
    except Exception as e:
        print(f"ohg n={n:>7}: FAIL {type(e).__name__}: {str(e)[:300]}")


ALL = {
    "chase": probe_chase,
    "chase_rows": probe_chase_rows,
    "a0small": probe_a0small,
    "vmem": probe_vmem,
    "ohg": lambda: probe_ohg(128),
    "ohg1k": lambda: probe_ohg(1024),
}

if __name__ == "__main__":
    for nm in (sys.argv[1:] or ["chase", "chase_rows", "a0small", "vmem"]):
        ALL[nm]()
