"""Pin down the real costs in the XLA traversal loop on this chip:
  - flat u32 take vs row-take [N,2]/[N,4] axis=0
  - while_loop per-iteration dispatch overhead vs R
  - the 64-cell selection body VPU cost at various R
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe_take_forms(n=1 << 20, r=1 << 20, k=8):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, (r,)), jnp.int32)
    flat = jnp.asarray(rng.integers(0, 1 << 30, (n,)), jnp.uint32)
    t2 = jnp.asarray(rng.integers(0, 1 << 30, (n, 2)), jnp.uint32)
    t4 = jnp.asarray(rng.integers(0, 1 << 30, (n, 4)), jnp.uint32)

    @jax.jit
    def take_flat(tbl, idx):
        def body(i, c):
            v = jnp.take(tbl, (idx + c) & (n - 1), mode="clip")
            return c + (v & 1)
        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(idx))

    @jax.jit
    def take_rows2(tbl, idx):
        def body(i, c):
            v = jnp.take(tbl, (idx + c) & (n - 1), axis=0, mode="clip")
            return c + (v[:, 0] & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(idx))

    @jax.jit
    def take_rows4(tbl, idx):
        def body(i, c):
            v = jnp.take(tbl, (idx + c) & (n - 1), axis=0, mode="clip")
            return c + (v[:, 0] & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(idx))

    @jax.jit
    def take_2flat(tbl, idx):
        def body(i, c):
            j = (idx + c) & (n - 1)
            v0 = jnp.take(tbl[:, 0], j, mode="clip")
            v1 = jnp.take(tbl[:, 1], j, mode="clip")
            return c + ((v0 ^ v1) & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(idx))

    for nm, fn, tb in [
        ("flat_u32", take_flat, flat),
        ("rows2", take_rows2, t2),
        ("rows4", take_rows4, t4),
        ("2x_flat", take_2flat, t2),
    ]:
        dt, _ = timeit(fn, tb, idx)
        print(f"take {nm:>9} n={n} r={r}: {dt*1e3:8.2f} ms  "
              f"{r*k/dt/1e9:7.2f} G rows/s")


def probe_while_overhead():
    for r in [1 << 14, 1 << 17, 1 << 20, 1 << 22]:
        x = jnp.ones((r,), jnp.float32)

        @jax.jit
        def loop(x):
            def cond(st):
                i, x = st
                return i < 256

            def body(st):
                i, x = st
                return i + 1, x * 1.0000001 + 1e-9

            return jax.lax.while_loop(cond, body, (0, x))[1]

        dt, _ = timeit(loop, x)
        print(f"while r={r:>8}: {dt*1e3:8.2f} ms, {dt/256*1e6:7.1f} us/iter")


def probe_selection_body(r=1 << 20, k=32):
    """The brick64 selection arithmetic alone (no gather), k iterations."""
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random((r, 3)), jnp.float32)
    dt_ = jnp.asarray(rng.random((r, 3)) + 0.5, jnp.float32)
    mask_lo = jnp.asarray(rng.integers(0, 1 << 31, (r,)), jnp.uint32)
    mask_hi = jnp.asarray(rng.integers(0, 1 << 31, (r,)), jnp.uint32)

    _CX = [((c >> 0) & 1) | (((c >> 3) & 1) << 1) for c in range(64)]
    _CY = [((c >> 1) & 1) | (((c >> 4) & 1) << 1) for c in range(64)]
    _CZ = [((c >> 2) & 1) | (((c >> 5) & 1) << 1) for c in range(64)]

    @jax.jit
    def sel(t1, dts, mask_lo, mask_hi):
        def body(i, carry):
            best_t, rk = carry
            scale = 1.0
            qs = 0.25
            tbx = [t1[:, 0] - dts[:, 0] * (scale - qs * kk) for kk in range(5)]
            tby = [t1[:, 1] - dts[:, 1] * (scale - qs * kk) for kk in range(5)]
            tbz = [t1[:, 2] - dts[:, 2] * (scale - qs * kk) for kk in range(5)]
            bt = jnp.full((r,), 3.4e38)
            bc = jnp.full((r,), 64, jnp.int32)
            for c in range(64):
                en = jnp.maximum(tbx[_CX[c]], jnp.maximum(tby[_CY[c]], tbz[_CZ[c]]))
                ex = jnp.minimum(
                    tbx[_CX[c] + 1], jnp.minimum(tby[_CY[c] + 1], tbz[_CZ[c] + 1])
                )
                c32 = jnp.uint32(c)
                lo = (mask_lo >> jnp.minimum(c32, 31)) & 1
                hi = (mask_hi >> jnp.uint32(max(c - 32, 0))) & 1
                occ = jnp.where(c < 32, lo, hi) == 1
                valid = occ & (en < ex) & (ex > 0.0) & (en > rk)
                better = valid & (en < bt)
                bt = jnp.where(better, en, bt)
                bc = jnp.where(better, jnp.int32(c), bc)
            return bt, rk + 0.001
        bt, rk = jax.lax.fori_loop(
            0, k, body, (jnp.zeros((r,)), jnp.zeros((r,)))
        )
        return bt
    dt, _ = timeit(sel, t1, dt_, mask_lo, mask_hi)
    print(f"sel64 r={r}: {dt*1e3:8.2f} ms  {dt/k*1e6:8.1f} us/iter  "
          f"{r*k/dt/1e6:8.1f} M cell-selects/s")


ALL = {
    "takes": probe_take_forms,
    "while": probe_while_overhead,
    "sel": probe_selection_body,
}

if __name__ == "__main__":
    for nm in (sys.argv[1:] or list(ALL)):
        ALL[nm]()
