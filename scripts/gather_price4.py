"""Can the brick-row gather produce kernel B's word-major layout WITHOUT
the post-take transpose?

The production gather is take(tab[NB,164], ids, axis=0) -> [R,128]+[R,36]
followed by .T.reshape(...) because kernel B's block spec wants
[words, s2, 128]. If the .T is a large share of the 12.8 ms in-loop phase
cost, gathering COLUMNS from a pre-transposed [words, NB] table
(take axis=1) would hand back word-major directly.
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


def timeit(fn, iters=16):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def report(name, dt, n_ids):
    print(f"{name:44s}: {dt*1e3:7.2f} ms  {n_ids/dt/1e6:6.1f} M rows/s",
          flush=True)


def main():
    n_rows = 16296
    n_ids = 524288
    s2 = 4096
    rng = np.random.default_rng(0)
    live = rng.random(n_ids) < 0.16
    emit = jnp.asarray(live.astype(np.int32).reshape(s2, 128))
    brick = jnp.asarray(
        rng.integers(0, n_rows, n_ids).astype(np.int32).reshape(s2, 128))
    tab = jnp.asarray(rng.integers(0, 2**31, (n_rows, 164), np.int64),
                      jnp.uint32)
    tab128 = tab[:, :128]
    tab36 = tab[:, 128:]
    tab128T = tab128.T  # [128, NB]
    tab36T = tab36.T    # [36, NB]

    # A. take only, no transpose (the floor)
    @jax.jit
    def g_take_only(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        a = jnp.take(tab128, ids, axis=0, mode="clip")
        b = jnp.take(tab36, ids, axis=0, mode="clip")
        return a[0], b[0]

    report("A take axis=0 pair, no T", timeit(lambda: g_take_only(emit, brick)),
           n_ids)

    # B. production: take + transpose to [words, s2, 128]
    @jax.jit
    def g_prod(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        a = jnp.take(tab128, ids, axis=0, mode="clip")
        b = jnp.take(tab36, ids, axis=0, mode="clip")
        return (a.T.reshape(128, s2, 128)[0],
                b.T.reshape(36, s2, 128)[0])

    report("B prod: take pair + .T", timeit(lambda: g_prod(emit, brick)),
           n_ids)

    # C. transposed-table column gather: word-major out, no transpose
    @jax.jit
    def g_colT(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        a = jnp.take(tab128T, ids, axis=1, mode="clip")  # [128, R]
        b = jnp.take(tab36T, ids, axis=1, mode="clip")   # [36, R]
        return (a.reshape(128, s2, 128)[0], b.reshape(36, s2, 128)[0])

    report("C colT: take axis=1 pair", timeit(lambda: g_colT(emit, brick)),
           n_ids)

    # D. axis=1 single width sweep
    for W in (36, 128):
        tt = tab[:, :W].T

        @jax.jit
        def g1(emit, brick, tt=tt, W=W):
            ids = jnp.where(emit != 0, brick, 0).reshape(-1)
            r = jnp.take(tt, ids, axis=1, mode="clip")
            return r.reshape(W, s2, 128)[0]

        report(f"D single axis=1 W={W}", timeit(lambda: g1(emit, brick)),
               n_ids)

    # E. emit-density dependence of the axis=0 take (do 84% id-0 dups cost
    # the same as fully random ids?)
    for frac in (1.0, 0.5, 0.16, 0.02):
        livef = rng.random(n_ids) < frac
        emitf = jnp.asarray(livef.astype(np.int32).reshape(s2, 128))

        @jax.jit
        def gf(emit, brick):
            ids = jnp.where(emit != 0, brick, 0).reshape(-1)
            return jnp.take(tab128, ids, axis=0, mode="clip")[0]

        report(f"E axis=0 W=128 emit={frac:.2f}",
               timeit(lambda: gf(emitf, brick)), n_ids)

    # F. fewer ROWS gathered (the compaction payoff curve): take K of R ids
    for div in (1, 2, 4, 8):
        K = n_ids // div
        idsK = jnp.asarray(rng.integers(0, n_rows, K).astype(np.int32))

        @jax.jit
        def gk(ids):
            a = jnp.take(tab128, ids, axis=0, mode="clip")
            b = jnp.take(tab36, ids, axis=0, mode="clip")
            return (a.T.reshape(128, K // 128, 128)[0],
                    b.T.reshape(36, K // 128, 128)[0])

        report(f"F prod pair at K=R/{div}", timeit(lambda: gk(idsK)), K)


if __name__ == "__main__":
    main()
