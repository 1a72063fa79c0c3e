"""Why does the in-loop brick gather price at ~24 ns/row when isolated
takes of <=512 B rows price at ~6 ns/row?

Hypotheses probed, all on the W=164 brick-row shape (524288 ids):
  1. fused id chain: ids = where(emit,brick,0).reshape(-1) fused into the
     take forces a slow gather path; an optimization_barrier on ids may
     restore the isolated price.
  2. width cliff: W=164 (656 B) is the slow class even isolated; splitting
     into 128+36 columns with barriered ids may price both in the fast
     class in-loop too.
  3. table size: take of 524288 rows from a tiny [512, 164] table (VMEM
     class) vs the full [16296, 164] -- if tiny tables are much cheaper,
     per-block brick dedup + redistribute-take becomes profitable.
  4. while_loop context: same takes inside a lax.while_loop body (the real
     driver shape) vs a flat jit.
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
    W = 164
    s2 = 4096  # n_ids/128
    rng = np.random.default_rng(0)
    live = rng.random(n_ids) < 0.16
    emit = jnp.asarray(live.astype(np.int32).reshape(s2, 128))
    brick = jnp.asarray(
        rng.integers(0, n_rows, n_ids).astype(np.int32).reshape(s2, 128))
    tab = jnp.asarray(rng.integers(0, 2**31, (n_rows, W), np.int64), jnp.uint32)
    tab128 = tab[:, :128]
    tab36 = tab[:, 128:]
    tiny = tab[:512]

    # 0. baseline: the exact production gather_rows shape
    @jax.jit
    def g_prod(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        rows = jnp.take(tab, ids, axis=0, mode="clip")
        return rows.T.reshape(W, s2 // 32, 32 * 128)[0]

    report("prod (where+take+T)", timeit(lambda: g_prod(emit, brick)), n_ids)

    # 1. barriered ids
    @jax.jit
    def g_bar(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        ids = jax.lax.optimization_barrier(ids)
        rows = jnp.take(tab, ids, axis=0, mode="clip")
        return rows.T.reshape(W, s2 // 32, 32 * 128)[0]

    report("barriered ids", timeit(lambda: g_bar(emit, brick)), n_ids)

    # 2. precomputed ids (no fusion possible)
    ids_pre = jnp.where(emit != 0, brick, 0).reshape(-1)
    f_take = jax.jit(lambda ids: jnp.take(tab, ids, axis=0, mode="clip"))
    report("precomputed ids, take only", timeit(lambda: f_take(ids_pre)), n_ids)

    # 3. split 128+36 with barrier
    @jax.jit
    def g_split(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        ids = jax.lax.optimization_barrier(ids)
        a = jnp.take(tab128, ids, axis=0, mode="clip")
        b = jnp.take(tab36, ids, axis=0, mode="clip")
        return a.T.reshape(128, s2 // 32, 32 * 128)[0], b[0]

    report("split 128+36, barriered", timeit(lambda: g_split(emit, brick)),
           n_ids)

    # 4. tiny table
    @jax.jit
    def g_tiny(emit, brick):
        ids = jnp.where(emit != 0, brick & 511, 0).reshape(-1)
        rows = jnp.take(tiny, ids, axis=0, mode="clip")
        return rows.T.reshape(W, s2 // 32, 32 * 128)[0]

    report("tiny [512,164] table", timeit(lambda: g_tiny(emit, brick)), n_ids)

    # 5. while_loop context: 4 chained rounds, ids derived from prior output
    @jax.jit
    def g_loop(emit, brick):
        def body(st):
            i, acc, br = st
            ids = jnp.where(emit != 0, br, 0).reshape(-1)
            rows = jnp.take(tab, ids, axis=0, mode="clip")
            w3 = rows.T.reshape(W, s2, 128)
            acc = acc + w3[0].astype(jnp.uint32)
            br = (br + w3[1][:, :].astype(jnp.int32)) & (n_rows - 1)
            return i + 1, acc, br

        st = (jnp.int32(0), jnp.zeros((s2, 128), jnp.uint32), brick)
        st = jax.lax.while_loop(lambda st: st[0] < 4, body, st)
        return st[1]

    dt = timeit(lambda: g_loop(emit, brick))
    report("while_loop 4 rounds (per round)", dt / 4, n_ids)

    # 6. while_loop + barriered ids
    @jax.jit
    def g_loop_bar(emit, brick):
        def body(st):
            i, acc, br = st
            ids = jnp.where(emit != 0, br, 0).reshape(-1)
            ids = jax.lax.optimization_barrier(ids)
            rows = jnp.take(tab, ids, axis=0, mode="clip")
            w3 = rows.T.reshape(W, s2, 128)
            acc = acc + w3[0].astype(jnp.uint32)
            br = (br + w3[1][:, :].astype(jnp.int32)) & (n_rows - 1)
            return i + 1, acc, br

        st = (jnp.int32(0), jnp.zeros((s2, 128), jnp.uint32), brick)
        st = jax.lax.while_loop(lambda st: st[0] < 4, body, st)
        return st[1]

    dt = timeit(lambda: g_loop_bar(emit, brick))
    report("while_loop + barrier (per round)", dt / 4, n_ids)

    # 7. sorted-ids variant of prod (does locality matter at all?)
    brick_sorted = jnp.sort(brick, axis=None).reshape(s2, 128)
    report("prod, sorted ids", timeit(lambda: g_prod(emit, brick_sorted)),
           n_ids)




def main2():
    """Split variants at the REAL consumption shape [W, s2, 128]."""
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
    pieces = {
        "128+36": (tab[:, :128], tab[:, 128:]),
        "82+82": (tab[:, :82], tab[:, 82:]),
        "64x2+36": (tab[:, :64], tab[:, 64:128], tab[:, 128:]),
        "128+128pad": (tab[:, :128],
                       jnp.pad(tab[:, 128:], ((0, 0), (0, 92)))),
    }
    for name, ps in pieces.items():
        @jax.jit
        def g(emit, brick, ps=ps):
            ids = jnp.where(emit != 0, brick, 0).reshape(-1)
            outs = []
            for p in ps:
                r = jnp.take(p, ids, axis=0, mode="clip")
                outs.append(r.T.reshape(p.shape[1], s2, 128))
            return [o[0] for o in outs]

        report(f"full-shape split {name}", timeit(lambda: g(emit, brick)),
               n_ids)

    # single takes at several widths, full consumption shape
    for W in (36, 64, 82, 96, 128, 160, 164):
        p = tab[:, :W]

        @jax.jit
        def g1(emit, brick, p=p, W=W):
            ids = jnp.where(emit != 0, brick, 0).reshape(-1)
            r = jnp.take(p, ids, axis=0, mode="clip")
            return r.T.reshape(W, s2, 128)[0]

        report(f"single take W={W}", timeit(lambda: g1(emit, brick)), n_ids)


if __name__ == "__main__":
    if os.environ.get("PART") == "2":
        main2()
        sys.exit()
    main()
