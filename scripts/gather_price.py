"""Is the brick-row gather priced per ROW or per BYTE on this backend?
take of 524288 ids from [16296, W] u32 for several widths W, with
realistic (16% live, 84% zero), all-random, and sorted id distributions."""

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


def main():
    n_rows = 16296
    n_ids = 524288
    rng = np.random.default_rng(0)
    live = rng.random(n_ids) < 0.16
    ids_mixed = np.where(live, rng.integers(0, n_rows, n_ids), 0).astype(np.int32)
    ids_rand = rng.integers(0, n_rows, n_ids).astype(np.int32)
    ids_sort = np.sort(ids_rand).astype(np.int32)

    for W in tuple(int(x) for x in __import__('os').environ.get('WS', '4,16,41,82,164').split(',')):
        tab = jnp.asarray(rng.integers(0, 2**31, (n_rows, W), np.int64),
                          jnp.uint32)
        f = jax.jit(lambda ids, tab=tab: jnp.take(tab, ids, axis=0,
                                                  mode="clip"))
        for name, ids in (("mixed16", ids_mixed), ("rand", ids_rand),
                          ("sorted", ids_sort)):
            dt = timeit(lambda ids=jnp.asarray(ids): f(ids))
            mb = n_ids * W * 4 / 1e6
            print(f"W={W:4d} {name:8s}: {dt*1e3:7.2f} ms  "
                  f"{n_ids/dt/1e6:6.1f} M rows/s  {mb/dt/1e3:6.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
