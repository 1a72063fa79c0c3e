"""Can Mosaic transpose (128,128) u32 tiles in-kernel, and at what rate?
Compares: XLA .T.reshape on [N,128] -> [128, N/128, 128] vs a Pallas kernel
reading (S*128, 128) lane-major blocks and writing (128, S, 128) word-major
blocks via 16 in-VMEM tile transposes. Chained timing (dispatch cannot hide
device time). Also probes the (128,36) mask-tile transpose.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16
N = 1 << 19  # rows


def timeit_chained(step, x0, iters=20):
    x = x0
    out = step(x)
    _ = np.asarray(out[-1][:1])
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(x)
        x = out[-1]
    _ = np.asarray(x[:1])
    return (time.perf_counter() - t0) / iters


def probe(cols, pallas_impl):
    nb = N // (S * 128)

    if pallas_impl:
        def kernel(x_ref, o_ref):
            for s in range(S):
                tile = x_ref[0, s * 128:(s + 1) * 128, :]
                o_ref[:, s, :] = tile.T

        call = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, S * 128, cols), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cols, S, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cols, nb * S, 128), jnp.uint32),
        )

        @jax.jit
        def step(x):
            o = call(x.reshape(nb, S * 128, cols))
            nxt = x + o[0, 0, 0]
            return o, nxt
    else:
        @jax.jit
        def step(x):
            o = x.T.reshape(cols, N // 128, 128)
            nxt = x + o[0, 0, 0]
            return o, nxt

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 1 << 30, (N, cols), dtype=np.uint32))
    name = "pallas" if pallas_impl else "xla   "
    try:
        dt = timeit_chained(step, x0, iters=20)
        bw = N * cols * 4 * 2 / dt / 1e9
        print(f"{name} cols={cols:4d}: {dt*1e6:9.1f} us  {bw:7.1f} GB/s "
              f"(r+w)", flush=True)
    except Exception as e:
        print(f"{name} cols={cols:4d}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    for cols in (128, 64, 36):
        probe(cols, pallas_impl=False)
        probe(cols, pallas_impl=True)
