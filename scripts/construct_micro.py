"""Which vector constructs are slow in Mosaic on this chip? Chained
repeats of: fp min/max, compare+select, int add/and/shift-by-const,
VARIABLE shift (per-lane amounts), variable shift via 5-step barrel,
int->float convert. All [16,128], K in-kernel repeats, data-dependent so
nothing hoists."""

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

S = 16
SHAPE = (S, 128)
K = 256
GRID = 64


def timeit(fn, iters=8):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters / (K * GRID)


def run(name, kernel, inputs, out_dtype):
    vblk = pl.BlockSpec(SHAPE, hk._blk, memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(GRID,), in_specs=[vblk] * len(inputs),
        out_specs=vblk,
        out_shape=jax.ShapeDtypeStruct(SHAPE, out_dtype),
    )
    jitted = jax.jit(lambda *a: call(*a))
    dt = timeit(lambda: jitted(*inputs))
    print(f"{name:36s}: {dt*1e9:8.2f} ns/op-rep", flush=True)


def main():
    rng = np.random.default_rng(0)
    af = jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
    bf = jnp.asarray(rng.uniform(0.5, 2.0, SHAPE).astype(np.float32))
    ai = jnp.asarray(rng.integers(0, 1 << 30, SHAPE).astype(np.int32))
    au = jnp.asarray(rng.integers(0, 1 << 32, SHAPE).astype(np.uint32))

    def k_minmax(a, b, o):
        x = a[:]
        y = b[:]
        for _ in range(K):
            x = jnp.minimum(jnp.maximum(x, y), y + x)
        o[:] = x

    run("fp max+min+add (3 ops)", k_minmax, [af, bf], jnp.float32)

    def k_cmpsel(a, b, o):
        x = a[:]
        y = b[:]
        for _ in range(K):
            x = jnp.where(x < y, x + y, y)
        o[:] = x

    run("fp cmp+where+add (3 ops)", k_cmpsel, [af, bf], jnp.float32)

    def k_int(a, o):
        x = a[:]
        for _ in range(K):
            x = ((x + 7) & 0x7FFFFFF) ^ (x >> 3)
        o[:] = x

    run("int add/and/xor/shr-const (4 ops)", k_int, [ai], jnp.int32)

    def k_vshift(a, m, o):
        x = a[:]
        mm = m[:].astype(jnp.uint32)
        for _ in range(K):
            sh = (x & 31).astype(jnp.uint32)
            x = x + ((mm >> sh) & jnp.uint32(1)).astype(jnp.int32)
        o[:] = x

    run("VARIABLE shift (per-lane amt)", k_vshift, [ai, au], jnp.int32)

    def k_barrel(a, m, o):
        x = a[:]
        mm = m[:].astype(jnp.uint32)
        for _ in range(K):
            sh = x & 31
            v = mm
            for b in (1, 2, 4, 8, 16):
                v = jnp.where((sh & b) != 0, v >> b, v)
            x = x + (v & jnp.uint32(1)).astype(jnp.int32)
        o[:] = x

    run("barrel shift (5 sel + 5 shr)", k_barrel, [ai, au], jnp.int32)

    def k_i2f(a, o):
        x = a[:]
        acc = jnp.zeros(SHAPE, jnp.float32)
        for _ in range(K):
            acc = acc + (x & 255).astype(jnp.float32)
            x = x ^ acc.astype(jnp.int32)
        o[:] = acc

    run("int->float convert (+2 ops)", k_i2f, [ai], jnp.float32)

    def k_bitat(a, ml, mh, o):
        x = a[:]
        lo = ml[:].astype(jnp.uint32)
        hi = mh[:].astype(jnp.uint32)
        for _ in range(K):
            occ = hk._bit_at(lo, hi, x & 63)
            x = x + occ.astype(jnp.int32)
        o[:] = x

    run("_bit_at (2 vshift + sel)", k_bitat, [ai, au, au], jnp.int32)

    def k_pc64(a, ml, mh, o):
        x = a[:]
        lo = ml[:].astype(jnp.uint32)
        hi = mh[:].astype(jnp.uint32)
        for _ in range(K):
            x = x + hk._pc64_below(lo, hi, x & 63)
        o[:] = x

    run("_pc64_below (2 vshift + popcnt)", k_pc64, [ai, au, au], jnp.int32)


if __name__ == "__main__":
    main()
