"""Morton-encode microbenchmark -- the reference prints seconds per 100M
encodes for its three codecs (unittest.cpp:133-182). Ours compares the JAX
magic-bits codec (on the default device), the naive JAX codec, the native
C++ codec, and numpy, normalized to s/100M ops."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from massivevoxelraytracing_tpu.ops import morton  # noqa: E402
from massivevoxelraytracing_tpu.utils import native  # noqa: E402


def main():
    n = 1 << 22
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 21, n, dtype=np.uint32)
    y = rng.integers(0, 1 << 21, n, dtype=np.uint32)
    z = rng.integers(0, 1 << 21, n, dtype=np.uint32)
    jx, jy, jz = map(jnp.asarray, (x, y, z))

    def bench(name, fn, reps=5):
        fn()  # warm/compile
        t0 = time.time()
        for _ in range(reps):
            fn()
        dt = (time.time() - t0) / reps
        print(f"{name:28s}: {dt / n * 1e8:9.4f} s / 100M encodes")

    enc_magic = jax.jit(morton.encode_magicbits)
    bench("jax magicbits (device)", lambda: jax.block_until_ready(enc_magic(jx, jy, jz)))
    enc_naive = jax.jit(morton.encode_naive)
    bench("jax naive (device)", lambda: jax.block_until_ready(enc_naive(jx, jy, jz)))
    if native.get_lib() is not None:
        bench("native C++ magicbits", lambda: native.morton_encode(x, y, z))
    bench("numpy naive", lambda: morton.np_encode(x, y, z), reps=1)


if __name__ == "__main__":
    main()
