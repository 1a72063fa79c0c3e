"""Probe the full one-hot table-gather helper for the hako kernels:
rays live as (S,128); gather = reshape->(R,1), one-hot rows matmul [R,rows]@
[rows,640], lane-mask extraction, reshape back. Validates vs numpy + times."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16          # sublane rows of the ray block
R = S * 128     # rays per block
W = 5           # words per node


def make_gather(rows, k):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # [rows, W*128] f32

        def body(i, idx):
            idxf = idx.reshape(R, 1)
            row = idxf >> 7
            lane = idxf & 127
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (R, rows), 1) == row
            ).astype(jnp.float32)
            A = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            lm = (
                jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1) == lane
            ).astype(jnp.float32)
            words = []
            for s in range(W):
                ws = jnp.sum(A[:, s * 128:(s + 1) * 128] * lm, axis=1,
                             keepdims=True)  # [R,1]
                words.append(ws)
            v = (words[0] + words[1] + words[2] + words[3] + words[4])
            vi = v.astype(jnp.int32).reshape(S, 128)
            return (idx + vi) % (rows * 128)

        out_ref[:] = jax.lax.fori_loop(0, k, body, idx_ref[:])

    return kernel


def run(rows, k=16, iters=10):
    n = rows * 128
    rng = np.random.default_rng(0)
    tabn = rng.integers(0, 1 << 16, (rows, W * 128)).astype(np.float32)
    idxn = rng.integers(0, n, (S, 128)).astype(np.int32)

    @jax.jit
    def go(tab, idx):
        out = pl.pallas_call(
            make_gather(rows, k),
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        return jnp.sum(out)

    try:
        v = int(go(jnp.asarray(tabn), jnp.asarray(idxn)))
        t0 = time.perf_counter()
        for _ in range(iters):
            v = int(go(jnp.asarray(tabn), jnp.asarray(idxn)))
        dt = (time.perf_counter() - t0) / iters
        # host check
        exp = idxn.copy()
        for _ in range(k):
            vv = np.zeros((S, 128), np.int64)
            for s in range(W):
                vv += tabn[exp >> 7, s * 128 + (exp & 127)].astype(np.int64)
            exp = (exp + vv.astype(np.int32)) % n
        ok = int(exp.sum()) == v
        print(f"ohg rows={rows:>5} (n={n:>7}): correct={ok} "
              f"{dt/k*1e6:8.2f} us/gather-of-{R}  "
              f"({R*k/dt/1e6:8.1f} M node-fetches/s)")
    except Exception as e:
        print(f"ohg rows={rows:>5}: FAIL {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    for rows in [1, 8, 104, 512]:
        run(rows)
