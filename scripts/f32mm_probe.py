"""Is a one-hot f32 matmul exact for 22-bit integer values on the MXU?
(If yes, node tables can shrink from 11 byte-segments to 4 f32-limb
segments.) Also times composite one-hot gather vs two-level multsum."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16
rng = np.random.default_rng(0)


def run(kernel, args, outshape, iters=30):
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(outshape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.block_until_ready(call(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(call(*args))
    return (time.perf_counter() - t0) / iters, np.asarray(out)


# exactness: one-hot f32 matmul over 22-bit values
N = 1024
vals = rng.integers(0, 1 << 22, (N,)).astype(np.float32)
tab = jnp.asarray(vals.reshape(8, 128))
idx = jnp.asarray(rng.integers(0, N, (128, 1)), jnp.int32)


def k_exact(tab_ref, idx_ref, out_ref):
    rcol = idx_ref[:] >> 7
    oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1) == rcol).astype(
        jnp.float32)
    a = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
    lcol = idx_ref[:] & 127
    lm = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) == lcol).astype(
        jnp.float32)
    out_ref[:] = jnp.broadcast_to(
        jnp.sum(a * lm, axis=1, keepdims=True), (128, 128))


dt, out = run(k_exact, [tab, idx], (128, 128))
want = vals[np.asarray(idx)[:, 0]]
exact = (out[:, 0] == want).all()
print(f"f32 22-bit one-hot matmul exact: {exact}  ({dt*1e6:.0f} us)", flush=True)

# timing: two-level multsum (11 segs) vs composite one-hot (16-lane table)
rows = 32  # 4096 nodes
tab11 = jnp.asarray(rng.integers(0, 256, (rows, 11 * 128)).astype(np.float32))
tabf = jnp.asarray(rng.integers(0, 256, (rows * 128, 16)).astype(np.float32))
idxs = jnp.asarray(rng.integers(0, rows * 128, (S, 128)), jnp.int32)


def k_multsum(tab_ref, idx_ref, out_ref):
    idx_t = idx_ref[:].T
    cols = []
    for ch in range(S):
        rcol = idx_t[:, ch:ch + 1] >> 7
        lcol = idx_t[:, ch:ch + 1] & 127
        oh = (jax.lax.broadcasted_iota(jnp.int32, (128, rows), 1) == rcol
              ).astype(jnp.float32)
        a = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
        tot = jnp.zeros((128, 1), jnp.float32)
        lm = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) == lcol
              ).astype(jnp.float32)
        for k in range(11):
            tot += jnp.sum(a[:, k * 128:(k + 1) * 128] * lm, axis=1,
                           keepdims=True)
        cols.append(tot)
    out_ref[:] = jnp.concatenate(cols, axis=1).T


def k_composite(tab_ref, idx_ref, out_ref):
    idx_t = idx_ref[:].T  # [128, S]
    cols = []
    Nn = rows * 128
    for ch in range(S):
        col = idx_t[:, ch:ch + 1]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (128, Nn), 1) == col
              ).astype(jnp.float32)
        a = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
        tot = jnp.sum(a, axis=1, keepdims=True)  # stand-in consume of 16 segs
        cols.append(tot)
    out_ref[:] = jnp.concatenate(cols, axis=1).T


dt1, _ = run(k_multsum, [tab11, idxs], (S, 128))
dt2, _ = run(k_composite, [tabf, idxs], (S, 128))
print(f"two-level multsum 11seg rows={rows}: {dt1*1e6:7.0f} us", flush=True)
print(f"composite one-hot N={rows*128}:     {dt2*1e6:7.0f} us", flush=True)
