"""Does this Mosaic toolchain support cross-sublane dynamic gather yet?
Tries per-lane jnp.take / take_along_axis from a VMEM table inside a kernel
at several table sizes. Round 1 failed with 'Multiple source vregs along
gather dimension'."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_take(rows, name, via):
    S = 16
    tbl = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, (rows, 128)), jnp.int32)
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, rows * 128, (S, 128)), jnp.int32)

    def kernel(tbl_ref, idx_ref, out_ref):
        t = tbl_ref[:]
        i = idx_ref[:]
        if via == "flat_take":
            flat = t.reshape(-1)
            out_ref[:] = jnp.take(flat, i, mode="clip")
        elif via == "taa_sub":
            # gather along sublane axis with per-lane row index
            r = i // 128
            out_ref[:] = jnp.take_along_axis(t, r[:1, :] * 0 + r[:S, :] % rows, axis=0)[:S]
        elif via == "take_axis0":
            r = (i % rows).reshape(-1)
            out_ref[:] = jnp.take(t, r, axis=0, mode="clip")[
                : S * 128 : 128
            ].reshape(S, 128) if False else jnp.take(t, r[:S], axis=0, mode="clip")[:, :128][:S]

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)
        out = jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = jax.block_until_ready(
                pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(tbl, idx)
            )
        dt = (time.perf_counter() - t0) / 50
        print(f"{name} rows={rows} via={via}: OK {dt*1e6:.0f} us", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name} rows={rows} via={via}: FAIL {msg}", flush=True)
        return False


if __name__ == "__main__":
    for rows in (8, 64, 512):
        try_take(rows, "tbl", "flat_take")
    for rows in (8, 64, 512):
        try_take(rows, "tbl", "taa_sub")
