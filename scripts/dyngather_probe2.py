"""Probe 2D dynamic gather forms in Mosaic on this toolchain."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16


def run(name, kernel, shapes, outshape, iters=50):
    args = [
        jnp.asarray(np.random.default_rng(i).integers(0, hi, sh), jnp.int32)
        for i, (sh, hi) in enumerate(shapes)
    ]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(outshape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.block_until_ready(call(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.block_until_ready(call(*args))
        dt = (time.perf_counter() - t0) / iters
        # verify vs numpy
        print(f"{name}: OK {dt*1e6:7.0f} us", flush=True)
        return out, args
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {msg}", flush=True)
        return None, args


# 1) take_along_axis along lanes (axis=1), operand [S,128]
def k_taa1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 128, axis=1)

out, args = run("taa axis=1 [16,128]", k_taa1,
                [((S, 128), 1 << 30), ((S, 128), 128)], (S, 128))
if out is not None:
    t, i = np.asarray(args[0]), np.asarray(args[1]) % 128
    ref = np.take_along_axis(t, i, axis=1)
    print("   correct:", bool((np.asarray(out) == ref).all()), flush=True)

# 2) take_along_axis along lanes, wider operand [S, 256] (2 vregs in lanes)
def k_taa1w(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 256, axis=1)[:, :128]

run("taa axis=1 [16,256]", k_taa1w,
    [((S, 256), 1 << 30), ((S, 256), 256)], (S, 128))

# 3) take_along_axis along sublanes (axis=0), [S,128]
def k_taa0(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % S, axis=0)

out, args = run("taa axis=0 [16,128]", k_taa0,
                [((S, 128), 1 << 30), ((S, 128), S)], (S, 128))
if out is not None:
    t, i = np.asarray(args[0]), np.asarray(args[1]) % S
    ref = np.take_along_axis(t, i, axis=0)
    print("   correct:", bool((np.asarray(out) == ref).all()), flush=True)

# 4) taa axis=0 with tall operand [128, 128]
def k_taa0t(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 128, axis=0)[:S]

run("taa axis=0 [128,128] idx[16]", k_taa0t,
    [((128, 128), 1 << 30), ((S, 128), 128)], (S, 128))
