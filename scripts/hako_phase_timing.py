"""Time kernel A, the brick gather, kernel B, and the XLA bookkeeping of a
round separately, plus the true round count, at the bench scene."""

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

from massivevoxelraytracing_tpu.models import raycast, scene  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402


def timeit(fn, iters=16):
    """Pipelined: queue all calls, sync once -- a per-call block_until_ready
    over the tunnel adds ~30 ms of round-trip latency per call, which buries
    the real kernel cost."""
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    hk.SCAN_IMPL = os.environ.get("SCANI", "walk")
    hk.GATHER_IMPL = os.environ.get("GATHI", "multsum")
    hk.MAX_PROBES = int(os.environ.get("P", 1))
    hk.MAX_DDA_ITERS = int(os.environ.get("D", 12))

    grid_res = int(os.environ.get("RES", 256))
    width, height = 1920, 1088
    tri = meshgen.bumpy_sphere(5, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    tree = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="hako")
    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0)

    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    n = width * height
    packet = raycast.MAX_RAY_PACKET
    order_pad, _ = raycast._cached_order(width, height, packet)
    idx = np.asarray(order_pad)
    live = idx >= 0
    safe = np.maximum(idx, 0)
    px = (safe % width).astype(np.float32)
    py = (safe // width).astype(np.float32)
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * (px + 0.5) / width) * (width / height)
    v = th - 2.0 * th * (py + 0.5) / height
    rd = (u[:, None] * np.asarray(cam.right) + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)
    ro = np.where(live[:, None], np.asarray(cam.o)[None, :], 1e9).astype(np.float32)

    R = len(ro)
    nb = R // hk.RB
    cap = max(nb // 4, 1)
    s2 = cap * hk.S_BLK
    shape = (s2, 128)

    rays_c = [jnp.asarray(x[: cap * hk.RB].reshape(shape)) for x in
              (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])]
    tq_c = jnp.zeros(shape, jnp.float32)
    act = jnp.ones(shape, jnp.int32)
    sf = jnp.concatenate([tree.lower.astype(jnp.float32),
                          tree.upper.astype(jnp.float32),
                          jnp.zeros(2, jnp.float32)]).reshape(1, 8)

    smem = pl.BlockSpec((1, 8), hk._rep, memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((hk.S_BLK, 128), hk._blk, memory_space=pltpu.VMEM)
    tab_specs = [hk.tab_spec(f) for f in level_rows]
    a_call = pl.pallas_call(
        hk._make_kernel_a(T, level_rows, stable=False),
        grid=(cap,),
        in_specs=[smem, smem] + tab_specs + [vblk] * 8,
        out_specs=[vblk] * 8,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
    )
    a_jit = jax.jit(lambda *a: a_call(*a))
    dt_a = timeit(lambda: a_jit(scal_i, sf, *tabs, *rays_c, tq_c, act))
    print(f"kernel A ({cap} blocks, P={hk.MAX_PROBES}): {dt_a*1e3:7.2f} ms  "
          f"({dt_a/cap*1e6:6.1f} us/block)", flush=True)

    emit, brick, bt1x, bt1y, bt1z, tqe, tqn, exh = a_jit(
        scal_i, sf, *tabs, *rays_c, tq_c, act)
    print(f"   emit={float(jnp.mean((emit!=0)*1.0)):.3f} "
          f"exh={float(jnp.mean((exh!=0)*1.0)):.3f}", flush=True)

    # brick gather (split two-take form, matching the driver)
    tab_a, tab_m = bricks

    @jax.jit
    def gather(emit, brick):
        ids = jnp.where(emit != 0, brick, 0).reshape(-1)
        rows_a = jnp.take(tab_a, ids, axis=0, mode="clip")
        rows_m = jnp.take(tab_m, ids, axis=0, mode="clip")
        return (rows_a.reshape(cap, hk.RB, 128),
                rows_m.reshape(cap, hk.RB, hk.BRICK_WORDS - 128))

    dt_g = timeit(lambda: gather(emit, brick))
    print(f"brick gather ({cap*hk.RB} rows, split, lane-major): "
          f"{dt_g*1e3:7.2f} ms", flush=True)
    w3a, w3m = gather(emit, brick)

    wblk_a = pl.BlockSpec((1, hk.RB, 128), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    wblk_m = pl.BlockSpec((1, hk.RB, hk.BRICK_WORDS - 128),
                          lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    b_call = pl.pallas_call(
        hk._make_kernel_b(T, False, stable=False),
        grid=(cap,),
        in_specs=[smem, wblk_a, wblk_m] + [vblk] * 11,
        scratch_shapes=[
            pltpu.VMEM((128, hk.S_BLK, 128), jnp.uint32),
            pltpu.VMEM((hk.BRICK_WORDS - 128, hk.S_BLK, 128), jnp.uint32),
        ],
        out_specs=[vblk] * 8,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ],
    )
    b_jit = jax.jit(lambda *a: b_call(*a))
    go = emit * act
    dt_b = timeit(
        lambda: b_jit(sf, w3a, w3m, *rays_c, bt1x, bt1y, bt1z, tqe, go))
    print(f"kernel B ({cap} blocks, D={hk.MAX_DDA_ITERS}): {dt_b*1e3:7.2f} ms  "
          f"({dt_b/cap*1e6:6.1f} us/block)", flush=True)

    # bookkeeping-only round (no kernels): pick/put cost
    resolved = jnp.zeros((nb, hk.RB), jnp.int32)
    t_q = jnp.zeros((nb, hk.RB), jnp.float32)
    rays_b = [jnp.asarray(x.reshape(nb, hk.RB)) for x in
              (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])]

    @jax.jit
    def bookkeeping(resolved, t_q):
        actb = jnp.any(resolved == 0, axis=1)
        sel = jnp.nonzero(actb, size=cap, fill_value=nb)[0]
        picked = [jnp.take(x, sel, axis=0, mode="clip") for x in rays_b]
        tqp = jnp.take(t_q, sel, axis=0, mode="clip")
        out = t_q.at[sel].set(tqp + 1.0, mode="drop")
        return out, picked[0]

    dt_k = timeit(lambda: bookkeeping(resolved, t_q))
    print(f"bookkeeping (pick+put, {nb} blocks): {dt_k*1e3:7.2f} ms", flush=True)

    # full traversal + round count
    def full():
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            jnp.asarray(ro), jnp.asarray(rd),
            T=T, level_rows=level_rows, shadow=False)
        return float(jnp.sum(jnp.where(t < 1e37, t, 0.0)))

    dt_f = timeit(lambda: full(), iters=3)
    print(f"full frame: {dt_f*1e3:.1f} ms = {R/dt_f/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
