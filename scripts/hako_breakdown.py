"""Per-phase breakdown of the hako traversal: kernel A, brick gather,
kernel B, XLA bookkeeping, and the round count a frame actually needs."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from massivevoxelraytracing_tpu.models import raycast, scene  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402


def timeit(fn, iters=8):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters, out


def main():
    grid_res = int(os.environ.get("RES", 256))
    width, height = 1920, 1088
    tri = meshgen.bumpy_sphere(5, radius=0.9)
    origin, dps = meshgen.fit_grid(tri, grid_res)
    tree = scene.build_scene(
        tri, origin=origin, dps=dps, grid_res=grid_res, accel="hako"
    )
    print(f"tree: T={tree.T} bricks={tree.n_bricks} levels={tree.n_per_level} "
          f"bytes={tree.memory_bytes()/1e6:.1f}MB", flush=True)

    lo = np.asarray(origin)
    extent = float(dps) * grid_res
    center = lo + extent / 2
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
        target=center, fovy_deg=40.0,
    )
    n = width * height
    packet = raycast.MAX_RAY_PACKET
    n_pad = -(-n // packet) * packet
    order_pad, inv = raycast._cached_order(width, height, packet)
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

    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    R = n_pad
    nb = R // hk.RB
    cap = max(nb // 4, 1)
    print(f"rays={R} nb={nb} cap={cap} T={T} level_rows={level_rows}", flush=True)

    ro_j = jnp.asarray(ro)
    rd_j = jnp.asarray(rd)

    # full traversal timing
    def full():
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper, ro_j, rd_j,
            T=T, level_rows=level_rows, shadow=False)
        return t.sum()
    dt, _ = timeit(full, iters=4)
    print(f"full traversal: {dt*1e3:.1f} ms  = {R/dt/1e6:.1f} Mrays/s", flush=True)

    # count rounds: run the jitted while_loop with increasing max_rounds
    # cheaper: use the body directly and read 'resolved' evolution
    sf = jnp.concatenate([tree.lower.astype(jnp.float32),
                          tree.upper.astype(jnp.float32),
                          jnp.zeros(2, jnp.float32)]).reshape(1, 8)
    rays_b = [ro_j[:, 0].reshape(nb, hk.RB), ro_j[:, 1].reshape(nb, hk.RB),
              ro_j[:, 2].reshape(nb, hk.RB), rd_j[:, 0].reshape(nb, hk.RB),
              rd_j[:, 1].reshape(nb, hk.RB), rd_j[:, 2].reshape(nb, hk.RB)]
    body = hk._make_round(bricks, snodes, tabs, scal_i, sf, rays_b,
                          nb=nb, cap=cap, T=T, level_rows=level_rows,
                          shadow=False, interpret=False,
                          pack_div=hk.PACK_DIV, uniq=hk.UNIQ,
                          max_probes=hk.MAX_PROBES,
                          max_dda=hk.MAX_DDA_ITERS)
    body_j = jax.jit(body)
    st = hk._init_state(nb)
    st = jax.block_until_ready(body_j(st))  # compile
    st = hk._init_state(nb)
    t0 = time.perf_counter()
    rounds = 0
    while rounds < 256:
        st = body_j(st)
        rounds += 1
        if rounds % 8 == 0:
            unresolved = int(jnp.sum(jnp.any(st[1] == 0, axis=1)))
            if unresolved == 0:
                break
    jax.block_until_ready(st)
    dt_all = time.perf_counter() - t0
    print(f"rounds={rounds} total={dt_all*1e3:.1f} ms  "
          f"per-round={dt_all/rounds*1e3:.2f} ms", flush=True)

    # single round cost (fixed state, amortized)
    st0 = hk._init_state(nb)
    st0 = jax.block_until_ready(body_j(st0))
    def one_round():
        return body_j(st0)[3]
    dt, _ = timeit(one_round, iters=8)
    print(f"one round (steady): {dt*1e3:.2f} ms  "
          f"({cap*hk.RB/dt/1e6:.1f} M lane-rounds/s)", flush=True)


if __name__ == "__main__":
    main()
