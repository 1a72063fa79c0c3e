"""Drive the hako round loop eagerly on TPU, logging per-round stats:
active blocks, emit/exhaust fractions, newly resolved lanes. Answers
"where do the rounds go" for the bench frame."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from massivevoxelraytracing_tpu.models import scene  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_kernels as hk  # noqa: E402
from massivevoxelraytracing_tpu.utils import meshgen  # noqa: E402


def main():
    grid_res = int(os.environ.get("RES", 256))
    width, height = 2048, 1152  # the padded frame shape render_frame uses
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

    # tile-major rays exactly like _render_frame_device (width 1920 live)
    TILE = 128
    live_w, live_h = 1920, 1080
    ntx = width // TILE
    n_pad = width * height
    lane = np.arange(n_pad, dtype=np.int64)
    ti = lane // (TILE * TILE)
    k = lane % (TILE * TILE)
    px = (ti % ntx) * TILE + (k % TILE)
    py = (ti // ntx) * TILE + (k // TILE)
    livem = (px < live_w) & (py < live_h)
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * (px + 0.5) / live_w) * (live_w / live_h)
    v = th - 2.0 * th * (py + 0.5) / live_h
    rd = (u[:, None] * np.asarray(cam.right) + v[:, None] * np.asarray(cam.up)
          + np.asarray(cam.front)).astype(np.float32)
    ro = np.where(livem[:, None], np.asarray(cam.o)[None, :], 1e9).astype(
        np.float32)

    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    R = n_pad
    nb = R // hk.RB
    cap = max(nb // hk.CAP_DIV, 1)
    rays_b = [jnp.asarray(x.reshape(nb, hk.RB)) for x in
              (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])]
    sf = jnp.concatenate([tree.lower.astype(jnp.float32),
                          tree.upper.astype(jnp.float32),
                          jnp.zeros(2, jnp.float32)]).reshape(1, 8)

    ladder = [cap]
    while ladder[-1] > 16:
        ladder.append(max(ladder[-1] // 2, 16))
    if ladder[-1] > 8:
        ladder.append(8)
    print(f"nb={nb} ladder={ladder}", flush=True)

    bodies = {
        c: jax.jit(hk._make_round(
            bricks, snodes, tabs, scal_i, sf, rays_b,
            nb=nb, cap=c, T=T, level_rows=level_rows, shadow=False,
            interpret=False, pack_div=hk.PACK_DIV, uniq=hk.UNIQ,
            max_probes=hk.MAX_PROBES, max_dda=hk.MAX_DDA_ITERS))
        for c in ladder
    }

    st = hk._init_state(nb)
    rung = 0
    t_total = 0.0
    for rnd in range(200):
        actb = np.asarray(jnp.any(st[1] == 0, axis=1))
        nact = int(actb.sum())
        if nact == 0:
            break
        while rung + 1 < len(ladder) and nact <= ladder[rung + 1]:
            rung += 1
        c = ladder[rung]
        t0 = time.perf_counter()
        st2 = bodies[c](st)
        jax.block_until_ready(st2)
        dt = time.perf_counter() - t0
        t_total += dt
        resolved_new = int(jnp.sum((st2[1] != 0) & (st[1] == 0)))
        print(f"round {rnd:3d}: cap={c:4d} active_blocks={nact:4d} "
              f"resolved+={resolved_new:7d} {dt*1e3:7.2f} ms", flush=True)
        st = st2
    print(f"total rounds time {t_total*1e3:.1f} ms "
          f"(eager, includes per-round sync)", flush=True)


if __name__ == "__main__":
    main()
