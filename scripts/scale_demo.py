"""Reference-scale demonstration (VERDICT round-2 item #5): build and
render a >= 55M-voxel scene at >= 2048^3 (the reference's dragon: 55M
voxels @2048^3, 61 MB DAG, ~2 ms/frame 1080p primary rays,
seminar_ushio.pdf slides 42/66).

Scene: a lattice of bumpy spheres -- multi-million-triangle input (tests
the split-to-cap + chunked voxelize pipeline at production scale) whose
voxelized surface area reaches the dragon's occupancy.

  RES      grid resolution (default 2048)
  NSP      spheres per axis (default 6)
  SUBDIV   icosphere subdivision per sphere (default 4 -> 5120 tris each)
"""

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
from massivevoxelraytracing_tpu.utils import meshgen, png  # noqa: E402


def sphere_lattice(nsp: int, subdiv: int, radius_frac: float):
    # moved to utils/meshgen.sphere_lattice (shared with bench.py and
    # scripts/cap_sweep.py); kept as a thin alias for older callers
    return meshgen.sphere_lattice(nsp, subdiv, radius_frac)


def main():
    grid_res = int(os.environ.get("RES", 2048))
    nsp = int(os.environ.get("NSP", 6))
    subdiv = int(os.environ.get("SUBDIV", 4))
    radius_frac = float(os.environ.get("RADIUS", 0.44))
    width, height = 1920, 1088

    t0 = time.time()
    tri, tri_cols = sphere_lattice(nsp, subdiv, radius_frac)
    t_mesh = time.time() - t0
    print(f"[scale] mesh: {len(tri)/1e6:.2f}M triangles ({t_mesh:.1f}s)",
          flush=True)

    origin = np.zeros(3, np.float32)
    dps = 1.0 / grid_res
    t0 = time.time()
    tree = scene.build_scene(
        tri, tri_cols, origin=origin, dps=dps, grid_res=grid_res,
        accel="hako", chunk_tris=int(os.environ.get("CHUNK", 262144)),
    )
    build_s = time.time() - t0
    st = tree.build_stats or {}
    print(
        f"[scale] res={grid_res} voxels={tree.n_voxels/1e6:.1f}M "
        f"(dumped {st.get('n_dumped', 0)/1e6:.1f}M) bricks={tree.n_bricks} "
        f"levels={tree.n_per_level} mem={tree.memory_bytes()/1e6:.1f}MB "
        f"build={build_s:.1f}s", flush=True,
    )

    center = np.full(3, 0.5, np.float32)
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.9, 0.4, 1.4]) * 0.9,
        target=center, fovy_deg=45.0)

    def frame():
        img, depth = raycast.render_frame(
            tree, cam, width, height, show_color=True)
        return img, depth

    t0 = time.time()
    img, depth = frame()
    jax.block_until_ready(depth)
    t_compile = time.time() - t0
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        img, depth = frame()
    jax.block_until_ready(depth)
    dt = (time.time() - t0) / iters
    hit = float(jnp.mean((depth < 1e37).astype(jnp.float32)))
    print(
        f"[scale] frame {width}x{height}: {dt*1e3:.1f} ms = "
        f"{width*height/dt/1e6:.1f} Mrays/s hit={hit:.2f} "
        f"(first {t_compile:.1f}s)", flush=True,
    )
    out = os.environ.get("OUT", "out/scale_demo.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    png.write(out, np.asarray(img))
    print(f"[scale] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
