"""Warm per-frame rebuild timing at reference scale (VERDICT round-2
item #4: "2048^3 rebuild of a >=5M-triangle mesh in single-digit
seconds"; reference anchor: IntersectorOctreeGPU::build rebuilt every
frame at ~135 ms for 41M voxels, seminar_ushio.pdf slide 67).

Builds the same multi-million-triangle sphere-lattice scene N times in
ONE process: build 1 pays jit trace/compile (or .jax_cache load) for the
build pipeline's shapes, builds 2..N are the steady-state per-frame
rebuild cost rtcamp actually pays. The mesh is jittered per build (same
shapes, different values) so no result can be cached, only compiles.
Prints the per-phase split from scene.build_stats: split (host C++
worklist), count (pass 1 + readback), unique (emit + sort/dedup +
readback), accel (tree build + readbacks).

  RES     grid resolution      (default 2048)
  NSP     spheres per axis     (default 7)
  SUBDIV  icosphere subdiv     (default 5; 7*7*7 * 20480 = 7.0M tris)
  N       builds               (default 3)
  CHUNK   triangles per chunk  (default 262144)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

from scale_demo import sphere_lattice  # noqa: E402
from massivevoxelraytracing_tpu.models import scene  # noqa: E402


def main():
    grid_res = int(os.environ.get("RES", 2048))
    nsp = int(os.environ.get("NSP", 7))
    subdiv = int(os.environ.get("SUBDIV", 5))
    n_builds = int(os.environ.get("N", 3))
    chunk = int(os.environ.get("CHUNK", 262144))

    t0 = time.time()
    tri, tri_cols = sphere_lattice(nsp, subdiv, 0.44)
    print(
        f"[rebuild] mesh: {len(tri)/1e6:.2f}M triangles "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    origin = np.zeros(3, np.float32)
    dps = 1.0 / grid_res

    for i in range(n_builds):
        # same shapes, different values: an animated frame, not a cache hit
        jitter = np.float32(1e-4) * np.float32(i)
        t0 = time.time()
        tree = scene.build_scene(
            tri + jitter, tri_cols, origin=origin, dps=dps,
            grid_res=grid_res, accel="hako", chunk_tris=chunk,
        )
        dt = time.time() - t0
        st = tree.build_stats
        tag = "cold" if i == 0 else "warm"
        print(
            f"[rebuild] build {i} ({tag}): {dt:.2f}s  "
            f"split={st['t_split_s']:.2f} count={st['t_count_s']:.2f} "
            f"unique={st['t_unique_s']:.2f} accel={st['t_accel_s']:.2f}  "
            f"tris={st['n_triangles']/1e6:.2f}M "
            f"dumped={st['n_dumped']/1e6:.1f}M "
            f"unique={st['n_unique']/1e6:.1f}M "
            f"bytes={st['accel_bytes']/1e6:.1f}MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
