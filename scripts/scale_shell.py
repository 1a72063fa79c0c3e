"""Reference-maximum scale demonstration: 16k^3 grid, ~654M voxels --
the reference's headline scale figure (renderer_introduction.pdf p.8:
16384^3, 654M voxels, 641 MB, 24 GB card) -- via the streamed builder
(ops/hako_stream.py) + Morton-cube terrain generator (utils/shellgen.py).

  RES     grid resolution   (default 16384)
  CUBE    generator cube    (default 1024)
  A1/F1   terrain octave 1  (default 0.07 / 8)
  A2/F2   terrain octave 2  (default 0.015 / 27)
  TARGET  if set, scale A1 once so the analytic count lands near it
  W/H     frame size        (default 1920x1088)
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

from massivevoxelraytracing_tpu.models import raycast  # noqa: E402
from massivevoxelraytracing_tpu.ops import camera as camera_ops  # noqa: E402
from massivevoxelraytracing_tpu.ops import hako_stream  # noqa: E402
from massivevoxelraytracing_tpu.utils import png, shellgen  # noqa: E402


def main():
    res = int(os.environ.get("RES", 16384))
    cube = int(os.environ.get("CUBE", min(1024, res // 4)))
    a1 = float(os.environ.get("A1", 0.07))
    f1 = float(os.environ.get("F1", 8.0))
    a2 = float(os.environ.get("A2", 0.015))
    f2 = float(os.environ.get("F2", 27.0))
    width = int(os.environ.get("W", 1920))
    height = int(os.environ.get("H", 1088))
    show_color = os.environ.get("COLOR", "0") == "1"

    def make(a1v):
        return shellgen.Terrain(res, cube, a1=a1v, f1=f1, a2=a2, f2=f2,
                                color=show_color)

    t0 = time.time()
    terrain = make(a1)
    total = terrain.total_voxels()
    target = os.environ.get("TARGET")
    if target:
        # column overhead past res^2 scales ~linearly with slope (= a1 at
        # fixed f1 while octave 2 stays put); one proportional step lands
        # within a few percent
        want = float(target)
        excess = max(total - res * res, 1)
        a1 = a1 * max((want - res * res), 1) / excess
        terrain = make(a1)
        total = terrain.total_voxels()
    t_est = time.time() - t0
    print(
        f"[shell] res={res} cube={cube} a1={a1:.4f} analytic voxels="
        f"{total/1e6:.1f}M ({t_est:.1f}s tile pass)", flush=True,
    )

    t0 = time.time()
    # tunneled chips read back at ~10 MB/s: park rows on device there
    park = os.environ.get(
        "PARK", "device" if jax.default_backend() == "tpu" else "host"
    )
    tree = hako_stream.build_hako_stream(terrain.chunks(), res, park=park)
    build_s = time.time() - t0
    print(
        f"[shell] voxels={tree.n_voxels/1e6:.1f}M bricks={tree.n_bricks} "
        f"snodes={tree.n_snodes} levels={tree.n_per_level} T={tree.T} "
        f"mem={tree.memory_bytes()/1e6:.1f}MB build={build_s:.1f}s",
        flush=True,
    )
    assert tree.n_voxels == total

    center = np.array([0.5, 0.5, 0.52]) * res
    cam = camera_ops.Camera.look_at(
        eye=center + np.array([0.55, 0.35, 0.28]) * res,
        target=center - np.array([0.0, 0.0, 0.04]) * res,
        up=(0.0, 0.0, 1.0),  # terrain height runs along z
        fovy_deg=50.0,
    )

    def frame():
        return raycast.render_frame(tree, cam, width, height,
                                    show_color=show_color)

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
        f"[shell] frame {width}x{height}: {dt*1e3:.1f} ms = "
        f"{width*height/dt/1e6:.1f} Mrays/s hit={hit:.2f} "
        f"(first {t_compile:.1f}s)", flush=True,
    )
    out = os.environ.get("OUT", "out/scale_shell.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    png.write(out, np.asarray(img))
    print(f"[shell] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
