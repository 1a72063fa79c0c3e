"""On-chip PT radiance A/B: one 16-spp step with the megakernel dispatch
vs the legacy round driver on the same small scene/camera. The two
traversals are bit-exact on CPU (tests/test_hako_mega.py); this checks the
Mosaic-compiled chips agree too -- per-pixel accum compare, not just the
mean (tunnel-cheap at this frame size).

Usage: python scripts/pt_mean_check.py [RES] [W] [H]
Runs BOTH paths in subprocesses (MVRT_MEGA is read at import time).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import os, sys
sys.path.insert(0, %(root)r)
from massivevoxelraytracing_tpu.utils import runtime
runtime.setup()
import numpy as np
import jax
from massivevoxelraytracing_tpu.models.pathtracer import PathTracer
from massivevoxelraytracing_tpu.ops import camera as camera_ops
from massivevoxelraytracing_tpu.utils import treecache

res, W, H = %(res)d, %(w)d, %(h)d
tree = treecache.lattice_tree(res)
lo = np.asarray(tree.lower); extent = float(tree.dps) * res
center = lo + extent / 2
cam = camera_ops.Camera.look_at(
    eye=center + np.array([0.9, 0.4, 1.4]) * extent * 0.9,
    target=center, fovy_deg=40.0)
pt = PathTracer(width=W, height=H)
pt.setup()
h, w = 64, 128
ang = np.linspace(0, np.pi, h)[:, None]
sky = np.stack([
    np.broadcast_to(0.6 + 0.4 * np.cos(ang), (h, w)),
    np.broadcast_to(0.7 + 0.3 * np.cos(ang), (h, w)),
    np.broadcast_to(0.9 + 0.1 * np.cos(ang), (h, w)),
], -1).astype(np.float32)
pt.load_hdri(sky)
pt.update_scene(tree)
pt.step(cam)
jax.block_until_ready(pt.accum)
acc = np.asarray(pt.accum[:, :3])
np.save(%(out)r, acc)
print("[child] mega=%%s mean=%%.6f" %% (os.environ.get("MVRT_MEGA", "1"),
                                        float(acc.mean())), flush=True)
"""


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    import numpy as np

    outs = {}
    for mega in ("1", "0"):
        out = f"/tmp/pt_mean_{res}_{mega}.npy"
        env = dict(os.environ, MVRT_MEGA=mega)
        code = CHILD % {"root": ROOT, "res": res, "w": W, "h": H,
                        "out": out}
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
        outs[mega] = np.load(out)
    a, b = outs["1"], outs["0"]
    exact = bool((a == b).all())
    close = bool(np.allclose(a, b, rtol=1e-5, atol=1e-6))
    print(f"[pt-mean-check] res={res} {W}x{H} mega_mean={a.mean():.6f} "
          f"legacy_mean={b.mean():.6f} exact={exact} close={close} "
          f"max_abs={np.abs(a - b).max():.3e}", flush=True)
    sys.exit(0 if close else 1)


if __name__ == "__main__":
    main()
