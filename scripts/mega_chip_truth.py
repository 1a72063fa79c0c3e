"""Chip-vs-truth check for surface-origin rays (the PT bounce/NEE class):
intersect the cached 256^3 lattice on the CHIP with the megakernel (and
optionally the legacy driver), and compare hit masks/t/vidx against the
CPU interpret oracle on the SAME rays. Primary camera rays already verify
exact; PT radiance divergence (scripts/pt_mean_check.py) points at rays
that START on voxel surfaces -- this isolates which backend+class drifts.

Usage: python scripts/mega_chip_truth.py [RES] [NRAYS] [legacy]
"""

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def gen_rays(res, nr):
    """Deterministic surface-origin ray set, built from the CPU oracle's
    own primary hits (no chip involvement): primary rays at voxel
    centers from outside, bounce from hit points, cosine-ish dirs."""
    rng = np.random.default_rng(17)
    from massivevoxelraytracing_tpu.utils import treecache

    tree = treecache.lattice_tree(res)
    lo = np.asarray(tree.lower)
    extent = float(tree.dps) * res
    center = lo + extent / 2
    ro = (center + rng.normal(size=(nr, 3)) * extent * 1.2).astype(np.float32)
    # aim at random points inside the box
    tgt = (lo + rng.uniform(0.2, 0.8, (nr, 3)) * extent).astype(np.float32)
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return tree, ro.astype(np.float32), rd.astype(np.float32)


CHILD = r"""
import sys
sys.path.insert(0, %(root)r)
import os
import numpy as np
from massivevoxelraytracing_tpu.utils import runtime
runtime.setup()
import jax.numpy as jnp
from massivevoxelraytracing_tpu.ops import hako_kernels, hako_mega
from massivevoxelraytracing_tpu.utils import treecache

res = %(res)d
z = np.load(%(rays)r)
ro, rd = jnp.asarray(z["ro"]), jnp.asarray(z["rd"])
tree = treecache.lattice_tree(res)
fn = (hako_mega.intersect_hako_mega if %(mega)d
      else hako_kernels.intersect_hako)
out = {}
# stage 1: primary
t, nm, vi = fn(tree, ro, rd)
out["t1"], out["nm1"], out["vi1"] = (np.asarray(x) for x in (t, nm, vi))
# stage 2: bounce from hit points (computed HERE so both backends use
# identical origins -- t1 is compared first and must be exact anyway)
hit = out["t1"] < 1e37
hp = np.asarray(ro) + np.asarray(rd) * np.where(hit, out["t1"], 0)[:, None]
rng = np.random.default_rng(23)
nd = rng.normal(size=hp.shape).astype(np.float32)
nd /= np.linalg.norm(nd, axis=1, keepdims=True)
ro2 = jnp.asarray(np.where(hit[:, None], hp, 1e9).astype(np.float32))
rd2 = jnp.asarray(nd)
t, nm, vi = fn(tree, ro2, rd2)
out["t2"], out["nm2"], out["vi2"] = (np.asarray(x) for x in (t, nm, vi))
ts, _, _ = fn(tree, ro2, rd2, shadow=True)
out["ts2"] = np.asarray(ts)
np.savez(%(out)r, **out)
print("[child] done", flush=True)
"""


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    do_legacy = "legacy" in sys.argv[3:]
    tree, ro, rd = gen_rays(res, nr)
    rays = f"/tmp/chip_truth_rays_{res}.npz"
    np.savez(rays, ro=ro, rd=rd)

    runs = {"cpu_mega": ("cpu", 1), "chip_mega": ("", 1)}
    if do_legacy:
        runs["chip_legacy"] = ("", 0)
    outs = {}
    for name, (plat, mega) in runs.items():
        out = f"/tmp/chip_truth_{res}_{name}.npz"
        env = dict(os.environ)
        if plat:
            env["JAX_PLATFORMS"] = plat
        code = CHILD % {"root": ROOT, "res": res, "rays": rays,
                        "mega": mega, "out": out}
        print(f"--- {name}", flush=True)
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
        outs[name] = dict(np.load(out))

    truth = outs["cpu_mega"]
    for name, got in outs.items():
        if name == "cpu_mega":
            continue
        for stage in ("1", "2"):
            ht = truth[f"t{stage}"] < 1e37
            hg = got[f"t{stage}"] < 1e37
            mm = int((ht != hg).sum())
            te = bool((truth[f"t{stage}"][ht & hg]
                       == got[f"t{stage}"][ht & hg]).all())
            ve = bool((truth[f"vi{stage}"][ht & hg]
                       == got[f"vi{stage}"][ht & hg]).all())
            print(f"[{name}] stage{stage}: mask_mismatch={mm} "
                  f"t_exact={te} vidx_exact={ve} "
                  f"hit_truth={ht.mean():.4f} hit_got={hg.mean():.4f}",
                  flush=True)
        st = truth["ts2"] < 1e37
        sg = got["ts2"] < 1e37
        print(f"[{name}] shadow2: mask_mismatch={int((st != sg).sum())} "
              f"occl_truth={st.mean():.4f} occl_got={sg.mean():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
