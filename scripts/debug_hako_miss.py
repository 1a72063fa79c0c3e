import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from massivevoxelraytracing_tpu.models import cpu_oracle
from massivevoxelraytracing_tpu.ops import hako, hako_kernels, morton, octree

RNG = np.random.default_rng(7)

grid_res = 64
dps = 1.0 / grid_res
c = RNG.integers(0, grid_res, size=(grid_res * grid_res // 2, 3)).astype(np.uint32)
m = np.unique(morton.np_encode(c[:, 0], c[:, 1], c[:, 2]))
n_vox = len(m)
pad = octree.bucket(n_vox)
hi, lo = morton.np_pack_pair(m)
hi = np.concatenate([hi, np.full(pad - n_vox, 0xFFFFFFFF, np.uint32)])
lo = np.concatenate([lo, np.full(pad - n_vox, 0xFFFFFFFF, np.uint32)])
tree = hako.build_hako(jnp.asarray(hi), jnp.asarray(lo), n_vox, grid_res,
                       lower=np.zeros(3, np.float32), dps=dps)

n = 256
ro = RNG.uniform(-1.0, 2.0, (n, 3)).astype(np.float32)
rd = RNG.normal(size=(n, 3)).astype(np.float32)
ro[:8] = np.array([0.5, 0.5, -2.0], np.float32)
rd[:2] = np.array([0.0, 0.0, 1.0], np.float32)
rd[2:4] = np.array([0.0, 1.0, 0.0], np.float32)[None]
ro[4:8] = np.array([0.5, 0.5, 0.5], np.float32)

t, nm, vi = (np.asarray(x) for x in hako_kernels.intersect_hako(tree, ro, rd))
to = np.empty(n, np.float32)
nmo = np.empty(n, np.int64)
vio = np.empty(n, np.int64)
for i in range(n):
    to[i], nmo[i], vio[i] = cpu_oracle.intersect_brute_force(
        m, (0, 0, 0), dps, ro[i], rd[i])

bad = (t < 1e37) != np.isfinite(to)
idx = np.nonzero(bad)[0]
print("mismatch rays:", idx)
for i in idx:
    print(f"ray {i}: ro={ro[i]} rd={rd[i]} hako_t={t[i]:.6g} oracle_t={to[i]:.6g} "
          f"oracle_vi={vio[i]}")
    if np.isfinite(to[i]):
        x, y, z = morton.np_decode(m[vio[i]:vio[i]+1])
        print(f"   oracle voxel coords=({x[0]},{y[0]},{z[0]})")
# also check t mismatches among both-hit
h = (t < 1e37) & np.isfinite(to)
dt_bad = ~np.isclose(t[h], to[h], rtol=1e-5, atol=1e-7)
print("t mismatches among hits:", int(dt_bad.sum()), "/", int(h.sum()))
vi_bad = vi[h] != vio[h]
print("vi mismatches among hits:", int(vi_bad.sum()))
