"""All-vacuum driver configuration (VAC_PICK >= nb) stays bit-identical.

With vac_pick >= nb the block-cap ladder degenerates to a single vacuum
rung: EVERY round lane-packs active lanes act-first over all blocks and
runs on a vac_run-block dense prefix. The sweep measures this as a
counterpoint to block-granular rounds (act_stats: 70/83 rounds run below
36% lane density), so its equivalence to the default driver is pinned
here. Mirrors the reference's launch-geometry invariance: block shape
never changes results (voxKernel.cu renderPT block striping)."""

import numpy as np
import jax.numpy as jnp

from massivevoxelraytracing_tpu.ops import hako_kernels as hk
from massivevoxelraytracing_tpu.ops import morton
from test_hako import make_tree, random_voxels


def test_all_vacuum_bit_identical():
    grid_res = 64
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 2048)
    tree = make_tree(m, grid_res, dps)

    rng = np.random.default_rng(5)
    n = 4 * hk.RB
    ro = rng.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[rng.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + rng.normal(size=(n, 3)) * 3e-4).astype(np.float32)
    # long misses so some blocks retire early (exercises pick padding)
    rd[: hk.RB // 4] = np.array([1.0, 0.0, 0.0], np.float32)
    ro[: hk.RB // 4, 0] = 2.0

    (bricks, snodes, tabs, scal_i), (T, level_rows) = hk.hako_args(tree)

    def run(**kw):
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            jnp.asarray(ro), jnp.asarray(rd), T=T, level_rows=level_rows,
            **kw)
        return np.asarray(t), np.asarray(nm), np.asarray(vi)

    base = run(cap_blocks=2, vac_pick=0)
    for vac_run in (1, 2):
        allvac = run(cap_blocks=2, vac_pick=65536, vac_run=vac_run)
        for a, b in zip(base, allvac):
            assert np.array_equal(a, b)
    hit = base[0] < 1e37
    assert hit.any() and (~hit).any()
