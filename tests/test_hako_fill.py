"""Underfull-round fill slots must stay inert.

Rounds pick `cap` blocks; once fewer than `cap` blocks remain active the
pick list is padded with fill slots (sel == nb) that clip-load block nb-1.
Regression for the fill-slot mask in _make_round: without it those slots'
still-active lanes re-ran kernels + row gathers every tail round (duplicate
work, dropped on put) and consumed pack/vacuum prefix budget. Mirrors the
reference's exact-block-count launches (IntersectorOctreeGPU.hpp:187-207
sizes every kernel launch to live work; our padded rounds must behave the
same)."""

import numpy as np
import jax.numpy as jnp

from massivevoxelraytracing_tpu.ops import hako_kernels, morton
from test_hako import make_tree, random_voxels

RB = hako_kernels.RB


def test_fill_slots_have_no_active_lanes():
    grid_res = 64
    dps = 1.0 / grid_res
    m = random_voxels(grid_res, 2048)
    tree = make_tree(m, grid_res, dps)

    rng = np.random.default_rng(11)
    n = 8 * RB
    ro = rng.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    x, y, z = morton.np_decode(m[rng.integers(0, len(m), n)])
    target = (np.stack([x, y, z], -1) + 0.5) * dps
    rd = (target - ro + rng.normal(size=(n, 3)) * 2e-4).astype(np.float32)
    # a handful of long misses so blocks resolve at different rounds
    rd[: RB // 4] = np.array([1.0, 0.0, 0.0], np.float32)
    ro[: RB // 4, 0] = 2.0

    from massivevoxelraytracing_tpu.ops.hako_kernels import hako_args

    (bricks, snodes, tabs, scal_i), (T, level_rows) = hako_args(tree)
    hako_kernels.TRACE_ACT = trace = []
    try:
        t, nmaj, vidx = hako_kernels.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            jnp.asarray(ro), jnp.asarray(rd), T=T, level_rows=level_rows,
            cap_blocks=4, vac_pick=0,
        )
        t = np.asarray(t)
    finally:
        hako_kernels.TRACE_ACT = None

    assert len(trace) > 0
    # the tail must actually exercise underfull rounds for this test to
    # mean anything
    assert any(nblk < 4 for nblk, _ in trace), [nblk for nblk, _ in trace]
    for rnd, (nblk, act) in enumerate(trace):
        flat = act.reshape(-1)
        dup = int(flat[nblk * RB:].sum())
        assert dup == 0, f"round {rnd}: {dup} active lanes in fill slots"
    hit = t < 1e37
    assert hit.any() and (~hit).any()
