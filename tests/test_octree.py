"""SVO/DAG builder fidelity vs the numpy reference builder
(buildOctreeDAGReference semantics) via canonical recursive comparison."""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.models import cpu_oracle
from massivevoxelraytracing_tpu.ops import morton, octree

RNG = np.random.default_rng(42)


def random_voxel_set(grid_res, n):
    coords = RNG.integers(0, grid_res, size=(n, 3)).astype(np.uint32)
    m = morton.np_encode(coords[:, 0], coords[:, 1], coords[:, 2])
    return np.unique(m)  # sorted unique


def device_tree(m_u64, grid_res, dag=True):
    n = len(m_u64)
    pad = octree.bucket(n)
    hi, lo = morton.np_pack_pair(m_u64)
    hi = np.concatenate([hi, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    lo = np.concatenate([lo, np.full(pad - n, 0xFFFFFFFF, np.uint32)])
    return octree.build_octree(jnp.asarray(hi), jnp.asarray(lo), n, grid_res, dag=dag)


def canonical(children, psum, mask, root, memo):
    """Recursive canonical form of a (sub)tree for order-independent compare."""
    key = int(root)
    if key in memo:
        return memo[key]
    body = key & 0xFFFFFF
    m = int(mask[body])
    out = [m]
    for j in range(8):
        c = int(children[body, j])
        p = int(psum[body, j])
        if (m >> j) & 1:
            if (c & 0xFFFFFF) == 0xFFFFFF:
                out.append(("leaf", p))
            else:
                out.append((canonical(children, psum, mask, c, memo), p))
        else:
            out.append(None)
    r = tuple(out)
    memo[key] = r
    return r


@pytest.mark.parametrize("grid_res", [8, 32, 128])
def test_dag_matches_oracle(grid_res):
    m = random_voxel_set(grid_res, grid_res * 6)
    tree = device_tree(m, grid_res, dag=True)
    ora = cpu_oracle.embed_masks(cpu_oracle.build_octree(m, grid_res, dag=True))

    assert tree.n_nodes == ora.n_nodes, "DAG dedup count differs"

    dev_c = np.asarray(tree.children)
    dev_p = np.asarray(tree.psum)
    dev_m = np.asarray(tree.mask)
    a = canonical(dev_c, dev_p, dev_m, tree.n_nodes - 1, {})
    b = canonical(ora.children, ora.psum, ora.mask, ora.n_nodes - 1, {})
    assert a == b


def test_naive_same_structure_more_nodes():
    grid_res = 32
    m = random_voxel_set(grid_res, 500)
    dag = device_tree(m, grid_res, dag=True)
    nai = device_tree(m, grid_res, dag=False)
    assert dag.n_nodes <= nai.n_nodes
    a = canonical(np.asarray(dag.children), np.asarray(dag.psum), np.asarray(dag.mask), dag.n_nodes - 1, {})
    b = canonical(np.asarray(nai.children), np.asarray(nai.psum), np.asarray(nai.mask), nai.n_nodes - 1, {})
    assert a == b
    # naive count matches the oracle's naive count
    ora = cpu_oracle.build_octree(m, grid_res, dag=False)
    assert nai.n_nodes == ora.n_nodes


def test_root_psum_totals():
    grid_res = 16
    m = random_voxel_set(grid_res, 300)
    tree = device_tree(m, grid_res)
    # walking psums: total voxels = psum of last occupied child + its count;
    # simpler invariant: root's exclusive psums are monotone and bounded
    p = np.asarray(tree.psum)[tree.n_nodes - 1]
    assert np.all(np.diff(p) >= 0)
    assert p.max() < len(m)


def test_dedup_compresses_regular_structure():
    # a full plane at constant y voxelizes to many identical subtrees
    grid_res = 64
    x, z = np.meshgrid(np.arange(grid_res), np.arange(grid_res), indexing="ij")
    y = np.full_like(x, 5)
    m = np.unique(
        morton.np_encode(
            x.ravel().astype(np.uint32),
            y.ravel().astype(np.uint32),
            z.ravel().astype(np.uint32),
        )
    )
    dag = device_tree(m, grid_res, dag=True)
    nai = device_tree(m, grid_res, dag=False)
    assert dag.n_nodes * 4 < nai.n_nodes, (dag.n_nodes, nai.n_nodes)
    ora = cpu_oracle.build_octree(m, grid_res, dag=True)
    assert dag.n_nodes == ora.n_nodes
