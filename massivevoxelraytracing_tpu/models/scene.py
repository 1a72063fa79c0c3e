"""Scene build: triangle soup -> voxels -> traversal-ready SVO/DAG.

This is the `updateScene` path of the engine (PathTracer.hpp:141-148 ->
IntersectorOctreeGPU::build, IntersectorOctreeGPU.hpp:40-241): per frame,
re-voxelize the mesh and rebuild the octree. Host round trips mirror the
reference's three readbacks (voxel count, level pre-count, node counts)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import octree as octree_ops
from ..ops import voxelize as vox_ops
from ..utils import meshprep


def build_scene(
    tri_verts,
    tri_colors=None,
    tri_emissions=None,
    *,
    origin,
    dps,
    grid_res: int,
    six_separating: bool = True,
    cap: int = 8,
    dag: bool = True,
    tri_bucket: int = 1024,
) -> octree_ops.VoxelOctree:
    """Voxelize + build. tri_*: f32[T, 3, 3] host arrays."""
    tri_verts = np.asarray(tri_verts, np.float32).reshape(-1, 3, 3)
    if tri_colors is None:
        tri_colors = np.ones_like(tri_verts)
    if tri_emissions is None:
        tri_emissions = np.zeros_like(tri_verts)

    tri, col, emi = meshprep.split_to_cap(
        tri_verts, tri_colors, tri_emissions, origin, dps, grid_res, cap
    )
    tri, col, emi = meshprep.pad_triangles(tri, col, emi, tri_bucket)

    cands = vox_ops.voxelize_dense(
        jnp.asarray(tri),
        jnp.asarray(col),
        jnp.asarray(emi),
        jnp.asarray(origin, jnp.float32),
        float(dps),
        grid_res=grid_res,
        six_separating=six_separating,
        cap=cap,
    )
    uniq = vox_ops.sort_and_unique(cands)
    n_unique = int(uniq["n_unique"])  # readback (the reference's counter read)
    if n_unique == 0:
        raise ValueError("voxelization produced no voxels")
    pad = octree_ops.bucket(n_unique)
    m_hi = uniq["m_hi"][:pad]
    m_lo = uniq["m_lo"][:pad]
    color = uniq["color"][:pad]
    emission = uniq["emission"][:pad]

    lower = jnp.asarray(origin, jnp.float32)
    upper = lower + jnp.float32(dps) * grid_res
    return octree_ops.build_octree(
        m_hi,
        m_lo,
        n_unique,
        grid_res,
        dag=dag,
        lower=lower,
        upper=upper,
        color=color,
        emission=emission,
        has_emission=bool(uniq["has_emission"]),
    )
