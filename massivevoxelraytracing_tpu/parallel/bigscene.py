"""Scene-memory sharding: render scenes larger than one chip's HBM.

The reference's max-scale headline (16k^3 / 654M voxels, 641 MB octree,
renderer_introduction.pdf p.8) fits one 24 GB card; its answer to bigger
scenes is "buy a bigger card". The TPU-native answer is the mesh: split
the brick table into D contiguous Morton ranges ("shards"), give each
device one shard as a COMPLETE sub-tree over the full grid (the sparse top
tree above a brick subset costs ~nothing), and let every device traverse
the frame's rays against its shard only. The nearest hit is the per-lane
min over shards (voxel surfaces are independent, so min-t composes
exactly); shadow rays compose with any-hit OR. Attributes stay sharded
too -- shading happens on the owning device and only the D candidate
images meet in the final select.

Per-device memory is ~1/D of bricks + voxels; per-device work is the
rays' brick visits inside its shard (sum over shards == the single-tree
visit count) plus a top-tree walk per shard. Devices run INDEPENDENT
jitted programs (their table shapes/forms differ per shard), dispatched
asynchronously -- MPMD over the mesh rather than shard_map lockstep,
which is the honest structure when per-device programs differ.

Sharding an already-built tree is exact: shards reuse the tree's brick
ROWS verbatim (same 656 B rows, same in-brick DDA bits), only the voxel
-base column is rebased per shard and the small upper levels rebuilt per
subset (ops/hako._assemble_above, bit-identical level math).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import hako as hako_ops
from ..ops.hako import INVALID, HakoTree
from ..ops.hako_kernels import intersect_hako
from ..ops.octree import bucket

MISS_T = 3.402823466e38  # MAX_FLOAT: the traversal's miss sentinel


def shard_hako_tree(tree: HakoTree, n_shards: int, devices=None):
    """Split a built HakoTree into n_shards contiguous brick-range
    sub-trees (each a full-grid HakoTree over a subset of the bricks),
    optionally committing shard d's arrays to devices[d]."""
    nb = tree.n_bricks
    assert n_shards >= 1 and n_shards <= nb, (n_shards, nb)
    rows = np.asarray(tree.bricks[:nb])
    color = None if tree.color is None else np.asarray(tree.color)
    emission = None if tree.emission is None else np.asarray(tree.emission)
    n_vox = tree.n_voxels
    bounds = [round(d * nb / n_shards) for d in range(n_shards + 1)]

    shards = []
    for d in range(n_shards):
        s, e = bounds[d], bounds[d + 1]
        base_s = int(rows[s, 130])
        base_e = int(rows[e, 130]) if e < nb else n_vox
        nb_d = e - s
        rows_d = np.zeros((bucket(nb_d), rows.shape[1]), np.uint32)
        rows_d[:nb_d] = rows[s:e]
        rows_d[:nb_d, 130] -= np.uint32(base_s)  # voxel base -> shard-local
        gbm_d = np.full(bucket(nb_d), INVALID, np.uint32)
        gbm_d[:nb_d] = rows[s:e, 131]

        (snode_rows, n_snodes, levels, n_per_level, rml, rmh, T,
         res4h) = hako_ops._assemble_above(
            jnp.asarray(gbm_d), nb_d, tree.grid_res
        )

        def _slice_attr(a):
            if a is None:
                return None
            out = np.zeros(bucket(base_e - base_s), np.uint32)
            out[: base_e - base_s] = a[base_s:base_e]
            return jnp.asarray(out)

        shard = HakoTree(
            bricks=jnp.asarray(rows_d),
            n_bricks=nb_d,
            levels=tuple(levels),
            n_per_level=tuple(n_per_level),
            root_mask_lo=rml,
            root_mask_hi=rmh,
            T=T,
            res=res4h,
            grid_res=tree.grid_res,
            lower=tree.lower,
            upper=tree.upper,
            dps=tree.dps,
            snodes=snode_rows,
            n_snodes=n_snodes,
            color=_slice_attr(color),
            emission=_slice_attr(emission),
            n_voxels=base_e - base_s,
            has_emission=tree.has_emission,
        )
        shard.voxel_base = base_s
        if devices is not None:
            dev = devices[d % len(devices)]
            moved = {
                f.name: (
                    jax.device_put(getattr(shard, f.name), dev)
                    if isinstance(getattr(shard, f.name), jax.Array)
                    else getattr(shard, f.name)
                )
                for f in dataclasses.fields(shard)
            }
            moved["levels"] = tuple(
                jax.device_put(t, dev) for t in shard.levels
            )
            base = shard.voxel_base
            shard = HakoTree(**moved)
            shard.voxel_base = base
            shard.device = dev
        shards.append(shard)
    return shards


def intersect_sharded(shards, ro, rd, shadow: bool = False):
    """Traverse every shard (async across their devices), compose with a
    per-lane min over t (any-hit for shadow). Returns (t, nmaj, vidx)
    with vidx GLOBAL (shard-local rank + the shard's voxel base), exactly
    matching the unsharded tree's attribute indexing."""
    ro = np.asarray(ro, np.float32)
    rd = np.asarray(rd, np.float32)
    outs = []
    for sh in shards:
        dev = getattr(sh, "device", None)
        ro_d = jax.device_put(ro, dev) if dev is not None else jnp.asarray(ro)
        rd_d = jax.device_put(rd, dev) if dev is not None else jnp.asarray(rd)
        outs.append(intersect_hako(sh, ro_d, rd_d, shadow=shadow))
    # all D dispatches are in flight; now reduce on the host
    t = np.stack([np.asarray(o[0]) for o in outs])        # [D, N]
    nmaj = np.stack([np.asarray(o[1]) for o in outs])
    vidx = np.stack([np.asarray(o[2]) for o in outs])
    win = np.argmin(t, axis=0)                            # ties -> lowest shard
    lane = np.arange(t.shape[1])
    t_w = t[win, lane]
    nmaj_w = nmaj[win, lane]
    base = np.asarray([sh.voxel_base for sh in shards], np.uint32)
    vidx_w = np.where(
        t_w < MISS_T, vidx[win, lane] + base[win], 0
    ).astype(np.uint32)
    return t_w, nmaj_w, vidx_w, win


def render_rays_sharded(shards, ro, rd, show_color: bool = False):
    """Primary-ray shading over sharded scene memory: each shard shades
    its own candidate hits with its LOCAL attribute slice (attributes
    never leave the owning device); the D candidate colors meet in the
    final per-lane min-t select. Returns (u8[N, 3], t[N])."""
    from ..models.raycast import _shade_flat

    ro = np.asarray(ro, np.float32)
    rd = np.asarray(rd, np.float32)
    shaded = []
    for sh in shards:
        dev = getattr(sh, "device", None)
        ro_d = jax.device_put(ro, dev) if dev is not None else jnp.asarray(ro)
        rd_d = jax.device_put(rd, dev) if dev is not None else jnp.asarray(rd)
        t, nmaj, vidx = intersect_hako(sh, ro_d, rd_d)
        color = (
            sh.color if sh.color is not None else jnp.zeros(1, jnp.uint32)
        )
        img, t = _shade_flat(color, rd_d, t, nmaj, vidx,
                             show_color=show_color)
        shaded.append((img, t))
    t = np.stack([np.asarray(x[1]) for x in shaded])
    img = np.stack([np.asarray(x[0]) for x in shaded])
    win = np.argmin(t, axis=0)
    lane = np.arange(t.shape[1])
    return img[win, lane], t[win, lane]
