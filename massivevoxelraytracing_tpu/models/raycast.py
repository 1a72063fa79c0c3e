"""Primary-ray renderer (the `render` kernel + voxRTGPU app behavior,
voxKernel.cu:437-483): one ray per pixel, face-normal or voxel-color shading."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops import traverse
from ..ops.octree import VoxelOctree
from ..ops.voxelize import rgb8_to_f32


@partial(jax.jit, static_argnames=("width", "height", "stack_depth", "show_color"))
def _render_frame(
    children_flat,
    psum_flat,
    root_entry,
    lower,
    upper,
    color_table,
    cam_o,
    cam_front,
    cam_up,
    cam_right,
    tan_half_fovy,
    *,
    width: int,
    height: int,
    stack_depth: int,
    show_color: bool,
):
    n = width * height
    idx = jnp.arange(n, dtype=jnp.int32)
    px = idx % width
    py = idx // width
    xf = (px.astype(jnp.float32) + 0.5) / width
    yf = (py.astype(jnp.float32) + 0.5) / height
    th = tan_half_fovy
    u = (-th + 2.0 * th * xf) * (width / height)
    v = th - 2.0 * th * yf
    rd = u[:, None] * cam_right + v[:, None] * cam_up + cam_front
    ro = jnp.broadcast_to(cam_o, rd.shape)

    t, nmaj, vidx = traverse.intersect_rays(
        children_flat,
        psum_flat,
        root_entry,
        lower,
        upper,
        ro,
        rd,
        stack_depth=stack_depth,
    )
    hit = t < 1e37
    if show_color:
        col = rgb8_to_f32(jnp.take(color_table, vidx.astype(jnp.int32), mode="clip"))
    else:
        hn = traverse.hit_normal(nmaj, rd)
        col = (hn + 1.0) * 0.5
    rgb = jnp.where(hit[:, None], col, 0.0)
    img = jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return img.reshape(height, width, 3), t.reshape(height, width)


def render_frame(
    tree: VoxelOctree,
    cam: camera_ops.Camera,
    width: int,
    height: int,
    show_color: bool = False,
):
    """Returns (u8[H, W, 3] image, f32[H, W] depth)."""
    depth = max(int(tree.grid_res).bit_length() - 1, 1)
    color = tree.color if tree.color is not None else jnp.zeros(1, jnp.uint32)
    img, t = _render_frame(
        tree.children.reshape(-1),
        tree.psum.reshape(-1),
        traverse.root_entry_of(tree),
        tree.lower,
        tree.upper,
        color,
        jnp.asarray(cam.o),
        jnp.asarray(cam.front),
        jnp.asarray(cam.up),
        jnp.asarray(cam.right),
        jnp.float32(cam.tan_half_fovy),
        width=width,
        height=height,
        stack_depth=depth,
        show_color=show_color,
    )
    return img, t
