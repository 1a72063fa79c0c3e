"""Primary-ray renderer (the `render` kernel + voxRTGPU app behavior,
voxKernel.cu:437-483): one ray per pixel, face-normal or voxel-color shading.

Rays stream through FIXED-SIZE packets: the traversal+shade graph compiles
once per (packet, tree-bucket) combination and is reused for any frame size
-- compile time on the remote TPU backend is minutes per new shape, so shape
standardization is a first-class design rule here (the analog of the
reference compiling its kernels once at startup, PathTracer.hpp:52-68)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops.voxelize import rgb8_to_f32
from . import accel as accel_lib

MAX_RAY_PACKET = 1 << 21  # up to 2M rays per render dispatch
RAY_PACKET = MAX_RAY_PACKET  # kept for callers; render_rays adapts downward


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


@partial(jax.jit, static_argnames=("kind", "depth", "show_color"))
def _render_packet(
    meta, root, lower, upper, color_table,
    ro, rd, *, kind: str, depth: int, show_color: bool,
):
    from ..ops import traverse

    t, nmaj, vidx = accel_lib.intersect_with(
        kind, depth, meta, root, lower, upper, ro, rd
    )
    hit = t < 1e37
    if show_color:
        col = rgb8_to_f32(jnp.take(color_table, vidx.astype(jnp.int32), mode="clip"))
    else:
        hn = traverse.hit_normal(nmaj, rd)
        col = (hn + 1.0) * 0.5
    rgb = jnp.where(hit[:, None], col, 0.0)
    img = jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return img, t


def render_rays(tree, ro: np.ndarray, rd: np.ndarray,
                show_color: bool = False, packet: int | None = None):
    """Render arbitrary ray arrays in pow2-bucketed packets (one compile per
    bucket; padding rays start outside the root box and retire on iteration
    zero). Returns (u8[N, 3], f32[N])."""
    kind, depth, meta, root = accel_lib.accel_args(tree)
    color = tree.color if tree.color is not None else jnp.zeros(1, jnp.uint32)
    n = len(ro)
    if packet is None:
        packet = min(MAX_RAY_PACKET, max(_next_pow2(n), 8192))
    n_pad = -(-n // packet) * packet
    if n_pad != n:
        far = np.full((n_pad - n, 3), 1e9, np.float32)
        ro = np.concatenate([ro, far])
        rd = np.concatenate([rd, np.ones((n_pad - n, 3), np.float32)])
    imgs = []
    ts = []
    for k in range(n_pad // packet):
        sl = slice(k * packet, (k + 1) * packet)
        img, t = _render_packet(
            meta, root, tree.lower, tree.upper, color,
            jnp.asarray(ro[sl]), jnp.asarray(rd[sl]),
            kind=kind, depth=depth, show_color=show_color,
        )
        imgs.append(img)
        ts.append(t)
    img = jnp.concatenate(imgs)[:n]
    t = jnp.concatenate(ts)[:n]
    return img, t


def tile_order(width: int, height: int, tile_w: int = 128, tile_h: int = 64):
    """Pixel permutation putting rectangular tiles contiguous: traversal
    blocks get spatially coherent rays (similar depth complexity), cutting
    the lockstep iteration count (the role the reference's 256-pixel thread
    blocks play, voxKernel.cu:448)."""
    idx = np.arange(width * height)
    px = idx % width
    py = idx // width
    key = (
        (py // tile_h) * ((width + tile_w - 1) // tile_w) + (px // tile_w)
    ) * (tile_w * tile_h) + (py % tile_h) * tile_w + (px % tile_w)
    order = np.argsort(key, kind="stable")
    return order


def render_frame(tree, cam: camera_ops.Camera,
                 width: int, height: int, show_color: bool = False):
    """Returns (u8[H, W, 3] image, f32[H, W] depth)."""
    ro, rd = camera_ops.np_frame_rays(cam, width, height)
    order = tile_order(width, height)
    img, t = render_rays(tree, ro[order], rd[order], show_color=show_color)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return (
        np.asarray(img)[inv].reshape(height, width, 3),
        np.asarray(t)[inv].reshape(height, width),
    )
