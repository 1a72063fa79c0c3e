"""Pinhole / thin-lens camera (CameraPinhole, renderCommon.hpp:17-84).

The reference builds its basis from GL view/projection matrices; here the
public constructor is a lookat + vertical FOV, producing the same
m_front/m_up/m_right/m_tanHthetaY state. `shoot` maps pixel -> unnormalized
ray exactly like the reference (mix of +-tanHthetaY, aspect from W/H).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Camera:
    o: np.ndarray  # eye position f32[3]
    front: np.ndarray
    up: np.ndarray
    right: np.ndarray
    tan_half_fovy: float
    lens_r: float = 0.0
    focus: float = 1.0

    @staticmethod
    def look_at(eye, target, up=(0.0, 1.0, 0.0), fovy_deg: float = 45.0,
                lens_r: float = 0.0, focus: float | None = None) -> "Camera":
        eye = np.asarray(eye, np.float32)
        target = np.asarray(target, np.float32)
        front = target - eye
        dist = float(np.linalg.norm(front))
        front = front / dist
        upv = np.asarray(up, np.float32)
        right = np.cross(front, upv)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, front)
        return Camera(
            o=eye,
            front=front.astype(np.float32),
            up=up2.astype(np.float32),
            right=right.astype(np.float32),
            tan_half_fovy=math.tan(math.radians(fovy_deg) * 0.5),
            lens_r=lens_r,
            focus=dist if focus is None else focus,
        )


def np_frame_rays(cam: Camera, width: int, height: int, off_x=0.5, off_y=0.5):
    """Host-side primary rays for a full frame (row-major pixel order).
    Pure numpy so no device compile depends on the frame size."""
    idx = np.arange(width * height)
    px = idx % width
    py = idx // width
    xf = (px + off_x) / width
    yf = (py + off_y) / height
    th = cam.tan_half_fovy
    u = (-th + 2.0 * th * xf) * (width / height)
    v = th - 2.0 * th * yf
    rd = (
        u[:, None] * cam.right[None, :]
        + v[:, None] * cam.up[None, :]
        + cam.front[None, :]
    ).astype(np.float32)
    ro = np.broadcast_to(cam.o, rd.shape).astype(np.float32)
    return ro, rd


def shoot(cam: Camera, px, py, off_x, off_y, width: int, height: int):
    """Pixel-index rays (CameraPinhole::shoot). px/py i32[R], off in [0,1)."""
    xf = (px.astype(jnp.float32) + off_x) / width
    yf = (py.astype(jnp.float32) + off_y) / height
    th = jnp.float32(cam.tan_half_fovy)
    u = (-th + (2.0 * th) * xf) * (width / height)
    v = th - (2.0 * th) * yf
    right = jnp.asarray(cam.right)
    up = jnp.asarray(cam.up)
    front = jnp.asarray(cam.front)
    rd = u[:, None] * right + v[:, None] * up + front
    ro = jnp.broadcast_to(jnp.asarray(cam.o), rd.shape)
    return ro, rd


def shoot_thin_lens(cam: Camera, px, py, off_x, off_y, width: int, height: int,
                    u0, u1):
    """Thin-lens rays (CameraPinhole::shootThinLens): square lens in
    [-lensR, lensR]^2, focal plane at `focus`."""
    xf = (px.astype(jnp.float32) + off_x) / width
    yf = (py.astype(jnp.float32) + off_y) / height
    th = jnp.float32(cam.tan_half_fovy)
    focus = jnp.float32(cam.focus)
    lens_r = jnp.float32(cam.lens_r)
    fx = focus * (-th + (2.0 * th) * xf) * (width / height)
    fy = focus * (th - (2.0 * th) * yf)
    lx = -lens_r + 2.0 * lens_r * u0
    ly = -lens_r + 2.0 * lens_r * u1
    dx = fx - lx
    dy = fy - ly
    dz = focus
    right = jnp.asarray(cam.right)
    up = jnp.asarray(cam.up)
    front = jnp.asarray(cam.front)
    rd = dx[:, None] * right + dy[:, None] * up + dz * front
    ro = jnp.asarray(cam.o) + lx[:, None] * right + ly[:, None] * up
    return ro, rd
