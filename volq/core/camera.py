"""Camera ray generation (SURVEY.md C6): pinhole perspective + orthographic.

Conventions (shared verbatim by the oracle in oracle/raymarch_cpu.py):
  * pixel (px, py) samples its center (px + 0.5, py + 0.5), px in [0, W),
    py in [0, H); image y grows downward.
  * ndc_x = (px + 0.5) / W * 2 - 1,  ndc_y = 1 - (py + 0.5) / H * 2
  * perspective: dir = normalize(fwd + ndc_x * scale_x * right
                                     + ndc_y * scale_y * up), origin = eye
  * orthographic: origin = eye + ndc_x * scale_x * right
                              + ndc_y * scale_y * up,    dir = fwd
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from volq.core.types import Camera


def make_camera(eye, look_at, up_hint, *, fov_y_deg=45.0, aspect=1.0,
                ortho_half_h=1.0, projection="persp") -> Camera:
    """Build numeric camera state on the host (numpy, fp32).

    ``aspect`` = W / H.  For perspective, scale_y = tan(fov_y/2) and
    scale_x = scale_y * aspect; for ortho, scale_y = ortho_half_h and
    scale_x = ortho_half_h * aspect.
    """
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(look_at, np.float32) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up_hint = np.asarray(up_hint, np.float32)
    right = np.cross(fwd, up_hint)
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    if projection == "persp":
        sy = math.tan(math.radians(fov_y_deg) * 0.5)
        sx = sy * aspect
    elif projection == "ortho":
        sy = float(ortho_half_h)
        sx = sy * aspect
    else:
        raise ValueError(f"unknown projection {projection!r}")
    return Camera(eye=eye, right=right, up=up, fwd=fwd,
                  scale_x=np.float32(sx), scale_y=np.float32(sy))


def pixel_rays(camera: Camera, px, py, width: int, height: int,
               projection: str):
    """Per-pixel world rays. px/py are integer pixel coordinate arrays of any
    (broadcast-compatible) shape; returns (origin, direction) with a trailing
    [..., 3] axis. Direction is unit length, so march t is in world units."""
    ndc_x = (px.astype(jnp.float32) + 0.5) / width * 2.0 - 1.0
    ndc_y = 1.0 - (py.astype(jnp.float32) + 0.5) / height * 2.0
    ox = ndc_x * camera.scale_x
    oy = ndc_y * camera.scale_y
    if projection == "persp":
        d = (camera.fwd + ox[..., None] * camera.right
             + oy[..., None] * camera.up)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(camera.eye, d.shape)
    else:
        o = (camera.eye + ox[..., None] * camera.right
             + oy[..., None] * camera.up)
        d = jnp.broadcast_to(camera.fwd, o.shape)
    return o, d


def view_z(camera: Camera, pos):
    """Signed depth of world points along the camera forward axis."""
    return jnp.dot(pos - camera.eye, camera.fwd)
