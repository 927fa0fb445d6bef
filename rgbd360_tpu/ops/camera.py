"""Pinhole and spherical camera models.

Conventions (kept identical to the reference so results are comparable):

* Pinhole backprojection with depth z at pixel (u, v):
  p = ((u - cx) z / fx, (v - cy) z / fy, z)
  (reference `OpenNI2_Grabber/FrameRGBD/CloudRGBD_Ext.h:91-96`).

* Spherical image of size (H, W): row r has elevation
  phi = (H/2 - 0.5 - r) * res, column c has azimuth theta = c * res with
  res = 2*pi/W.  The unit ray is
  d(phi, theta) = (sin phi, -cos phi sin theta, -cos phi cos theta)
  (reference `include/Frame360.h:589-593`, `include/RegisterPhotoICP.h:4568-4584`).

* Spherical projection of p = (x, y, z): rho = |p|, phi = asin(x/rho),
  theta = atan2(y, z) + pi; r = H/2 - 0.5 - phi/res, c = theta/res
  (reference `include/RegisterPhotoICP.h:2674-2682`).
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------- pinhole

def pinhole_backproject(depth: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Backproject an organized depth map (..., H, W) to points (..., H, W, 3)."""
    h, w = depth.shape[-2], depth.shape[-1]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    x = (u - k[0, 2]) * depth / k[0, 0]
    y = (v - k[1, 2]) * depth / k[1, 1]
    return jnp.stack([x, y, depth], axis=-1)


def pinhole_project(pts: jnp.ndarray, k: jnp.ndarray):
    """Project points (..., 3) -> pixel coords (..., 2) as (u, v) and depth."""
    z = pts[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = k[0, 0] * pts[..., 0] / zs + k[0, 2]
    v = k[1, 1] * pts[..., 1] / zs + k[1, 2]
    return jnp.stack([u, v], axis=-1), z


def radial_scale(k: jnp.ndarray, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel z-depth -> ray-length factor sqrt(1 + ((u-cx)/fx)^2 + ((v-cy)/fy)^2).

    Used when stitching so the spherical depth image stores radial distance
    (reference `include/Frame360.h:1142`).
    """
    v = jnp.arange(h, dtype=dtype)[:, None]
    u = jnp.arange(w, dtype=dtype)[None, :]
    xn = (u - k[0, 2]) / k[0, 0]
    yn = (v - k[1, 2]) / k[1, 1]
    return jnp.sqrt(1.0 + xn * xn + yn * yn)


# ---------------------------------------------------------------- sphere

def sphere_angles(h: int, w: int, dtype=jnp.float32):
    """(phi[h], theta[w]) grids for a spherical image."""
    res = 2.0 * jnp.pi / w
    r = jnp.arange(h, dtype=dtype)
    c = jnp.arange(w, dtype=dtype)
    phi = (0.5 * h - 0.5 - r) * res
    theta = c * res
    return phi, theta


def sphere_rays(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unit rays (h, w, 3) for every pixel of a spherical image."""
    phi, theta = sphere_angles(h, w, dtype)
    sp, cp = jnp.sin(phi)[:, None], jnp.cos(phi)[:, None]
    st, ct = jnp.sin(theta)[None, :], jnp.cos(theta)[None, :]
    x = jnp.broadcast_to(sp, (h, w))
    y = -cp * st
    z = -cp * ct
    return jnp.stack([x, y, z], axis=-1)


def sphere_rays_at(r: jnp.ndarray, c: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Unit rays (..., 3) at the given (row, col) index arrays.

    Identical formulas to `sphere_rays`, evaluated only where needed —
    computing trig for a salient subset is far cheaper than gathering rows
    of a precomputed full-image ray table on TPU.
    """
    res = 2.0 * jnp.pi / w
    phi = (0.5 * h - 0.5 - r.astype(jnp.float32)) * res
    theta = c.astype(jnp.float32) * res
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([sp, -cp * st, -cp * ct], axis=-1)


def sphere_backproject(depth: jnp.ndarray) -> jnp.ndarray:
    """Organized spherical depth (..., H, W) -> points (..., H, W, 3).

    Depth is radial distance in meters; invalid (<=0) yields the origin.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    rays = sphere_rays(h, w, depth.dtype)
    return rays * depth[..., None]


def sphere_project(pts: jnp.ndarray, h: int, w: int):
    """Points (..., 3) -> continuous pixel coords (..., 2) as (r, c) and range.

    Wrap-around in theta is the caller's concern (use mod w on the column).
    """
    rho = jnp.linalg.norm(pts, axis=-1)
    rho_s = jnp.maximum(rho, 1e-12)
    phi = jnp.arcsin(jnp.clip(pts[..., 0] / rho_s, -1.0, 1.0))
    theta = jnp.arctan2(pts[..., 1], pts[..., 2]) + jnp.pi
    res_inv = w / (2.0 * jnp.pi)
    r = 0.5 * h - 0.5 - phi * res_inv
    c = theta * res_inv
    return jnp.stack([r, c], axis=-1), rho
