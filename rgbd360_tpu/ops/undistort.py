"""CLAMS depth undistortion as a vectorized gather + interpolate + multiply.

Reproduces `DiscreteFrustum::interpolatedUndistort` (reference
`OpenNI2_Grabber/third_party/CLAMS/discrete_depth_distortion_model.cpp:49-69`)
over whole images at once: each pixel belongs to a static frustum (bin grid),
its depth selects (dynamically) one or two depth bins, and the depth is scaled
by the (optionally interpolated) multiplier.  Bins with fewer than 50 training
examples fall back to the nearest single-bin multiplier, exactly as the
reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_COUNT = 50.0


def precompute_pixel_tables(
    multipliers: jnp.ndarray,
    counts: jnp.ndarray,
    bin_width: int,
    bin_height: int,
    h: int,
    w: int,
):
    """Expand the frustum-bin tables to per-pixel tables once at calibration
    load.  The per-frame op then needs no gathers at all: with nbins tiny
    (5 for the stock models) the depth-bin lookup becomes one-hot
    arithmetic, which the VPU chews through at memory speed while a 3M-point
    gather costs tens of ms on TPU.

    Layout is bin-major (..., nbins, H, W): each bin plane is then a
    contiguous well-tiled image.  A pixel-major (..., H, W, nbins) layout
    puts nbins=5 in the TPU lane dimension, which pads 5 -> 128 lanes and
    inflates every table read ~25x (measured 0.7 ms/frame in the build
    stage, vs ~0.1 ms in this layout)."""
    yb = (jnp.arange(h) // bin_height).astype(jnp.int32)
    xb = (jnp.arange(w) // bin_width).astype(jnp.int32)
    m_img = multipliers[..., yb[:, None], xb[None, :], :]
    c_img = counts[..., yb[:, None], xb[None, :], :]
    return jnp.moveaxis(m_img, -1, -3), jnp.moveaxis(c_img, -1, -3)


def undistort_depth_pixeltab(
    depth: jnp.ndarray,
    m_img: jnp.ndarray,
    c_img: jnp.ndarray,
    bin_depth: float,
) -> jnp.ndarray:
    """Gather-free CLAMS undistortion using precomputed per-pixel tables.

    depth: (..., H, W); m_img/c_img: (..., nbins, H, W) bin-major (see
    `precompute_pixel_tables`).  Semantics identical to `undistort_depth`.
    """
    nbins = m_img.shape[-3]
    z = depth
    idx = jnp.minimum(nbins - 1, jnp.floor(z / bin_depth).astype(jnp.int32))
    start = bin_depth * idx.astype(z.dtype)
    idx1 = jnp.where(z - start < 0.5 * bin_depth, idx, idx + 1)
    idx0 = idx1 - 1

    def sel(tab, i):
        ic = jnp.clip(i, 0, nbins - 1)
        acc = jnp.zeros_like(z)
        for k in range(nbins):  # tiny static unroll -> pure VPU selects
            acc = acc + jnp.where(ic == k, tab[..., k, :, :], 0.0)
        return acc

    m_near = sel(m_img, idx)
    m0 = sel(m_img, idx0)
    m1 = sel(m_img, idx1)
    c0 = sel(c_img, idx0)
    c1 = sel(c_img, idx1)

    z0 = idx1.astype(z.dtype) * bin_depth - 0.5 * bin_depth
    coeff1 = (z - z0) / bin_depth
    m_interp = (1.0 - coeff1) * m0 + coeff1 * m1
    fallback = (idx0 < 0) | (idx1 >= nbins) | (c0 < _MIN_COUNT) | (c1 < _MIN_COUNT)
    mult = jnp.where(fallback, m_near, m_interp)
    return jnp.where(z > 0, z * mult, z)


def undistort_depth(
    depth: jnp.ndarray,
    multipliers: jnp.ndarray,
    counts: jnp.ndarray,
    bin_width: int,
    bin_height: int,
    bin_depth: float,
) -> jnp.ndarray:
    """Undistort depth maps.

    depth: (..., H, W) float32 meters, 0 = invalid.
    multipliers/counts: (..., nby, nbx, nbins) aligned with depth's batch axes.
    Returns corrected depth, same shape; invalid pixels pass through as 0.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    nbins = multipliers.shape[-1]

    yb = (jnp.arange(h) // bin_height).astype(jnp.int32)
    xb = (jnp.arange(w) // bin_width).astype(jnp.int32)
    # Static gather: per-pixel multiplier/count vectors (..., H, W, nbins).
    m_img = multipliers[..., yb[:, None], xb[None, :], :]
    c_img = counts[..., yb[:, None], xb[None, :], :]

    z = depth
    idx = jnp.minimum(nbins - 1, jnp.floor(z / bin_depth).astype(jnp.int32))
    start = bin_depth * idx.astype(z.dtype)
    idx1 = jnp.where(z - start < 0.5 * bin_depth, idx, idx + 1)
    idx0 = idx1 - 1

    def take(a, i):
        return jnp.take_along_axis(
            a, jnp.clip(i, 0, nbins - 1)[..., None], axis=-1
        )[..., 0]

    m_near = take(m_img, idx)
    m0 = take(m_img, idx0)
    m1 = take(m_img, idx1)
    c0 = take(c_img, idx0)
    c1 = take(c_img, idx1)

    z0 = idx1.astype(z.dtype) * bin_depth - 0.5 * bin_depth
    coeff1 = (z - z0) / bin_depth
    m_interp = (1.0 - coeff1) * m0 + coeff1 * m1

    fallback = (idx0 < 0) | (idx1 >= nbins) | (c0 < _MIN_COUNT) | (c1 < _MIN_COUNT)
    mult = jnp.where(fallback, m_near, m_interp)
    return jnp.where(z > 0, z * mult, z)


undistort_depth_jit = jax.jit(undistort_depth, static_argnums=(3, 4, 5))
