"""Fast bilateral depth filtering.

The reference optionally runs PCL's `FastBilateralFilter` (sigmaS = 10 px,
sigmaR = 0.05 m) on the per-sensor clouds before plane segmentation
(reference `include/Frame360.h:414-419,494-499`, gated by
USE_BILATERAL_FILTER).  This implements the same capability with the
permutohedral-free "constant-time bilateral" approximation: the range
dimension is quantized into a few slices, each slice is Gaussian-blurred
spatially (shift-add separable kernel, TPU-friendly), and the result is
linearly interpolated between slices — the same idea behind PCL's fast
bilateral (Paris-Durand bilateral grid collapsed to slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian via iterated shift-adds (3 box passes ~ Gaussian)."""
    radius = max(1, int(sigma * 0.6))

    def box(a, axis):
        acc = a
        n = 1.0
        for i in range(1, radius + 1):
            acc = acc + jnp.roll(a, i, axis) + jnp.roll(a, -i, axis)
            n += 2.0
        return acc / n

    for _ in range(3):
        img = box(img, -1)
        img = box(img, -2)
    return img


def bilateral_depth(
    depth: jnp.ndarray,
    sigma_s: float = 10.0,
    sigma_r: float = 0.05,
    num_slices: int = 8,
    max_depth: float = 10.0,
) -> jnp.ndarray:
    """Edge-preserving depth smoothing; invalid (<=0) pixels pass through.

    depth: (..., H, W) float32 meters.
    """
    valid = depth > 0
    d = jnp.where(valid, depth, 0.0)

    # slice centers spread over the depth range
    centers = jnp.linspace(0.0, max_depth, num_slices)

    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    for k in range(num_slices):
        c = centers[k]
        w = jnp.exp(-0.5 * ((d - c) / (4.0 * sigma_r)) ** 2) * valid
        blur_wd = _gauss_blur(w * d, sigma_s)
        blur_w = _gauss_blur(w, sigma_s)
        # interpolation weight of this slice at each pixel
        interp = jnp.clip(1.0 - jnp.abs(d - c) / (centers[1] - centers[0]), 0.0, 1.0)
        num = num + interp * blur_wd
        den = den + interp * blur_w

    smoothed = num / jnp.maximum(den, 1e-9)
    # range gate: never move a pixel further than ~3 sigma_r from its input
    smoothed = jnp.clip(smoothed, d - 3 * sigma_r, d + 3 * sigma_r)
    return jnp.where(valid, smoothed, depth)


bilateral_depth_jit = jax.jit(bilateral_depth, static_argnums=(2, 3, 4))
