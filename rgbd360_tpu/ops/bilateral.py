"""Edge-preserving bilateral depth filtering.

The reference optionally runs PCL's `FastBilateralFilter` (sigmaS = 10 px,
sigmaR = 0.05 m) on the per-sensor clouds before plane segmentation and the
sphere cloud (reference `include/Frame360.h:40,492-499`, gated by
USE_BILATERAL_FILTER, default on).  This implements the same capability as a
separable windowed bilateral: one horizontal pass then one vertical pass,
each a fixed fan of shifted taps whose weights combine the spatial Gaussian
with the range Gaussian exp(-0.5 ((d_n - d)/sigmaR)^2) and the neighbor's
validity.  Separating the two passes is the standard TPU/SIMD-friendly
approximation (piecewise-smooth depth makes the separation error negligible
next to sensor noise); every tap is an elementwise roll+FMA — no gathers,
no scatters, fully fusable by XLA.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _bilateral_pass(
    d: jnp.ndarray,
    valid: jnp.ndarray,
    sigma_s: float,
    sigma_r: float,
    axis: int,
) -> jnp.ndarray:
    """One 1-D bilateral sweep along `axis` (taps out to 2 sigma_s)."""
    radius = max(1, int(round(2.0 * sigma_s)))
    inv2ss = 0.5 / (sigma_s * sigma_s)
    inv2sr = 0.5 / (sigma_r * sigma_r)
    num = jnp.where(valid, d, 0.0)
    den = valid.astype(d.dtype)
    for off in range(1, radius + 1):
        gs = math.exp(-(off * off) * inv2ss)
        for s in (off, -off):
            dn = jnp.roll(d, s, axis)
            vn = jnp.roll(valid, s, axis)
            # rolls wrap at the image border; the range kernel rejects the
            # wrapped values unless they happen to agree in depth (harmless)
            w = gs * vn * jnp.exp(-((dn - d) ** 2) * inv2sr)
            num = num + w * dn
            den = den + w
    return jnp.where(valid & (den > 1e-12), num / jnp.maximum(den, 1e-12), d)


@partial(jax.jit, static_argnames=("sigma_s", "sigma_r"))
def bilateral_depth(
    depth: jnp.ndarray,
    sigma_s: float = 10.0,
    sigma_r: float = 0.05,
    num_slices: int = 0,  # kept for API compatibility; unused
    max_depth: float = 10.0,  # kept for API compatibility; unused
) -> jnp.ndarray:
    """Edge-preserving depth smoothing; invalid (<=0) pixels pass through
    untouched and contribute no weight.

    depth: (..., H, W) float32 meters.  Matches the reference's
    FastBilateralFilter parameterization (sigmaS in pixels, sigmaR in
    meters, `include/Frame360.h:494-496`).
    """
    valid = depth > 0
    d = jnp.where(valid, depth, 0.0)
    d = _bilateral_pass(d, valid, sigma_s, sigma_r, axis=-1)
    d = _bilateral_pass(d, valid, sigma_s, sigma_r, axis=-2)
    return jnp.where(valid, d, depth)


bilateral_depth_jit = bilateral_depth
