"""Image pyramids and gradients for dense alignment.

Mirrors the reference's pyramid construction (`include/RegisterPhotoICP.h`):

* Gray pyramid: Gaussian 5-tap pyrDown (reference `buildPyramid:292` uses
  cv::pyrDown).
* Depth pyramid: 2x2 block average over *valid* depths only
  (`buildPyramidRange:312`), so depth discontinuities don't bleed zeros.
* Gradients: "weighted first order approximation" — the harmonic mean of the
  forward and backward differences, emitted only where the center value is
  strictly between its neighbors (`calcGradientXY:365`).  This suppresses
  gradients at occlusion boundaries.

All ops are shape-polymorphic jnp code: XLA fuses them; per-level shapes are
static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_BINOMIAL5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_filter5(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap binomial blur.

    Implemented with circular shifts: columns of a spherical image wrap in
    azimuth, so circular boundary handling is *correct* there; the two
    wrapped border rows are harmless because row-border gradients are zeroed
    downstream.  (Shift-adds compile orders of magnitude faster on the TPU
    backend than a degenerate single-channel conv.)
    """
    k = _BINOMIAL5.astype(img.dtype)
    acc = k[2] * img
    for i, w in ((1, k[1]), (2, k[0])):
        acc = acc + w * (jnp.roll(img, i, axis=0) + jnp.roll(img, -i, axis=0))
    img = acc
    acc = k[2] * img
    for i, w in ((1, k[1]), (2, k[0])):
        acc = acc + w * (jnp.roll(img, i, axis=1) + jnp.roll(img, -i, axis=1))
    return acc


def _pick_block(n: int, cap: int = 16) -> int:
    for b in range(min(cap, n), 0, -1):
        if n % b == 0:
            return b
    return 1


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown equivalent: blur then take even rows/cols.

    Dispatches to the fused Pallas kernel on TPU backends (bit-equal in the
    interior, ~3x faster, and far cheaper to compile than the roll chain).
    """
    from rgbd360_tpu.ops import pallas_kernels as K

    h, w = img.shape
    # Mosaic wants row blocks in multiples of 8: engage only where the
    # output height allows it (small coarse levels are cheap in jnp anyway)
    # engage only on lane/sublane-aligned shapes (in practice the big full
    # -res level, which dominates the cost; coarse levels stay on jnp)
    if K.use_pallas() and w % 256 == 0 and (h // 2) % 8 == 0:
        return K.fused_pyr_down(img, 8)
    return _sep_filter5(img)[::2, ::2]


def pyr_down_depth(depth: jnp.ndarray, min_depth: float, max_depth: float) -> jnp.ndarray:
    """2x2 valid-mean downsample (reference `buildPyramidRange`)."""
    h2, w2 = depth.shape[0] // 2, depth.shape[1] // 2
    d = depth[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
    valid = (d > min_depth) & (d < max_depth)
    s = jnp.sum(jnp.where(valid, d, 0.0), axis=(1, 3))
    n = jnp.sum(valid, axis=(1, 3))
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def build_depth_pyramid(
    depth: jnp.ndarray, levels: int, min_depth: float = 0.3, max_depth: float = 20.0
) -> list[jnp.ndarray]:
    pyr = [depth]
    for _ in range(levels - 1):
        pyr.append(pyr_down_depth(pyr[-1], min_depth, max_depth))
    return pyr


def gradient_xy(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Occlusion-aware harmonic-mean gradients (reference `calcGradientXY`).

    grad = 2 / (1/(I[+1]-I) + 1/(I-I[-1])) where I is strictly between its
    neighbors, else 0.  Border pixels are 0.  Dispatches to the fused Pallas
    kernel on TPU backends (bit-equal).
    """
    from rgbd360_tpu.ops import pallas_kernels as K

    if K.use_pallas() and img.shape[0] % 16 == 0 and img.shape[1] % 128 == 0:
        return K.fused_gradients(img, 16)

    def _axis_grad(a, axis):
        fwd = jnp.roll(a, -1, axis=axis) - a
        bwd = a - jnp.roll(a, 1, axis=axis)
        monotonic = ((fwd > 0) & (bwd > 0)) | ((fwd < 0) & (bwd < 0))
        denom = jnp.where(monotonic, 1.0 / jnp.where(fwd == 0, 1e-12, fwd), 0.0) + jnp.where(
            monotonic, 1.0 / jnp.where(bwd == 0, 1e-12, bwd), 0.0
        )
        g = jnp.where(monotonic, 2.0 / jnp.where(denom == 0, 1e-12, denom), 0.0)
        # zero the two border lines along `axis`
        idx = jnp.arange(a.shape[axis])
        interior = (idx > 0) & (idx < a.shape[axis] - 1)
        shape = [1, 1]
        shape[axis] = a.shape[axis]
        return jnp.where(interior.reshape(shape), g, 0.0)

    return _axis_grad(img, 1), _axis_grad(img, 0)


def mask_seams(grad: jnp.ndarray, num_sensors: int = 8, half_width: int = 1) -> jnp.ndarray:
    """Zero gradient columns at sensor seams (reference
    `RegisterPhotoICP.h:4537-4549` zeroes 2 columns at each interior seam to
    kill auto-shutter exposure steps)."""
    w = grad.shape[1]
    span = w // num_sensors
    col = jnp.arange(w)
    mask = jnp.ones((w,), dtype=bool)
    for s in range(1, num_sensors):
        seam = s * span
        mask = mask & ~((col >= seam - half_width) & (col < seam + half_width))
    return grad * mask[None, :]
