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

import functools

import numpy as np

import jax.numpy as jnp
from jax import lax

# numpy, not jnp: a module-level device array would initialize the XLA
# backend at import time, which breaks jax.distributed bring-up on
# multi-host jobs (initialize() must run before any backend init)
_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
_HI = lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _blur_decim_mats(h: int, w: int):
    """Banded constant matrices turning pyrDown into two MXU matmuls:
    out = A @ img @ B, A (h/2, h) row-blur+decimate, B (w, w/2) the same for
    columns, both with circular wrap (correct in azimuth; the wrapped border
    rows are harmless because row-border gradients are zeroed downstream).

    Measured on v5e: 4.5x faster than the roll-chain + strided-slice form,
    whose [::2, ::2] lowers to a per-row gather kernel (~1.6 ms for the
    1920x320 level alone); the matmuls are a few us of MXU time.  Max
    deviation vs the roll form: 1 ulp (1.2e-7).
    """
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float64) / 16.0
    a = np.zeros((h // 2, h), np.float32)
    for t in range(5):
        for i in range(h // 2):
            a[i, (2 * i + t - 2) % h] += k[t]
    b = np.zeros((w, w // 2), np.float32)
    for t in range(5):
        for j in range(w // 2):
            b[(2 * j + t - 2) % w, j] += k[t]
    return a, b


@functools.lru_cache(maxsize=None)
def _box_sum_mats(h: int, w: int):
    """0/1 matrices whose sandwich product is the 2x2 block sum (for the
    valid-mean depth pyramid): A2 (h/2, h), B2 (w, w/2)."""
    a = np.zeros((h // 2, h), np.float32)
    a[np.arange(h // 2), 2 * np.arange(h // 2)] = 1.0
    a[np.arange(h // 2), 2 * np.arange(h // 2) + 1] = 1.0
    b = np.zeros((w, w // 2), np.float32)
    b[2 * np.arange(w // 2), np.arange(w // 2)] = 1.0
    b[2 * np.arange(w // 2) + 1, np.arange(w // 2)] = 1.0
    return a, b


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

    Computed as two banded matmuls A @ img @ B (`_blur_decim_mats`) — pure
    MXU work with no gathers or strided slices; the roll-chain form is the
    odd-shape fallback and the numerical reference for tests.
    """
    h, w = img.shape
    if h % 2 == 0 and w % 2 == 0 and h >= 6 and w >= 6:
        a, b = _blur_decim_mats(h, w)
        half = jnp.matmul(jnp.asarray(a), img, precision=_HI)
        return jnp.matmul(half, jnp.asarray(b), precision=_HI)
    return _sep_filter5(img)[::2, ::2]


def pyr_down_depth(depth: jnp.ndarray, min_depth: float, max_depth: float) -> jnp.ndarray:
    """2x2 valid-mean downsample (reference `buildPyramidRange`).

    The block sums run as 0/1 matmul sandwiches on the MXU (exact: each
    output accumulates at most 4 addends).
    """
    h, w = depth.shape
    valid = (depth > min_depth) & (depth < max_depth)
    masked = jnp.where(valid, depth, 0.0)
    if h % 2 == 0 and w % 2 == 0 and h >= 2 and w >= 2:
        a, b = _box_sum_mats(h, w)
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        s = jnp.matmul(jnp.matmul(a, masked, precision=_HI), b, precision=_HI)
        n = jnp.matmul(
            jnp.matmul(a, valid.astype(depth.dtype), precision=_HI), b, precision=_HI
        )
        return jnp.where(n > 0.5, s / jnp.maximum(n, 1.0), 0.0)
    h2, w2 = h // 2, w // 2
    d = depth[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
    v = valid[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
    s = jnp.sum(jnp.where(v, d, 0.0), axis=(1, 3))
    n = jnp.sum(v, axis=(1, 3))
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


@functools.lru_cache(maxsize=None)
def _level_down_mats(h: int, w: int):
    """Channel-stacked level-transition matrices: channel 0 carries the
    binomial blur+decimate (gray), channels 1-2 the 2x2 block sum (depth
    sum + valid count), so ONE batched matmul sandwich advances gray AND
    depth a pyramid level (see `fused_level_down`)."""
    a_blur, b_blur = _blur_decim_mats(h, w)
    a_box, b_box = _box_sum_mats(h, w)
    a = np.stack([a_blur, a_box, a_box])  # (3, h/2, h)
    b = np.stack([b_blur, b_box, b_box])  # (3, w, w/2)
    return a, b


def fused_level_down(
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    min_depth: float,
    max_depth: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level transition for gray AND depth in TWO batched MXU
    matmuls (instead of 6 separate ones: 2 gray blur + 4 depth sum/count).

    The pyramid stage is bound by its sequential kernel chain, not
    arithmetic (docs/PERFORMANCE.md round 4: 2.7-4.6 ms measured vs a
    ~0.9 ms chain floor) — the lever is kernel COUNT.  Channel-stacking the
    three sandwiches into one `cij,cjk->cik` batched dot_general preserves
    the exact contraction order per channel, so results are bit-identical
    to `pyr_down` / `pyr_down_depth` (tested)."""
    h, w = gray.shape
    a, b = _level_down_mats(h, w)
    valid = (depth > min_depth) & (depth < max_depth)
    x = jnp.stack(
        [gray, jnp.where(valid, depth, 0.0), valid.astype(gray.dtype)]
    )
    half = jnp.einsum("cij,cjk->cik", jnp.asarray(a), x, precision=_HI)
    out = jnp.einsum("cik,ckl->cil", half, jnp.asarray(b), precision=_HI)
    n = out[2]
    return out[0], jnp.where(n > 0.5, out[1] / jnp.maximum(n, 1.0), 0.0)


def build_depth_pyramid(
    depth: jnp.ndarray, levels: int, min_depth: float = 0.3, max_depth: float = 20.0
) -> list[jnp.ndarray]:
    pyr = [depth]
    for _ in range(levels - 1):
        pyr.append(pyr_down_depth(pyr[-1], min_depth, max_depth))
    return pyr


def gradient_xy(
    img: jnp.ndarray, allow_pallas: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Occlusion-aware harmonic-mean gradients (reference `calcGradientXY`).

    grad = 2 / (1/(I[+1]-I) + 1/(I-I[-1])) where I is strictly between its
    neighbors, else 0.  Border pixels are 0.  Dispatches to the fused Pallas
    kernel on TPU backends (bit-equal).  Pass allow_pallas=False under vmap
    (the halo-DMA kernel has no batching rule).
    """
    from rgbd360_tpu.ops import pallas_kernels as K

    if allow_pallas and K.use_pallas() and img.shape[0] % 16 == 0 and img.shape[1] % 128 == 0:
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


def gradient_xy_multi(imgs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`gradient_xy` over a stacked (..., H, W) channel batch in TWO fused
    elementwise kernels (one per axis) instead of two per channel — the
    pyramid stage's binding resource is kernel-chain length, and gray+depth
    gradients at each level are independent elementwise maps over the same
    shape, so stacking costs nothing and halves the chain."""

    def _axis_grad(a, axis):
        fwd = jnp.roll(a, -1, axis=axis) - a
        bwd = a - jnp.roll(a, 1, axis=axis)
        monotonic = ((fwd > 0) & (bwd > 0)) | ((fwd < 0) & (bwd < 0))
        denom = jnp.where(
            monotonic, 1.0 / jnp.where(fwd == 0, 1e-12, fwd), 0.0
        ) + jnp.where(monotonic, 1.0 / jnp.where(bwd == 0, 1e-12, bwd), 0.0)
        g = jnp.where(monotonic, 2.0 / jnp.where(denom == 0, 1e-12, denom), 0.0)
        n = a.shape[axis]
        idx = jnp.arange(n)
        interior = (idx > 0) & (idx < n - 1)
        shape = [1] * a.ndim
        shape[axis] = n
        return jnp.where(interior.reshape(shape), g, 0.0)

    return _axis_grad(imgs, imgs.ndim - 1), _axis_grad(imgs, imgs.ndim - 2)


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
