"""Batched-hypothesis RANSAC plane fit on unorganized point clouds.

The reference fits one dominant plane per cloud with PCL's
`RandomSampleConsensus<SampleConsensusModelPlane>` at a 0.03 m distance
threshold in its ToF/Kinect cross-calibration app
(`Calibration/ToFCalibrator.cpp:231-239,258-266`), and MRPT's generic
RANSAC with a plane model in the control-plane matcher
(`Calibration/GetControlPlanes.cpp:129-243`).

PCL's loop draws one 3-point hypothesis per iteration and scores it over all
points sequentially.  The TPU-native form draws ALL hypotheses up front and
scores every (point, hypothesis) pair in one (N, H) matmul-shaped sweep —
the argmax over hypotheses replaces the sequential best-so-far, with
identical semantics for a fixed hypothesis budget:

  * H random 3-point index triples (fixed PRNG seed => deterministic);
  * plane per triple by cross product, degenerate triples (collinear or
    repeated points) masked out — the `ransac3Dplane_degenerate` check
    (`GetControlPlanes.cpp:194`);
  * |P n^T + d| < tau inlier counting for all hypotheses at once;
  * optional least-squares refit (covariance eigenvector) on the winning
    hypothesis' inliers, the `optimizeModelCoefficients` analogue.

Plane convention: (n, d) with n . x + d = 0, |n| = 1, sign-normalized so
d >= 0 (the reference flips the coefficient vector when d < 0,
`ToFCalibrator.cpp:237,265`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ransac_plane", "fit_plane_lsq"]


@partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_plane_core(pts, valid, key, dist_threshold, num_hypotheses):
    """pts (N, 3) f32, valid (N,) bool -> (n (3,), d (), best_count ())."""
    n_pts = pts.shape[0]
    idx = jax.random.randint(key, (num_hypotheses, 3), 0, n_pts)
    p0, p1, p2 = (pts[idx[:, k]] for k in range(3))  # (H, 3) each
    v0 = jnp.all(valid[idx], axis=1)  # hypothesis drawn from valid points only
    nrm = jnp.cross(p1 - p0, p2 - p0)
    mag = jnp.linalg.norm(nrm, axis=1)
    ok = v0 & (mag > 1e-8)
    nrm = nrm / jnp.maximum(mag, 1e-12)[:, None]
    d = -jnp.sum(nrm * p0, axis=1)  # (H,)

    # (N, H) signed distances as one matmul; invalid points never vote
    dist = jnp.abs(pts @ nrm.T + d[None, :])
    votes = (dist < dist_threshold) & valid[:, None]
    counts = jnp.where(ok, jnp.sum(votes, axis=0), -1)
    best = jnp.argmax(counts)
    return nrm[best], d[best], counts[best]


@jax.jit
def _refit_core(pts, w):
    """Weighted LS plane through pts: smallest-eigenvector of the weighted
    covariance (n), d = -n . centroid."""
    sw = jnp.maximum(jnp.sum(w), 1e-12)
    c = jnp.sum(pts * w[:, None], axis=0) / sw
    q = (pts - c) * jnp.sqrt(w)[:, None]
    cov = q.T @ q
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[:, 0]
    return n, -jnp.dot(n, c)


def fit_plane_lsq(points, weights=None):
    """Least-squares plane (n, d) through weighted points, d >= 0."""
    pts = jnp.asarray(points, jnp.float32)
    w = jnp.ones(pts.shape[0]) if weights is None else jnp.asarray(weights, jnp.float32)
    n, d = _refit_core(pts, w)
    n, d = np.asarray(n, np.float64), float(d)
    if d < 0:
        n, d = -n, -d
    return n, d


def ransac_plane(
    points,
    valid=None,
    *,
    dist_threshold: float = 0.03,
    num_hypotheses: int = 512,
    seed: int = 0,
    refine: bool = True,
):
    """Fit the dominant plane of a point cloud.

    Returns ``(n (3,) float64, d float, inlier_mask (N,) bool)`` with
    n . x + d = 0 and d >= 0.  `dist_threshold` defaults to PCL's 0.03 m
    from the reference ToF calibrator (`ToFCalibrator.cpp:232`).
    """
    pts = jnp.asarray(points, jnp.float32)
    if pts.ndim != 2 or pts.shape[1] != 3:
        raise ValueError(f"points must be (N, 3), got {pts.shape}")
    if pts.shape[0] < 3:
        raise ValueError("need at least 3 points")
    v = (
        jnp.ones(pts.shape[0], bool)
        if valid is None
        else jnp.asarray(valid, bool)
    )
    v = v & jnp.all(jnp.isfinite(pts), axis=1)
    pts = jnp.nan_to_num(pts)
    key = jax.random.PRNGKey(seed)
    n, d, count = _ransac_plane_core(
        pts, v, key, jnp.float32(dist_threshold), num_hypotheses
    )
    if int(count) <= 0:
        raise ValueError("RANSAC found no valid plane hypothesis")
    inliers = (jnp.abs(pts @ n + d) < dist_threshold) & v
    if refine:
        n, d = _refit_core(pts, inliers.astype(jnp.float32))
        inliers = (jnp.abs(pts @ n + d) < dist_threshold) & v
    n, d = np.asarray(n, np.float64), float(d)
    if d < 0:
        n, d = -n, -d
    return n, d, np.asarray(inliers)
