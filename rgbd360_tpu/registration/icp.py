"""Projective ICP on spherical range images.

Covers the reference's geometric-only fallbacks: `alignPyramidICP`
(point-to-point ICP over depth pyramids, reference
`include/RegisterPhotoICP.h:4800-4903`) and the PCL GICP refinement used by
`RegisterPairRGBD360` (reference `Registration/RegisterPairRGBD360.cpp:
112-142`).  Data association is projective (warp into the target's spherical
grid — no KD-tree needed), and the error metric is selectable:

  * point-to-point (the reference ICP),
  * point-to-plane with target normals (the better default on structured
    indoor scenes), or
  * GICP — the true plane-to-plane metric of the reference's PCL
    `GeneralizedIterativeClosestPoint` (Segal et al., RSS 2009): each
    correspondence is weighted by M = (C_q + R C_p R^T)^-1 where
    C(n) = I - (1-eps) n n^T is the surface-aligned covariance
    (eigenvalues {eps, 1, 1}) from the local normal on BOTH sides.

Everything is one jitted coarse-to-fine Gauss-Newton like the dense
aligner; on TPU the per-level sweep is gathers + a (N, 6) x (6, N) matmul
(for GICP, batched 3x3 closed-form inverses + einsum contractions that XLA
maps onto the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import camera, se3

POINT_TO_POINT = 0
POINT_TO_PLANE = 1
GICP = 2

# GICP surface-covariance thickness along the normal (Segal et al. use 1e-3;
# the reference links PCL's default-configured GICP,
# `Registration/RegisterPairRGBD360.cpp:112-142`).
GICP_EPSILON = 1e-3


def _inv3_sym(s):
    """Batched closed-form inverse of symmetric 3x3 matrices (adjugate/det).

    jnp.linalg.inv lowers to an LU sweep per matrix; the adjugate is six
    fused elementwise products — the TPU-friendly form for (N, 3, 3)."""
    a, b, c = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
    d, e, f = s[..., 1, 1], s[..., 1, 2], s[..., 2, 2]
    i00 = d * f - e * e
    i01 = c * e - b * f
    i02 = b * e - c * d
    i11 = a * f - c * c
    i12 = b * c - a * e
    i22 = a * d - b * b
    det = a * i00 + b * i01 + c * i02
    inv = jnp.stack(
        [
            jnp.stack([i00, i01, i02], axis=-1),
            jnp.stack([i01, i11, i12], axis=-1),
            jnp.stack([i02, i12, i22], axis=-1),
        ],
        axis=-2,
    )
    return inv / jnp.maximum(det, 1e-12)[..., None, None]


def _target_normals(depth):
    """Cheap organized normals on the spherical grid from central
    differences of backprojected points."""
    pts = camera.sphere_backproject(depth)
    du = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
    dv = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-9)
    flip = jnp.sum(n * pts, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where((depth > 0)[..., None] & (norm > 1e-9), n, 0.0)


def _icp_sweep(
    pose, src_pts, src_valid, trg_pack, cfg, variant, max_corr_dist,
    src_norm=None,
):
    h, w = src_valid.shape
    # full-f32 point transform (TPU bf16 default would blur correspondences)
    tp = jnp.matmul(
        src_pts, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST
    ) + pose[:3, 3]
    rc, _ = camera.sphere_project(tp, h, w)
    r = jnp.clip(jnp.round(rc[..., 0]).astype(jnp.int32), 0, h - 1)
    c = jnp.round(rc[..., 1]).astype(jnp.int32) % w
    inb = (rc[..., 0] >= 0) & (rc[..., 0] < h) & src_valid

    # one flat (N, 7) row gather of [point, normal, valid] per sweep — TPU
    # gathers are per-row latency-bound, so three separate takes (and a
    # bit-packed bool take in particular) cost several times this form
    tv = jnp.take(trg_pack.reshape(-1, 7), r * w + c, axis=0)
    q = tv[..., 0:3]
    qn = tv[..., 3:6]
    qv = tv[..., 6] > 0.5
    diff = q - tp
    dist = jnp.linalg.norm(diff, axis=-1)
    m = inb & qv & (dist < max_corr_dist)
    wgt = m.astype(jnp.float32)

    if variant == GICP:
        # plane-to-plane: M = (C_q + R C_p R^T)^-1 with C(n) = I-(1-eps)nn^T,
        # so  S = 2I - (1-eps)(nq nq^T + rn rn^T)  where rn = R n_p.  Invalid
        # normals are zero rows -> their covariance degrades to I (point-to-
        # point behavior), exactly PCL's fallback for degenerate neighborhoods.
        rn = jnp.matmul(
            src_norm, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST
        )
        k = 1.0 - GICP_EPSILON
        eye = jnp.eye(3)
        s = (
            2.0 * eye
            - k * (qn[..., :, None] * qn[..., None, :])
            - k * (rn[..., :, None] * rn[..., None, :])
        )
        # Robust reweighting (Huber on the Mahalanobis distance): the
        # 1/(2*eps) ~ 500x normal-direction weight amplifies occlusion
        # outliers enough to drag the pose along the metric's tangential
        # null space; cap each correspondence's influence at the 1-sigma
        # Mahalanobis radius.  PCL bounds the same failure mode with its
        # correspondence-rejection distance + BFGS line search.
        minv = _inv3_sym(s)
        d2 = jnp.einsum("...a,...ab,...b->...", diff, minv, diff)
        huber = jnp.minimum(1.0, 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-12)))
        mw = minv * (wgt * huber)[..., None, None]  # masked robust weight
        eye_b = jnp.broadcast_to(eye, tp.shape[:-1] + (3, 3))
        jblk = jnp.concatenate([eye_b, -se3.skew(tp)], axis=-1)  # (..., 3, 6)
        j2 = jblk.reshape(-1, 3, 6)
        m2 = mw.reshape(-1, 3, 3)
        r2 = diff.reshape(-1, 3)
        mj = jnp.einsum("nab,nbj->naj", m2, j2)
        hess = jnp.einsum("nai,naj->ij", j2, mj)
        grad = jnp.einsum("naj,na->j", mj, r2)
        err2 = jnp.einsum("na,nab,nb->", r2, m2, r2)
    elif variant == POINT_TO_PLANE:
        # residual: n . (q - T p); jacobian row: [n | (T p) x n]
        rres = jnp.sum(qn * diff, axis=-1)
        jac = jnp.concatenate([qn, jnp.cross(tp, qn)], axis=-1)
        jf = (jac * wgt[..., None]).reshape(-1, 6)
        rf = (rres * wgt).reshape(-1)
        hess = jf.T @ jf
        # r(d) ~ r0 - J d  =>  d* = (J^T J)^-1 J^T r0
        grad = jf.T @ rf
        err2 = jnp.sum(rf * rf)
    else:
        # residual vector q - T p; jacobian [I | -skew(T p)] row-blocks
        eye = jnp.broadcast_to(jnp.eye(3), tp.shape[:-1] + (3, 3))
        jblk = jnp.concatenate([eye, -se3.skew(tp)], axis=-1)  # (..., 3, 6)
        jblk = jblk * wgt[..., None, None]
        rblk = diff * wgt[..., None]
        j2 = jblk.reshape(-1, 3, 6)
        r2 = rblk.reshape(-1, 3)
        hess = jnp.einsum("nij,nik->jk", j2, j2)
        grad = jnp.einsum("nij,ni->j", j2, r2)
        err2 = jnp.sum(r2 * r2)

    n_corr = jnp.sum(wgt)
    return hess, grad, err2, n_corr


class ICPAligner:
    """Coarse-to-fine projective ICP over spherical depth pyramids."""

    def __init__(
        self,
        cfg: DenseRegConfig = DenseRegConfig(),
        variant: int = POINT_TO_PLANE,
        max_corr_dist: float = 0.4,
        iters_per_level: int = 10,
    ):
        self.cfg = cfg
        self.variant = variant
        self.max_corr_dist = max_corr_dist
        self.iters = iters_per_level
        self._align = jax.jit(self._align_impl)

    def align(self, src_depth_pyr, trg_depth_pyr, init_pose=None):
        """src/trg: tuples of spherical depth images (level 0 first).

        Returns (pose T_trg<-src, hessian, rms error, n_correspondences).
        """
        if init_pose is None:
            init_pose = jnp.eye(4)
        return self._align(tuple(src_depth_pyr), tuple(trg_depth_pyr), init_pose)

    def _align_impl(self, src_pyr, trg_pyr, init_pose):
        cfg = self.cfg
        pose = init_pose
        hess_out = jnp.zeros((6, 6))
        err = jnp.array(0.0)
        n_corr = jnp.array(0.0)
        for lvl in reversed(range(len(src_pyr))):
            sd = src_pyr[lvl]
            td = trg_pyr[lvl]
            src_pts = camera.sphere_backproject(sd)
            src_valid = (sd > cfg.min_depth) & (sd < cfg.max_depth)
            src_norm = _target_normals(sd) if self.variant == GICP else None
            trg_pts = camera.sphere_backproject(td)
            trg_norm = _target_normals(td)
            trg_valid = (td > cfg.min_depth) & (td < cfg.max_depth)
            # hoisted: target channels packed once per level for the sweep's
            # single flat row gather
            trg_pack = jnp.concatenate(
                [trg_pts, trg_norm, trg_valid[..., None].astype(jnp.float32)],
                axis=-1,
            )

            def body(i, carry):
                pose, _, _, _ = carry
                hess, grad, err2, n = _icp_sweep(
                    pose, src_pts, src_valid, trg_pack,
                    cfg, self.variant, self.max_corr_dist,
                    src_norm=src_norm,
                )
                bad = (jnp.linalg.det(hess) < 1e-10) | (n < 100)
                hsafe = jnp.where(bad, jnp.eye(6), hess + 1e-6 * jnp.eye(6))
                delta = jnp.linalg.solve(hsafe, grad)
                delta = jnp.where(bad, jnp.zeros(6), delta)
                return (se3.se3_exp(delta) @ pose, hess, err2, n)

            pose, hess_out, err2, n_corr = jax.lax.fori_loop(
                0, self.iters, body, (pose, hess_out, err, n_corr)
            )
            err = jnp.sqrt(err2 / jnp.maximum(n_corr, 1.0))
        return pose, hess_out, err, n_corr
