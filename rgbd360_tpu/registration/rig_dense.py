"""Joint dense alignment of a full multi-sensor rig in the robot frame.

TPU-native equivalent of the reference's `RegisterRGBD360::RegisterDensePhotoICP`
(`include/RegisterRGBD360.h:344-460`) and the robot-frame variants
`calcPhotoICPError_robot` / `calcHessianGradient_robot`
(`include/RegisterPhotoICP.h:4905,5083`): the 8 per-sensor pinhole RGB-D pairs
are aligned with ONE shared robot pose.  The reference runs 8 OpenMP-parallel
`RegisterPhotoICP` instances and sums their Hessians/gradients
(`RegisterRGBD360.h:435-440`); here the sensor axis is a `vmap` and the sum is
a fold through each sensor's SE(3) adjoint:

    T_i = Rt_i^-1 . T . Rt_i         (camera-frame motion of sensor i)
    dT = exp(xi)  =>  dT_i = exp(Ad(Rt_i^-1) xi)
    H  = sum_i Ad_i^T H_i Ad_i,   g = sum_i Ad_i^T g_i,   Ad_i = Ad(Rt_i^-1)

so the per-sensor normal equations (assembled by the same fused sweep as the
single-camera engine) fold exactly into the shared 6x6 robot-frame system.
This path registers two rig captures from the RAW per-sensor images without
stitching a sphere — the stitched-sphere `DenseAligner` remains the default
production path (the sphere IS the robot frame there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import se3
from rgbd360_tpu.registration.dense import (
    PHOTO_DEPTH,
    AlignResult,
    FramePyramid,
    _hess_grad_packed,
    _pack_target,
    _src_points,
    build_frame_pyramid,
    scale_intrinsics,
)

__all__ = ["RigDenseAligner", "build_rig_pyramid"]


def build_rig_pyramid(
    grays: jnp.ndarray, depths: jnp.ndarray, cfg: DenseRegConfig = DenseRegConfig()
) -> FramePyramid:
    """Per-sensor pinhole pyramids, stacked on a leading sensor axis.

    grays/depths: (S, H, W) float arrays (gray in [0, 1], depth in meters).
    """
    return jax.vmap(
        lambda g, d: build_frame_pyramid(g, d, cfg, spherical=False, allow_pallas=False)
    )(grays, depths)


class RigDenseAligner:
    """Coarse-to-fine joint Gauss-Newton over all rig sensors.

    intrinsics: (3, 3) shared pinhole K (the rig's sensors are identical,
    reference `include/Calib360.h:59-77`).
    extrinsics: (S, 4, 4) sensor-to-robot transforms Rt_i
    (reference `Calib360::getRt_id`, `include/Calib360.h:91`).
    """

    def __init__(
        self,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray,
        cfg: DenseRegConfig = DenseRegConfig(),
    ):
        self.cfg = cfg
        self.k = jnp.asarray(intrinsics, jnp.float32)
        self.rt = jnp.asarray(extrinsics, jnp.float32)
        self.rt_inv = jax.vmap(se3.se3_inverse)(self.rt)
        self.adj = jax.vmap(se3.adjoint)(self.rt_inv)  # (S, 6, 6)
        self._align = jax.jit(self._align_impl, static_argnames=("method", "occlusion"))

    def align(
        self,
        src: FramePyramid,
        trg: FramePyramid,
        init_pose: jnp.ndarray | None = None,
        method: int = PHOTO_DEPTH,
        occlusion: int = 0,
    ) -> AlignResult:
        """Align two stacked rig pyramids; returns the ROBOT-frame relative
        pose (source -> target) plus the joint 6x6 information matrix."""
        if init_pose is None:
            init_pose = jnp.eye(4)
        return self._align(src, trg, init_pose, method=method, occlusion=occlusion)

    # implementation

    def _level_arrays(self, pyr: FramePyramid, lvl: int):
        return dict(
            gray=pyr.gray[lvl],
            depth=pyr.depth[lvl],
            gray_gx=pyr.gray_gx[lvl],
            gray_gy=pyr.gray_gy[lvl],
            depth_gx=pyr.depth_gx[lvl],
            depth_gy=pyr.depth_gy[lvl],
        )

    def _joint_normal_eqs(self, src_gray, pts, valid, trg_pack, pose, intr, method, occlusion):
        """vmapped per-sensor sweeps folded through the sensor adjoints."""
        cfg = self.cfg
        hi = jax.lax.Precision.HIGHEST  # tiny matrices; keep SE(3) exact f32
        cam_poses = jnp.matmul(
            jnp.matmul(self.rt_inv, pose, precision=hi), self.rt, precision=hi
        )  # (S, 4, 4)

        def per_sensor(sg, p, v, tpk, cp):
            return _hess_grad_packed(sg, p, v, tpk, cp, cfg, method, occlusion, intr)

        h_i, g_i, stats = jax.vmap(per_sensor)(src_gray, pts, valid, trg_pack, cam_poses)
        adj_t = jnp.swapaxes(self.adj, -1, -2)
        hess = jnp.sum(
            jnp.matmul(jnp.matmul(adj_t, h_i, precision=hi), self.adj, precision=hi),
            axis=0,
        )
        grad = jnp.sum(jnp.matmul(adj_t, g_i[..., None], precision=hi)[..., 0], axis=0)
        err2 = jnp.sum(stats.get("photo_sq", jnp.zeros(()))) + jnp.sum(
            stats.get("depth_sq", jnp.zeros(()))
        )
        n = jnp.sum(stats.get("photo_n", jnp.zeros((), jnp.int32))) + jnp.sum(
            stats.get("depth_n", jnp.zeros((), jnp.int32))
        )
        joint = dict(
            mean_err=jnp.sqrt(err2 / jnp.maximum(n, 1)),
            visible=jnp.sum(stats["visible"]),
            photo_sq=jnp.sum(stats.get("photo_sq", jnp.zeros(()))),
            photo_n=jnp.sum(stats.get("photo_n", jnp.zeros((), jnp.int32))),
            depth_sq=jnp.sum(stats.get("depth_sq", jnp.zeros(()))),
            depth_n=jnp.sum(stats.get("depth_n", jnp.zeros((), jnp.int32))),
        )
        return hess, grad, joint

    def _align_impl(self, src, trg, init_pose, method, occlusion=0):
        cfg = self.cfg
        pose = init_pose
        iters = []
        ill = jnp.array(False)
        err = jnp.array(0.0)

        for lvl in reversed(range(cfg.pyramid_levels)):
            lsrc = self._level_arrays(src, lvl)
            ltrg = self._level_arrays(trg, lvl)
            intr = scale_intrinsics(self.k, lvl)
            pts, valid = jax.vmap(lambda d: _src_points(d, cfg, intr))(lsrc["depth"])
            # (S, H, W, 6) — or (S, H, W, 24) when cfg.bilinear: the tap
            # packing is per-sensor (vmap) with pinhole edge-clamp columns
            trg_pack = jax.vmap(
                lambda t: _pack_target(t, cfg.bilinear, wrap=False)
            )(ltrg)
            src_gray = lsrc["gray"]

            def cond(carry):
                cand, best, err_best, it, upd, diff, ill_l = carry[:7]
                return (
                    (it < cfg.max_iters_per_level)
                    & (upd > cfg.tol_update)
                    & (diff > cfg.tol_residual)
                    & ~ill_l
                )

            def body(carry):
                cand, best, err_best, it, upd, diff, ill_l, h_best, st_best = carry
                hess, grad, stats = self._joint_normal_eqs(
                    src_gray, pts, valid, trg_pack, cand, intr, method, occlusion
                )
                err = stats["mean_err"]
                bad = (jnp.linalg.det(hess) < 1e-12) | ~jnp.all(jnp.isfinite(hess))
                hsafe = jnp.where(bad, jnp.eye(6), hess)
                update = -jnp.linalg.solve(hsafe, grad)
                improved = (err_best - err) > cfg.tol_residual
                accept = improved & ~bad
                best_next = jnp.where(accept, cand, best)
                err_next = jnp.where(accept, err, err_best)
                # carry the accepted evaluation's H/stats — they ARE the
                # final statistics at loop exit (no post-loop sweep needed)
                h_next = jnp.where(accept, hess, h_best)
                st_next = {
                    k: jnp.where(accept, stats[k], st_best[k]) for k in st_best
                }
                next_cand = se3.se3_exp(update) @ cand
                cand_next = jnp.where(accept, next_cand, best_next)
                it = it + jnp.where(accept, 1, 0)
                diff_next = jnp.where(bad, 0.0, err_best - err)
                return (
                    cand_next,
                    best_next,
                    err_next,
                    it,
                    jnp.linalg.norm(update),
                    diff_next,
                    ill_l | bad,
                    h_next,
                    st_next,
                )

            stats0 = dict(
                mean_err=jnp.array(0.0),
                visible=jnp.array(0),
                photo_sq=jnp.array(0.0),
                photo_n=jnp.array(0),
                depth_sq=jnp.array(0.0),
                depth_n=jnp.array(0),
            )
            carry = (
                pose,
                pose,
                jnp.array(jnp.inf),
                jnp.array(-1),
                jnp.array(1.0),
                jnp.array(1.0),
                ill,
                jnp.zeros((6, 6)),
                stats0,
            )
            out = jax.lax.while_loop(cond, body, carry)
            _, pose, err, n_it, _, _, ill, hess_lvl, stats_lvl = out
            iters.append(jnp.maximum(n_it, 0))
            if lvl == 0:
                hess_out, stats = hess_lvl, stats_lvl
                size = lsrc["depth"].size

        sso = stats["visible"] / size
        av_photo = jnp.sqrt(stats["photo_sq"] / jnp.maximum(stats["photo_n"], 1))
        av_depth = jnp.sqrt(stats["depth_sq"] / jnp.maximum(stats["depth_n"], 1))

        return AlignResult(
            pose=pose,
            hessian=hess_out,
            error=err,
            av_photo_residual=av_photo,
            av_depth_residual=av_depth,
            sso=sso,
            iters=jnp.stack(iters[::-1]),
            ill_posed=ill,
        )
