"""Odometry and keyframe SLAM drivers.

Pose conventions (used consistently across the framework):
  * `DenseAligner.align(src, trg)` optimizes T with p_trg = T p_src, i.e. it
    returns T_trg<-src.  Calling `align(new_frame, keyframe)` therefore
    yields T_kf<-new directly.
  * `PlaneRegistration.register(ref, trg)` returns T_ref<-trg, so
    `register(keyframe, new_frame)` also yields T_kf<-new.
  * World poses compose as pose_new = pose_kf @ T_kf<-new.

Drivers:
  * FrameToFrameOdometry — the reference `Registration/OdometryRGBD360.cpp`
    pipeline: PbMap seed + dense refinement each frame, trajectory
    accumulation, continuity guards.
  * KeyframeSLAM — the reference `SLAM/KFsphere_SLAM.cpp` pipeline: plane
    fast path, dense tracking against the nearest keyframe, residual-based
    keyframe selection, neighbor-keyframe connections, loop closure, pose
    graph optimization, topological partitioning, relocalization after
    tracking loss.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.config import FrameworkConfig, default_config
from rgbd360_tpu.core.frame import FrameBuilder, SphereFrame
from rgbd360_tpu.ops import se3, stitch as stitch_ops
from rgbd360_tpu.registration import dense as D
from rgbd360_tpu.registration.planes import (
    PLANAR_3DOF,
    PlaneRegistration,
)
from rgbd360_tpu.slam.loop_closure import LoopCloser
from rgbd360_tpu.slam.map import Map360
from rgbd360_tpu.slam.graph import optimize_pose_graph
from rgbd360_tpu.slam.relocalizer import Relocalizer
from rgbd360_tpu.slam.topological import partition_map
from rgbd360_tpu.utils.trace import StageTimer


def fetch(tree):
    """One device->host round trip for a whole result pytree (field-by-field
    float()/bool() fetches cost a tunnel round trip EACH on remote TPUs)."""
    return jax.device_get(tree)


def is_motion_continuous(
    rel: np.ndarray, max_translation: float, max_rotation: float
) -> bool:
    """Odometry continuity guard (reference
    `Registration/OdometryKeyFrame360.cpp:75-95`,
    `include/Miscellaneous.h:69-72`)."""
    dt = float(np.linalg.norm(rel[:3, 3]))
    dr = float(np.asarray(se3.rotation_angle(jnp.asarray(rel[:3, :3]))))
    return dt < max_translation and dr < max_rotation


@dataclass
class FrameState:
    """Per-frame working set kept for the tracked reference frame."""

    sphere: SphereFrame
    pyramid: D.FramePyramid
    planes: object  # PlaneSet


class TrackerBase:
    def __init__(self, builder: FrameBuilder, config: FrameworkConfig | None = None):
        self.config = config or builder.config
        self.builder = builder
        self.aligner = D.DenseAligner(self.config.dense)
        self.plane_reg = PlaneRegistration(self.config.matcher)
        seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
        seam_levels = D.seam_masks_per_level(seam, self.config.dense.pyramid_levels)
        self._pyr = jax.jit(
            lambda g, d: D.build_frame_pyramid(g, d, self.config.dense, seam_levels)
        )
        # Stage taxonomy as first-class named trace regions (the reference's
        # ad-hoc per-stage timers, SURVEY 5.1); `print(tracker.timer.report())`
        self.timer = StageTimer()

    def make_state(self, raw) -> FrameState:
        with self.timer.region("build"):
            sphere = self.builder.build_from_raw(raw)
        with self.timer.region("pyramid"):
            pyramid = self._pyr(sphere.sphere_gray, sphere.sphere_depth)
        with self.timer.region("segment"):
            planes = self.builder.segment_planes(sphere)
        return FrameState(sphere=sphere, pyramid=pyramid, planes=planes)

    # Seeded solves whose final mean residual exceeds this are suspect
    # enough to warrant a second solve from identity (bad PbMap seeds land
    # in high-error local minima; well-seeded solves sit well below this).
    FALLBACK_ERROR = 3.0

    def align_with_fallback(self, src_pyr, trg_pyr, seed):
        """Dense alignment from a seed, retried from identity when the
        seeded solve fails, violates motion continuity, or converges to a
        high-error optimum (the reference's tracking-loss fallbacks,
        `SLAM/SphereGraphSLAM.cpp:175-244`).  The retry is gated — the
        common well-seeded case pays for ONE dense solve."""
        kf_cfg = self.config.kf
        res = fetch(self.aligner.align(src_pyr, trg_pyr, seed, method=D.PHOTO_DEPTH))
        good = not bool(res.ill_posed) and is_motion_continuous(
            np.asarray(res.pose),
            kf_cfg.max_translation_odometry,
            kf_cfg.max_rotation_odometry,
        )
        seed_is_identity = isinstance(seed, jnp.ndarray) and np.allclose(
            np.asarray(seed), np.eye(4)
        )
        if seed_is_identity or (good and float(res.error) < self.FALLBACK_ERROR):
            return res
        res_id = fetch(
            self.aligner.align(src_pyr, trg_pyr, jnp.eye(4), method=D.PHOTO_DEPTH)
        )
        good_id = not bool(res_id.ill_posed) and is_motion_continuous(
            np.asarray(res_id.pose),
            kf_cfg.max_translation_odometry,
            kf_cfg.max_rotation_odometry,
        )
        if not good:
            return res_id
        if good_id and float(res_id.error) < float(res.error):
            return res_id
        return res

    def make_state_from_sphere(self, gray, depth, rgb=None) -> FrameState:
        """Build tracking state from a raw spherical frame (stereo-variant
        style input, reference `Frame360_stereo`): planes come from the
        sphere itself."""
        sphere = SphereFrame(
            sphere_rgb=rgb if rgb is not None else jnp.zeros(gray.shape + (3,)),
            sphere_gray=gray,
            sphere_depth=depth,
            cloud_xyz=jnp.zeros((1, 1, 1, 3)),
            cloud_rgb=jnp.zeros((1, 1, 1, 3)),
            cloud_valid=jnp.zeros((1, 1, 1), bool),
            local_xyz=jnp.zeros((1, 1, 1, 3)),
        )
        pyramid = self._pyr(gray, depth)
        planes = self.builder.segment_planes_from_sphere(depth, sphere.sphere_rgb)
        return FrameState(sphere=sphere, pyramid=pyramid, planes=planes)


class FrameToFrameOdometry(TrackerBase):
    """Dense (PbMap-seeded) frame-to-frame odometry."""

    def __init__(self, builder: FrameBuilder, config: FrameworkConfig | None = None):
        super().__init__(builder, config)
        self.prev: FrameState | None = None
        self.pose = np.eye(4)
        self.trajectory: list[np.ndarray] = []
        self.stats: list[dict] = []

    def process(self, raw) -> dict:
        return self.process_state(self.make_state(raw))

    def process_state(self, state: FrameState) -> dict:
        info = {"keyframe": False, "tracked": True}
        if self.prev is None:
            self.trajectory.append(self.pose.copy())
            self.prev = state
            info["keyframe"] = True
            return info

        # PbMap seed (reference OdometryRGBD360.cpp:205 then dense :251)
        pb = self.plane_reg.register(self.prev.planes, state.planes, mode=PLANAR_3DOF)
        seed = jnp.asarray(pb.pose) if bool(pb.success) else jnp.eye(4)
        res = fetch(self.align_with_fallback(state.pyramid, self.prev.pyramid, seed))
        rel = np.asarray(res.pose)  # T_prev<-new
        kf_cfg = self.config.kf
        ok = (
            not bool(res.ill_posed)
            and is_motion_continuous(
                rel, kf_cfg.max_translation_odometry, kf_cfg.max_rotation_odometry
            )
        )
        if ok:
            self.pose = self.pose @ rel
        info.update(
            tracked=ok,
            rel=rel,
            av_depth_residual=float(res.av_depth_residual),
            sso=float(res.sso),
            pb_matches=int(pb.n_matches),
        )
        self.trajectory.append(self.pose.copy())
        self.stats.append(info)
        self.prev = state
        return info


class KeyframeSLAM(TrackerBase):
    """Keyframe SLAM with dense tracking, loop closure and pose-graph BA."""

    def __init__(self, builder: FrameBuilder, config: FrameworkConfig | None = None):
        super().__init__(builder, config)
        cfg = self.config
        self.map = Map360.empty(
            cfg.map,
            cfg.sphere.height,
            cfg.sphere.width,
            cfg.seg.max_planes,
            cfg.seg.hull_dirs,
        )
        self.loop_closer = LoopCloser(cfg)
        self.relocalizer = Relocalizer(cfg)
        self.current_kf = -1
        self.kf_state: FrameState | None = None
        # KF payloads are immutable -> their pyramids are memoized
        self._kf_pyr_cache: dict = {}
        self.pose = np.eye(4)  # current frame world pose
        self.trajectory: list[np.ndarray] = []
        self.lost = False
        self.n_loop_closures = 0
        self.events: list[dict] = []

    # ------------------------------------------------------------ helpers

    def _add_keyframe(self, state: FrameState, pose: np.ndarray) -> int:
        k = int(self.map.n_kf)
        self.map = self.map.add_keyframe(
            jnp.asarray(pose),
            state.sphere.sphere_gray,
            state.sphere.sphere_depth,
            state.planes,
        )
        self.current_kf = k
        self.kf_state = state
        self._kf_pyr_cache[k] = state.pyramid
        return k

    # --------------------------------------------------- checkpoint/resume

    def save_checkpoint(self, path: str) -> None:
        """Persist the full SLAM session: the map pytree plus the host-side
        tracking state (current KF, pose, trajectory, lost flag).  The KF
        pyramid cache is rebuilt lazily from the map payload on resume
        (SURVEY 5.4: checkpoint-restart for long/distributed runs)."""
        import numpy as np

        flat, _ = jax.tree_util.tree_flatten(self.map)

        def to_np(x):
            a = np.asarray(x)
            return a.astype(np.float32) if a.dtype.name == "bfloat16" else a

        np.savez_compressed(
            path,
            **{f"map_{i}": to_np(x) for i, x in enumerate(flat)},
            current_kf=np.int64(self.current_kf),
            pose=self.pose,
            trajectory=np.stack(self.trajectory) if self.trajectory else np.zeros((0, 4, 4)),
            lost=np.bool_(self.lost),
            n_loop_closures=np.int64(self.n_loop_closures),
        )

    def resume_from_checkpoint(self, path: str) -> None:
        """Restore a session saved by `save_checkpoint` into this tracker
        (which must have been built with the same config capacities)."""
        import numpy as np

        data = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten(self.map)
        leaves = [
            jnp.asarray(data[f"map_{i}"], dtype=flat[i].dtype)
            for i in range(len(flat))
        ]
        self.map = jax.tree_util.tree_unflatten(treedef, leaves)
        self.current_kf = int(data["current_kf"])
        self.pose = np.asarray(data["pose"])
        self.trajectory = [p for p in np.asarray(data["trajectory"])]
        self.lost = bool(data["lost"])
        self.n_loop_closures = int(data["n_loop_closures"])
        self.kf_state = None  # pyramids rebuilt lazily from the map payload
        self._kf_pyr_cache = {}

    def _optimize(self):
        g = self.config.graph
        loop_mask = self.map.edge_is_lc if g.robust_lc else None
        with self.timer.region("optimize"):
            poses, chi2, iters = optimize_pose_graph(
                self.map.graph, g.max_iters, g.lm_lambda0, g.lm_step,
                loop_mask=loop_mask, dcs_phi=g.dcs_phi,
            )
        self.map = self.map.with_optimized(poses)
        return float(chi2), int(iters)

    # ------------------------------------------------------------ process

    def process(self, raw) -> dict:
        return self.process_state(self.make_state(raw))

    def process_state(self, state: FrameState) -> dict:
        kf_cfg = self.config.kf
        ev: dict = {"keyframe": False, "loop_closures": 0, "relocalized": False}

        if self.current_kf < 0:  # first frame seeds the map
            self._add_keyframe(state, np.eye(4))
            self.trajectory.append(np.eye(4))
            ev["keyframe"] = True
            self.events.append(ev)
            return ev

        if self.lost:
            r = self.relocalizer.relocalize(self.map, state.planes)
            ev["relocalized"] = r.success
            if not r.success:
                self.trajectory.append(self.pose.copy())
                self.events.append(ev)
                return ev
            self.current_kf = r.kf
            self.kf_state = None  # pyramid of that KF rebuilt below
            self.pose = np.asarray(self.map.opt_poses[r.kf]) @ r.pose
            self.lost = False

        # reference keyframe pyramids (cached; rebuilt from the map payload
        # only after relocalization to an old keyframe)
        if self.kf_state is None:
            kf_pyr = self.loop_closer.kf_pyramid(
                self.map, self.current_kf, self._kf_pyr_cache
            )
            kf_planes = jax.tree_util.tree_map(
                lambda a: a[self.current_kf], self.map.planes
            )
        else:
            kf_pyr = self.kf_state.pyramid
            kf_planes = self.kf_state.planes

        # plane fast path (reference KFsphere_SLAM.cpp:314,354-366)
        with self.timer.region("register_pbmap"):
            pb = self.plane_reg.register(kf_planes, state.planes, mode=PLANAR_3DOF)
        kf_pose = np.asarray(self.map.opt_poses[self.current_kf])

        # dense tracking: T_kf<-new (reference :370-373)
        seed = jnp.asarray(pb.pose) if bool(pb.success) else jnp.eye(4)
        with self.timer.region("register_dense"):
            res = fetch(self.align_with_fallback(state.pyramid, kf_pyr, seed))
        rel = np.asarray(res.pose)
        depth_res = float(res.av_depth_residual)
        ev["av_depth_residual"] = depth_res
        ev["pb_matches"] = int(pb.n_matches)

        continuous = is_motion_continuous(
            rel, kf_cfg.max_translation_odometry, kf_cfg.max_rotation_odometry
        )
        if bool(res.ill_posed) or not continuous:
            self.lost = True
            ev["lost"] = True
            self.trajectory.append(self.pose.copy())
            self.events.append(ev)
            return ev

        self.pose = kf_pose @ rel

        # keyframe decision (reference :388-396 — keep tracking while the
        # depth residual stays low and we're close to the KF)
        small_motion = float(np.linalg.norm(rel[:3, 3])) < kf_cfg.min_dist_keyframes
        if depth_res < kf_cfg.select_kf_icp_dist or small_motion:
            self.trajectory.append(self.pose.copy())
            self.events.append(ev)
            return ev

        # ---- promote to keyframe (reference :516-633)
        prev_kf = self.current_kf
        k = self._add_keyframe(state, self.pose)
        ev["keyframe"] = True
        # dense odometry edge (T_prev<-new); info = dense Hessian
        self.map = self.map.add_edge(
            prev_kf,
            k,
            jnp.asarray(rel),
            jnp.asarray(res.hessian),
            sso=float(res.sso),
        )
        # consistent PbMap edge adds an extra constraint (reference :547-554)
        if bool(pb.success):
            dpb = np.asarray(pb.pose)
            dt = np.linalg.norm(dpb[:3, 3] - rel[:3, 3])
            dr = float(
                np.asarray(
                    se3.rotation_angle(jnp.asarray(dpb[:3, :3].T @ rel[:3, :3]))
                )
            )
            if dt < 0.1 and dr < np.deg2rad(5):
                self.map = self.map.add_edge(
                    prev_kf,
                    k,
                    jnp.asarray(dpb),
                    jnp.asarray(pb.information),
                    sso=float(res.sso),
                )

        # neighbor-keyframe connections: dense-align against other nearby
        # KFs and add extra edges (reference KFsphere_SLAM.cpp:405-461,
        # vConnections with residual < 1.8)
        n_kf_now = int(self.map.n_kf)
        centers = np.asarray(self.map.opt_poses[:n_kf_now, :3, 3])
        dist = np.linalg.norm(centers - self.pose[:3, 3], axis=1)
        near = [
            kf
            for kf in range(n_kf_now)
            if kf not in (prev_kf, k) and dist[kf] < kf_cfg.connection_radius
        ]
        n_connections = 0
        for kf in near[:3]:  # bound per-frame work like the area gating does
            kf_pyr2 = self.loop_closer.kf_pyramid(self.map, kf, self._kf_pyr_cache)
            seed2 = jnp.asarray(
                np.linalg.inv(np.asarray(self.map.opt_poses[kf])) @ self.pose
            )
            res2 = fetch(
                self.aligner.align(state.pyramid, kf_pyr2, seed2, method=D.PHOTO_DEPTH)
            )
            if (
                not bool(res2.ill_posed)
                and float(res2.av_depth_residual) < kf_cfg.max_connection_residual
            ):
                self.map = self.map.add_edge(
                    kf,
                    k,
                    jnp.asarray(res2.pose),
                    jnp.asarray(res2.hessian),
                    sso=float(res2.sso),
                )
                n_connections += 1
        ev["connections"] = n_connections

        # loop closures for the new keyframe
        with self.timer.region("loop_closure"):
            lcs = self.loop_closer.search(
                self.map,
                state.planes,
                state.sphere.sphere_gray,
                state.sphere.sphere_depth,
                jnp.asarray(self.pose),
                k,
                pyr_cache=self._kf_pyr_cache,
            )
        for lc in lcs:
            self.map = self.map.add_edge(
                lc.kf_from,
                lc.kf_to,
                jnp.asarray(lc.rel),
                jnp.asarray(lc.info),
                sso=lc.sso,
                is_loop=True,
            )
        ev["loop_closures"] = len(lcs)
        self.n_loop_closures += len(lcs)

        # optimize whenever the graph gained a non-odometry constraint
        if lcs or n_connections:
            chi2, iters = self._optimize()
            ev["chi2"] = chi2
            self.pose = np.asarray(self.map.opt_poses[k])

        # topological partitioning every 4 KFs (reference :710-717)
        if int(self.map.n_kf) % self.config.map.partition_every_n_kf == 0:
            area, n_areas = partition_map(
                self.map,
                self.config.map.sso_partition_threshold,
            )
            from dataclasses import replace as _replace

            self.map = _replace(
                self.map,
                area=jnp.asarray(area),
                n_areas=jnp.int32(n_areas),
            )

        self.trajectory.append(self.pose.copy())
        self.events.append(ev)
        return ev
