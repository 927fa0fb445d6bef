"""PbMap-tracking graph SLAM (the reference `SLAM/SphereGraphSLAM.cpp`).

Every frame is tracked by sparse plane registration (PLANAR_ODOMETRY_3DOF)
against up to `track_depth` recent keyframes (reference `:175-244` tries up
to 5 previous KFs before declaring loss), every successfully tracked frame
joins the map as a keyframe with an SSO entry, loop closures come from the
batched LoopCloser, and the topological partitioner runs periodically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.config import FrameworkConfig
from rgbd360_tpu.core.frame import FrameBuilder
from rgbd360_tpu.registration.planes import PLANAR_ODOMETRY_3DOF
from rgbd360_tpu.slam.graph import optimize_pose_graph
from rgbd360_tpu.slam.loop_closure import LoopCloser
from rgbd360_tpu.slam.map import Map360
from rgbd360_tpu.slam.odometry import TrackerBase, is_motion_continuous
from rgbd360_tpu.slam.topological import partition_map


class PbMapGraphSLAM(TrackerBase):
    def __init__(
        self,
        builder: FrameBuilder,
        config: FrameworkConfig | None = None,
        track_depth: int = 5,
    ):
        super().__init__(builder, config)
        cfg = self.config
        self.track_depth = track_depth
        self.map = Map360.empty(
            cfg.map,
            cfg.sphere.height,
            cfg.sphere.width,
            cfg.seg.max_planes,
            cfg.seg.hull_dirs,
        )
        self.loop_closer = LoopCloser(cfg)
        self.trajectory: list[np.ndarray] = []
        self.no_assoc = 0
        self.events: list[dict] = []

    def process(self, raw) -> dict:
        return self.process_state(self.make_state(raw))

    def process_state(self, state) -> dict:
        ev = {"keyframe": False, "tracked": False, "loop_closures": 0}
        n_kf = int(self.map.n_kf)
        if n_kf == 0:
            self.map = self.map.add_keyframe(
                jnp.eye(4),
                state.sphere.sphere_gray,
                state.sphere.sphere_depth,
                state.planes,
            )
            self.trajectory.append(np.eye(4))
            ev.update(keyframe=True, tracked=True)
            self.events.append(ev)
            return ev

        # track against up to `track_depth` most recent keyframes
        kf_cfg = self.config.kf
        matched = None
        for back in range(1, min(self.track_depth, n_kf) + 1):
            ref_kf = n_kf - back
            kf_planes = jax.tree_util.tree_map(
                lambda a: a[ref_kf], self.map.planes
            )
            pb = self.plane_reg.register(
                kf_planes, state.planes, mode=PLANAR_ODOMETRY_3DOF
            )
            if bool(pb.success):
                rel = np.asarray(pb.pose)
                if is_motion_continuous(
                    rel,
                    kf_cfg.max_translation_odometry,
                    kf_cfg.max_rotation_odometry,
                ):
                    matched = (ref_kf, pb, rel)
                    break
        if matched is None:
            self.no_assoc += 1
            self.trajectory.append(
                self.trajectory[-1] if self.trajectory else np.eye(4)
            )
            self.events.append(ev)
            return ev

        ref_kf, pb, rel = matched
        pose = np.asarray(self.map.opt_poses[ref_kf]) @ rel
        k = int(self.map.n_kf)
        self.map = self.map.add_keyframe(
            jnp.asarray(pose),
            state.sphere.sphere_gray,
            state.sphere.sphere_depth,
            state.planes,
        )
        sso = float(pb.area_matched) / max(
            float(jnp.sum(jnp.where(state.planes.valid, state.planes.area, 0.0))),
            1e-6,
        )
        self.map = self.map.add_edge(
            ref_kf, k, jnp.asarray(rel), jnp.asarray(pb.information), sso=min(sso, 1.0)
        )
        ev.update(keyframe=True, tracked=True, ref_kf=ref_kf, matches=int(pb.n_matches))

        lcs = self.loop_closer.search(
            self.map,
            state.planes,
            state.sphere.sphere_gray,
            state.sphere.sphere_depth,
            jnp.asarray(pose),
            k,
        )
        for lc in lcs:
            self.map = self.map.add_edge(
                lc.kf_from, lc.kf_to, jnp.asarray(lc.rel), jnp.asarray(lc.info),
                sso=lc.sso, is_loop=True,
            )
        ev["loop_closures"] = len(lcs)
        if lcs:
            g = self.config.graph
            poses, chi2, _ = optimize_pose_graph(
                self.map.graph, g.max_iters, g.lm_lambda0, g.lm_step,
                loop_mask=self.map.edge_is_lc if g.robust_lc else None,
                dcs_phi=g.dcs_phi,
            )
            self.map = self.map.with_optimized(poses)
            pose = np.asarray(self.map.opt_poses[k])

        if int(self.map.n_kf) % self.config.map.partition_every_n_kf == 0:
            from dataclasses import replace as _replace

            area, n_areas = partition_map(
                self.map, self.config.map.sso_partition_threshold
            )
            self.map = _replace(
                self.map, area=jnp.asarray(area), n_areas=jnp.int32(n_areas)
            )

        self.trajectory.append(pose)
        self.events.append(ev)
        return ev
