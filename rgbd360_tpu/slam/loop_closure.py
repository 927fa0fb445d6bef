"""Loop-closure detection over the keyframe map.

The reference runs a background thread that, for each new keyframe, scans
representative keyframes of non-neighbor areas within 5 m, PbMap-registers
them (PLANAR_3DoF, >=5 matches, area > 15), refines with dense alignment and
accepts when avDepthResidual < 2.0 (reference `include/LoopClosure360.h:
108-366`).

TPU-native redesign: there is no thread or mutex — the candidate search is
ONE batched program.  The PbMap matcher is vmapped over every live keyframe
at once (the map's plane sets are already stacked), distance- and area-gated
with masks, and only the best few survivors get the (expensive) dense
verification.  At scale the vmap axis shards over the device mesh by
keyframe index (`parallel/sharded.py`, enabled via `LoopCloser(mesh=...)`)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.config import FrameworkConfig
from rgbd360_tpu.ops import se3
from rgbd360_tpu.ops.segmentation import PlaneSet
from rgbd360_tpu.registration import dense as D
from rgbd360_tpu.registration.planes import (
    PLANAR_3DOF,
    match_planes,
    pose_from_matches,
)


def candidate_gate(
    map360, query_pose, query_kf: int, exclude_recent: int, lc_cfg
) -> np.ndarray:
    """Boolean candidate mask for loop-closure search (padded length).

    Area-driven, mirroring the reference's loop-closure thread
    (`include/LoopClosure360.h:289-366`): keyframes of the query's OWN
    topological area within the search radius, plus the representative
    keyframe (`Map360::vSelectedKFs`, `Map360.h:66-76`) of every NON-neighbor
    area in radius.  Neighbor-area keyframes are covered by the tracker's
    connection search (`KFsphere_SLAM.cpp:405-461`).  Until the map has been
    partitioned (one area), degrades to the plain radius scan."""
    n_kf = int(map360.n_kf)
    centers = np.asarray(map360.opt_poses[:, :3, 3])
    qc = np.asarray(query_pose[:3, 3])
    dist = np.linalg.norm(centers - qc, axis=1)
    idx = np.arange(map360.poses.shape[0])
    gate = (
        (idx < n_kf)
        & (dist < lc_cfg.search_radius)
        & (idx < query_kf - exclude_recent)
    )
    n_areas = int(map360.n_areas)
    if lc_cfg.area_gating and n_areas > 1:
        from rgbd360_tpu.slam.topological import (
            neighbor_areas,
            representative_keyframes,
        )

        area = np.asarray(map360.area)
        pad = map360.poses.shape[0] - n_kf
        q_area = int(area[min(query_kf, n_kf - 1)])
        neigh = neighbor_areas(map360)[q_area]  # (A,) incl. self
        reps = representative_keyframes(map360)
        is_rep = np.zeros(map360.poses.shape[0], bool)
        is_rep[reps[reps >= 0]] = True
        same_area = np.pad(area[:n_kf] == q_area, (0, pad))
        non_neigh = np.pad(~neigh[area[:n_kf]], (0, pad))
        gate &= same_area | (non_neigh & is_rep)
    return gate


@dataclass
class LoopClosure:
    """One accepted loop closure."""

    kf_from: int
    kf_to: int
    rel: np.ndarray  # x_from = rel @ x_to
    info: np.ndarray
    sso: float
    depth_residual: float


class LoopCloser:
    def __init__(self, config: FrameworkConfig, mesh=None):
        """`mesh`: optional `jax.sharding.Mesh` with one ('kf',) axis.  When
        given, the batch plane matcher runs KF-sharded over the mesh
        (`parallel/sharded.sharded_plane_scan`) — the production multi-chip
        path; the map's keyframe capacity must divide by the mesh size
        (Map360 capacities are powers of two, so they stay divisible across
        auto-grows)."""
        self.config = config
        self.mesh = mesh
        if mesh is None:
            self._batch_match = jax.jit(self._batch_match_impl)
        else:
            from rgbd360_tpu.parallel.sharded import sharded_plane_scan

            self._batch_match = lambda query, map_planes, gate: (
                sharded_plane_scan(
                    mesh, map_planes, query, gate, config.matcher, PLANAR_3DOF
                )
            )
        self._aligner = D.DenseAligner(config.dense)
        self._pyr = jax.jit(
            lambda g, d: D.build_frame_pyramid(g, d, config.dense)
        )

    def _batch_match_impl(self, query: PlaneSet, map_planes: PlaneSet, gate):
        """vmap the plane matcher over all keyframes; returns per-KF
        (n_matches, matched_area, pose, info, observable)."""
        cfg = self.config.matcher

        def one(kf_planes, g):
            pairs, n = match_planes(kf_planes, query, cfg, PLANAR_3DOF)
            pose, info, obs = pose_from_matches(kf_planes, query, pairs, n)
            vm = pairs[:, 0] >= 0
            area = jnp.sum(
                jnp.where(vm, kf_planes.area[jnp.clip(pairs[:, 0], 0, None)], 0.0)
            )
            n = jnp.where(g, n, 0)
            return n, area, pose, info, obs & g

        return jax.vmap(one)(map_planes, gate)

    def kf_pyramid(self, map360, k: int, cache: dict | None = None):
        """Alignment pyramid of keyframe k, rebuilt from the map payload;
        memoized in `cache` (KF payloads are immutable once added)."""
        if cache is not None and k in cache:
            return cache[k]
        pyr = self._pyr(
            map360.gray[k].astype(jnp.float32),
            map360.depth[k].astype(jnp.float32),
        )
        if cache is not None:
            cache[k] = pyr
        return pyr

    def search(
        self,
        map360,
        query_planes: PlaneSet,
        query_gray: jnp.ndarray,
        query_depth: jnp.ndarray,
        query_pose: jnp.ndarray,
        query_kf: int,
        exclude_recent: int = 2,
        max_dense_checks: int | None = None,
        pyr_cache: dict | None = None,
        ref_photo: float | None = None,
    ) -> list[LoopClosure]:
        """Find loop closures for a (new) keyframe.

        Candidate selection is area-driven, mirroring the reference's
        loop-closure thread (`include/LoopClosure360.h:289-366`): keyframes
        of the query's OWN topological area within the search radius, plus
        the representative keyframe of every NON-neighbor area in radius
        (`Map360::vSelectedKFs`, `Map360.h:66-76`).  Neighbor-area keyframes
        are covered by the tracker's connection search instead
        (`KFsphere_SLAM.cpp:405-461`).  This keeps per-keyframe loop-closure
        work bounded by area size + area count, independent of total map
        size.  Until the map has been partitioned (one area), the gate
        degrades to the plain radius scan.

        `ref_photo` is the tracker's current photometric residual; when
        given (and `lc.max_photo_ratio` is set), candidates whose verified
        photometric residual exceeds `max_photo_ratio * ref_photo` are
        rejected — geometry-only acceptance (the reference's
        `avDepthResidual < 2.0`) is blind to rotational aliasing in
        (near-)symmetric spaces, where a wrong-by-45-degrees pose fits the
        depth perfectly but not the texture."""
        lc_cfg = self.config.lc
        if max_dense_checks is None:
            max_dense_checks = lc_cfg.max_dense_checks
        n_kf = int(map360.n_kf)
        if n_kf <= exclude_recent + 1:
            return []

        # area-driven candidate gate over OPTIMIZED poses — the query pose
        # lives in the optimized frame
        gate = candidate_gate(map360, query_pose, query_kf, exclude_recent, lc_cfg)
        if not gate.any():
            return []

        n_m, area, pose, info, obs = self._batch_match(
            query_planes, map360.planes, jnp.asarray(gate)
        )
        n_m = np.asarray(n_m)
        area = np.asarray(area)
        ok = (
            np.asarray(obs)
            & (n_m >= lc_cfg.min_matches)
            & (area > lc_cfg.min_area)
        )
        cand = np.where(ok)[0]
        if len(cand) == 0:
            return []
        # strongest candidates first
        cand = cand[np.argsort(-n_m[cand])][:max_dense_checks]

        # dense verification (reference refines with alignFrames360 and gates
        # avDepthResidual < 2.0, LoopClosure360.h:311-316; here plus the
        # photometric gate and a heading-rescue retry)
        out: list[LoopClosure] = []
        q_pyr = self._pyr(query_gray, query_depth)

        def gates_ok(res) -> bool:
            photo_ok = (
                lc_cfg.max_photo_ratio is None
                or ref_photo is None
                or float(res.av_photo_residual)
                < max(lc_cfg.max_photo_ratio * ref_photo, lc_cfg.photo_gate_floor)
            )
            return (
                float(res.av_depth_residual) < lc_cfg.max_depth_residual
                and photo_ok
                and not bool(res.ill_posed)
            )

        for k in cand:
            kf_pyr = self.kf_pyramid(map360, int(k), pyr_cache)
            # seed: plane pose maps x_kf = T x_query; dense align(query, kf)
            # optimizes T_kf<-query when called as align(src=query, trg=kf)
            seed = jnp.asarray(pose[k])
            res = jax.device_get(
                self._aligner.align(q_pyr, kf_pyr, seed, method=D.PHOTO_DEPTH)
            )
            if not gates_ok(res):
                # heading rescue: the plane seed may be yaw-aliased —
                # coarse-GN-refine left-composed yaw hypotheses in one
                # vmapped batch and fully verify only the best
                cands = se3.yaw_grid(16) @ np.asarray(pose[k])[None]
                refined, errs = jax.device_get(
                    self._aligner.coarse_align(q_pyr, kf_pyr, jnp.asarray(cands))
                )
                best = int(np.argmin(np.asarray(errs)))
                res = jax.device_get(
                    self._aligner.align(
                        q_pyr, kf_pyr, jnp.asarray(np.asarray(refined)[best]),
                        method=D.PHOTO_DEPTH,
                    )
                )
                if not gates_ok(res):
                    continue
            out.append(
                LoopClosure(
                    kf_from=int(k),
                    kf_to=int(query_kf),
                    rel=np.asarray(res.pose),
                    info=np.asarray(res.hessian),
                    sso=float(res.sso),
                    depth_residual=float(res.av_depth_residual),
                )
            )
        return out
