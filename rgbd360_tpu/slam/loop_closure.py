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


from functools import partial


@partial(jax.jit, static_argnames=("area_gating",))
def _gate_kernel(
    opt_poses, n_kf, area, n_areas, sso, edges_ij, emask,
    query_pose, query_kf, exclude_recent, radius, area_gating: bool,
):
    """Device-side candidate gate: distance + recency + area logic computed
    entirely on device so a keyframe event never pulls the O(capacity) pose
    array over the host link (the round-2 review's per-KF-readback item)."""
    from rgbd360_tpu.slam.topological import (
        area_adjacency_device,
        representative_mask_device,
    )

    n = opt_poses.shape[0]
    idx = jnp.arange(n)
    live = idx < n_kf
    dist = jnp.linalg.norm(
        opt_poses[:, :3, 3] - query_pose[:3, 3], axis=1
    )
    gate = live & (dist < radius) & (idx < query_kf - exclude_recent)
    if area_gating:
        q_area = area[jnp.clip(jnp.minimum(query_kf, n_kf - 1), 0, None)]
        neigh = area_adjacency_device(area, edges_ij, emask, n)
        is_rep = representative_mask_device(sso, area, n_kf)
        same_area = area == q_area
        non_neigh = ~neigh[q_area][area]
        # unpartitioned (n_areas <= 1): plain radius scan
        gate = gate & jnp.where(
            n_areas > 1, same_area | (non_neigh & is_rep), True
        )
    return gate


def candidate_gate(map360, query_pose, query_kf: int, exclude_recent: int, lc_cfg):
    """Boolean candidate mask for loop-closure search (padded length,
    returned as a DEVICE array feeding the batch matcher directly).

    Area-driven, mirroring the reference's loop-closure thread
    (`include/LoopClosure360.h:289-366`): keyframes of the query's OWN
    topological area within the search radius, plus the representative
    keyframe (`Map360::vSelectedKFs`, `Map360.h:66-76`) of every NON-neighbor
    area in radius.  Neighbor-area keyframes are covered by the tracker's
    connection search (`KFsphere_SLAM.cpp:405-461`).  Until the map has been
    partitioned (one area), degrades to the plain radius scan."""
    return _gate_kernel(
        map360.opt_poses,
        map360.n_kf,
        map360.area,
        map360.n_areas,
        map360.sso,
        map360.graph.edges_ij,
        map360.graph.emask,
        jnp.asarray(query_pose),
        jnp.asarray(query_kf),
        jnp.asarray(exclude_recent),
        jnp.asarray(lc_cfg.search_radius),
        area_gating=bool(lc_cfg.area_gating),
    )


@partial(jax.jit, static_argnames=("k",))
def _select_candidates(n_m, area, obs, pose, min_matches, min_area, k: int):
    """Device-side survivor selection: top-k candidates by match count
    among those passing the LC gates — only O(k) data crosses to host."""
    ok = obs & (n_m >= min_matches) & (area > min_area)
    score = jnp.where(ok, n_m, -1)
    top_scores, top_idx = jax.lax.top_k(score, k)
    return top_idx, top_scores > 0, pose[top_idx]


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
        import dataclasses as _dc

        verify_cfg = (
            _dc.replace(
                config.dense,
                salient_pixels=config.lc.verify_salient_pixels,
                # polish is mandatory with thinned verify sweeps: without
                # it borderline closures fail the depth gate (measured,
                # LoopClosureConfig.verify_salient_pixels)
                polish_iters=max(2, config.dense.polish_iters),
            )
            if config.lc.verify_salient_pixels > 0
            else config.dense
        )
        self._aligner = D.DenseAligner(verify_cfg)
        self._pyr = jax.jit(
            lambda g, d: D.build_frame_pyramid(g, d, config.dense)
        )

    def _scan_select_impl(
        self, query, map_planes, opt_poses, n_kf, area, n_areas, sso,
        edges_ij, emask, query_pose, query_kf, exclude_recent, radius,
        min_matches, min_area, area_gating: bool, k: int,
    ):
        """Gate + batch plane match + top-k survivor selection as ONE
        program (single-device path): a keyframe event costs one dispatch
        and one O(k) fetch here instead of three round trips."""
        gate = _gate_kernel(
            opt_poses, n_kf, area, n_areas, sso, edges_ij, emask,
            query_pose, query_kf, exclude_recent, radius,
            area_gating=area_gating,
        )
        n_m, area_m, pose, info, obs = self._batch_match_impl(
            query, map_planes, gate
        )
        return _select_candidates(n_m, area_m, obs, pose, min_matches, min_area, k)

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

    # ----------------------------------------------------- deferred halves
    #
    # The reference hides loop-closure latency behind tracking with a
    # background thread (`include/LoopClosure360.h:93,108`).  The TPU-native
    # equivalent exploits JAX's async dispatch instead: each stage below
    # DISPATCHES device programs and returns their un-fetched result arrays,
    # so the tracker can interleave tracked frames between stages and only
    # fetch once the device (and the tunnel) has caught up.  `search` remains
    # the synchronous composition of the same halves — one code path.

    def scan_dispatch(
        self,
        map360,
        query_planes: PlaneSet,
        query_pose: jnp.ndarray,
        query_kf: int,
        exclude_recent: int = 2,
        max_dense_checks: int | None = None,
        n_kf_snapshot: int | None = None,
        n_edges_snapshot: int | None = None,
    ):
        """Dispatch gate + batch plane match + top-k select; returns the
        (top_idx, top_ok, top_pose) DEVICE arrays without fetching.

        `n_kf_snapshot` / `n_edges_snapshot`: keyframe/edge counts at the
        EVENT's creation.  A deferred event's scan may run after later
        keyframes joined the map; recency gating already excludes them as
        candidates, but the representative-mask and area-adjacency helpers
        would otherwise see the larger set and diverge from the
        synchronous pipeline (round-5 pbmap sync/async equivalence) — the
        caps restore the exact snapshot the sync scan sees."""
        lc_cfg = self.config.lc
        if max_dense_checks is None:
            max_dense_checks = lc_cfg.max_dense_checks
        n_kf = map360.n_kf
        emask = map360.graph.emask
        if n_kf_snapshot is not None:
            n_kf = jnp.minimum(n_kf, jnp.int32(n_kf_snapshot))
        if n_edges_snapshot is not None:
            emask = emask & (
                jnp.arange(emask.shape[0]) < jnp.int32(n_edges_snapshot)
            )
        if self.mesh is None:
            if not hasattr(self, "_scan_select"):
                self._scan_select = jax.jit(
                    self._scan_select_impl,
                    static_argnames=("area_gating", "k"),
                )
            return self._scan_select(
                query_planes,
                map360.planes,
                map360.opt_poses,
                n_kf,
                map360.area,
                map360.n_areas,
                map360.sso,
                map360.graph.edges_ij,
                emask,
                jnp.asarray(query_pose),
                jnp.asarray(query_kf),
                jnp.asarray(exclude_recent),
                jnp.asarray(lc_cfg.search_radius),
                jnp.asarray(lc_cfg.min_matches),
                jnp.asarray(lc_cfg.min_area),
                area_gating=bool(lc_cfg.area_gating),
                k=max_dense_checks,
            )
        gate = _gate_kernel(
            map360.opt_poses, n_kf, map360.area, map360.n_areas,
            map360.sso, map360.graph.edges_ij, emask,
            jnp.asarray(query_pose), jnp.asarray(query_kf),
            jnp.asarray(exclude_recent), jnp.asarray(lc_cfg.search_radius),
            area_gating=bool(lc_cfg.area_gating),
        )
        n_m, area, pose, info, obs = self._batch_match(
            query_planes, map360.planes, gate
        )
        return _select_candidates(
            n_m, area, obs, pose,
            jnp.asarray(lc_cfg.min_matches),
            jnp.asarray(lc_cfg.min_area),
            k=max_dense_checks,
        )

    @staticmethod
    def select_host(fetched) -> tuple[list[int], dict]:
        """Host half of candidate selection: fetched (top_idx, top_ok,
        top_pose) -> (candidate kf list, {kf: seed pose})."""
        top_idx, top_ok, top_pose = fetched
        cand = [int(i) for i, v in zip(top_idx, top_ok) if v]
        cand_pose = {
            int(i): p for i, v, p in zip(top_idx, top_ok, top_pose) if v
        }
        return cand, cand_pose

    def verify_dispatch(self, map360, q_pyr, cand, cand_pose, pyr_cache=None):
        """Dispatch the batched dense verification of all candidates; returns
        (un-fetched result batch, candidate pyramids).  Seeds: the plane pose
        maps x_kf = T x_query and align(query, kf) optimizes exactly that
        T_kf<-query."""
        cand_pyrs = [self.kf_pyramid(map360, int(k), pyr_cache) for k in cand]
        res_b = D.batch_align_targets_dispatch(
            self._aligner, q_pyr, cand_pyrs,
            [cand_pose[int(k)] for k in cand],
        )
        return res_b, cand_pyrs

    def gates_ok(self, res, ref_photo: float | None) -> bool:
        """Acceptance gates on a FETCHED verify result (depth residual,
        reference `LoopClosure360.h:311-316`; photometric gate beyond-ref)."""
        lc_cfg = self.config.lc
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

    def rescue_coarse_dispatch(self, q_pyr, kf_pyr, seed_pose):
        """Dispatch the yaw-alias heading rescue's coarse sweep (16 yaw
        hypotheses left-composed on the plane seed, one vmapped program)."""
        cands = se3.yaw_grid(16) @ np.asarray(seed_pose)[None]
        return self._aligner.coarse_align(q_pyr, kf_pyr, jnp.asarray(cands))

    def rescue_align_dispatch(self, q_pyr, kf_pyr, refined, errs):
        """Dispatch the full verify from the best coarse rescue hypothesis
        (inputs already fetched)."""
        best = int(np.argmin(np.asarray(errs)))
        return self._aligner.align(
            q_pyr, kf_pyr, jnp.asarray(np.asarray(refined)[best]),
            method=D.PHOTO_DEPTH,
        )

    def rescue_fused_dispatch(self, q_pyr, kf_pyr, seed_pose):
        """ONE-dispatch heading rescue: the 16-yaw coarse sweep, the
        device-side argmin over post-refinement errors, and the full
        verify from the best hypothesis compile into a single program —
        the split coarse->fetch->align path cost a deferred keyframe event
        two extra phases (each a fetch round trip) per failed candidate
        (round 5; the reference's LC thread re-registers failed candidates
        inline the same way, `include/LoopClosure360.h:311-316`)."""
        if not hasattr(self, "_rescue_fused"):
            def impl(qp, kp, cands):
                refined, errs = self._aligner._coarse_align_impl(
                    qp, kp, cands, method=D.PHOTO_DEPTH, iters=10
                )
                best = jnp.argmin(errs)
                return self._aligner.align(
                    qp, kp, refined[best], method=D.PHOTO_DEPTH
                )

            self._rescue_fused = jax.jit(impl)
        cands = se3.yaw_grid(16) @ np.asarray(seed_pose)[None]
        return self._rescue_fused(q_pyr, kf_pyr, jnp.asarray(cands))

    @staticmethod
    def accept(res, kf_from: int, query_kf: int) -> "LoopClosure":
        return LoopClosure(
            kf_from=int(kf_from),
            kf_to=int(query_kf),
            rel=np.asarray(res.pose),
            info=np.asarray(res.hessian),
            sso=float(res.sso),
            depth_residual=float(res.av_depth_residual),
        )

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
        q_pyr=None,
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
        depth perfectly but not the texture.

        `q_pyr`: the query's alignment pyramid when the caller already built
        it (the tracker's fused frontend did) — skips a rebuild dispatch."""
        n_kf = int(map360.n_kf)
        if n_kf <= exclude_recent + 1:
            return []

        # area-driven candidate gate over OPTIMIZED poses — computed and
        # consumed on device; only the top-k survivors (indices + seed
        # poses) cross the host link.  Single-device: gate + match + select
        # fuse into ONE dispatch; sharded: the KF-sharded scan stays its
        # own program between the gate and the select.
        cand, cand_pose = self.select_host(
            jax.device_get(
                self.scan_dispatch(
                    map360, query_planes, query_pose, query_kf,
                    exclude_recent, max_dense_checks,
                )
            )
        )
        if not cand:
            return []

        # dense verification (reference refines with alignFrames360 and gates
        # avDepthResidual < 2.0, LoopClosure360.h:311-316; here plus the
        # photometric gate and a heading-rescue retry).  First pass verifies
        # ALL surviving candidates in ONE vmapped dispatch.
        out: list[LoopClosure] = []
        if q_pyr is None:
            q_pyr = self._pyr(query_gray, query_depth)
        res_b, cand_pyrs = self.verify_dispatch(
            map360, q_pyr, cand, cand_pose, pyr_cache
        )
        res_b = jax.device_get(res_b)
        for i, k in enumerate(cand):
            kf_pyr = cand_pyrs[i]
            res = jax.tree_util.tree_map(lambda a: a[i], res_b)
            if not self.gates_ok(res, ref_photo):
                # heading rescue: the plane seed may be yaw-aliased —
                # coarse-GN-refine left-composed yaw hypotheses in one
                # vmapped batch and fully verify only the best
                refined, errs = jax.device_get(
                    self.rescue_coarse_dispatch(q_pyr, kf_pyr, cand_pose[int(k)])
                )
                res = jax.device_get(
                    self.rescue_align_dispatch(q_pyr, kf_pyr, refined, errs)
                )
                if not self.gates_ok(res, ref_photo):
                    continue
            out.append(self.accept(res, int(k), query_kf))
        return out
