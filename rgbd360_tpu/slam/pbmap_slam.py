"""PbMap-tracking graph SLAM (the reference `SLAM/SphereGraphSLAM.cpp`).

Every frame is tracked by sparse plane registration (PLANAR_ODOMETRY_3DOF)
against up to `track_depth` recent keyframes (reference `:175-244` tries up
to 5 previous KFs before declaring loss), every successfully tracked frame
joins the map as a keyframe with an SSO entry, loop closures come from the
batched LoopCloser, and the topological partitioner runs periodically.

This is the reference app that OWNS the background loop-closure thread
(`SLAM/SphereGraphSLAM.cpp:141` starts it; `include/LoopClosure360.h:93,108`
is its loop; `:251-271` of the app drains its edges opportunistically).
Round 5: the driver now runs its LC search + pose-graph optimize +
partition through the SAME deferred keyframe-event engine as
`KeyframeSLAM` (`TrackerBase._poll_pending` head-only FIFO): with
`kf.async_kf_events` (default) a keyframe frame only DISPATCHES the LC
scan; verification, edge insertion, optimization and partitioning drain
over later frames — tracking never waits on the "thread".  Synchronous
mode drains inline (the pre-round-5 behavior), and the two are
equivalence-tested (`tests/test_slam.py::test_pbmap_async_matches_sync`).
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
from rgbd360_tpu.slam.odometry import TrackerBase, fetch, is_motion_continuous
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
        self.n_loop_closures = 0
        self.events: list[dict] = []
        # host mirrors (same rationale as KeyframeSLAM: every
        # `int(map.n_kf)` / pose read is a blocking device fetch that also
        # synchronizes on all queued event programs)
        self._n_kf_host = 0
        self._n_edges_host = 0
        self._opt_poses_host: np.ndarray | None = None
        self._kf_pyr_cache: dict = {}

    def _opt_pose(self, k: int) -> np.ndarray:
        if self._opt_poses_host is None:
            self._opt_poses_host = np.array(self.map.opt_poses)
        return self._opt_poses_host[k]

    def _add_kf(self, state, pose: np.ndarray) -> int:
        k = self._n_kf_host
        self.map = self.map.add_keyframe(
            jnp.asarray(pose),
            state.sphere.sphere_gray,
            state.sphere.sphere_depth,
            state.planes,
            n_live=k,
        )
        self._nd()
        self._n_kf_host = k + 1
        if self._opt_poses_host is not None and k < len(self._opt_poses_host):
            self._opt_poses_host[k] = np.asarray(pose)
        else:
            self._opt_poses_host = None
        self._kf_pyr_cache[k] = state.pyramid
        return k

    def process(self, raw) -> dict:
        return self.process_state(self.make_state(raw))

    def process_state(self, state) -> dict:
        """One frame.  DEFERRED-COMPLETION SEMANTICS (async mode, default):
        the returned event dict's `loop_closures`/`chi2`/`optimized` fields
        are filled in on later frames as the deferred event's phases
        complete (and by `flush()`); read the aggregate
        `self.n_loop_closures` for always-current totals."""
        ev = {"keyframe": False, "tracked": False, "loop_closures": 0}
        self._poll_pending()
        n_kf = self._n_kf_host
        if n_kf == 0:
            self._add_kf(state, np.eye(4))
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
        pose = self._opt_pose(ref_kf) @ rel
        self._event_backpressure()
        self._cur_counter = [0]
        k = self._add_kf(state, pose)
        sso = float(pb.area_matched) / max(
            float(jnp.sum(jnp.where(state.planes.valid, state.planes.area, 0.0))),
            1e-6,
        )
        self.map = self.map.add_edge(
            ref_kf, k, jnp.asarray(rel), jnp.asarray(pb.information),
            sso=min(sso, 1.0), n_live=self._n_edges_host,
        )
        self._nd()
        self._n_edges_host += 1
        ev.update(keyframe=True, tracked=True, ref_kf=ref_kf, matches=int(pb.n_matches))

        gen = self._kf_event_gen(
            state, k, np.asarray(pose), ev, n_edges_snapshot=self._n_edges_host
        )
        self._pending.append((gen, None, self._cur_counter, self._poll_counter))
        if self.config.kf.async_kf_events:
            self._poll_pending()
        else:
            self._drain_pending()
            if ev.get("optimized"):
                pose = self._opt_pose(k)

        self.trajectory.append(np.asarray(pose))
        self.events.append(ev)
        return ev

    def _kf_event_gen(
        self, state, k: int, kf_pose: np.ndarray, ev: dict,
        n_edges_snapshot: int | None = None,
    ):
        """The SphereGraphSLAM keyframe event: LC scan -> verify -> edges ->
        optimize -> partition, as a phased generator on the shared deferred
        engine (the reference's LC thread body, `LoopClosure360.h:108-366` +
        the app's inline optimize).  The snapshot caps pin the scan to the
        map state the event was created against, so the deferred scan
        matches the synchronous one exactly (see `scan_dispatch`)."""
        lc = self.loop_closer

        # ---- phase A: dispatch the LC candidate scan (device-side gate +
        # batched plane match + top-k select, one program)
        scan = None
        # event-indexed condition (k is fixed at creation; _n_kf_host would
        # have advanced by the time a deferred generator body runs)
        if k + 1 > 3:  # scan excludes the 2 most recent KFs
            scan = lc.scan_dispatch(
                self.map, state.planes, jnp.asarray(kf_pose), k,
                n_kf_snapshot=k + 1, n_edges_snapshot=n_edges_snapshot,
            )
            self._nd()
        # ---- phase B: host-filter candidates; dispatch batched dense
        # verification (the fetch is owned by the poller — send protocol)
        scan_f = (yield (scan,))[0]
        lc_cand: list = []
        lc_pose: dict = {}
        verify_res = cand_pyrs = None
        if scan_f is not None:
            lc_cand, lc_pose = lc.select_host(scan_f)
            if lc_cand:
                verify_res, cand_pyrs = lc.verify_dispatch(
                    self.map, state.pyramid, lc_cand, lc_pose,
                    self._kf_pyr_cache,
                )
                self._nd()
        # ---- phase C: gate, rescue yaw-aliased seeds, add accepted edges
        vf = (yield (verify_res,))[0]
        lcs = []
        failures = []
        if vf is not None:
            for i, kf in enumerate(lc_cand):
                res = jax.tree_util.tree_map(lambda a: a[i], vf)
                if lc.gates_ok(res, None):
                    lcs.append(lc.accept(res, kf, k))
                else:
                    failures.append((i, kf))
        # all failed candidates rescue in ONE phase: fused coarse-sweep +
        # device-side argmin + verify per candidate, one combined fetch
        if failures:
            res_rs = tuple(
                lc.rescue_fused_dispatch(state.pyramid, cand_pyrs[i], lc_pose[kf])
                for i, kf in failures
            )
            self._nd(len(failures))
            res_rs_f = yield res_rs
            for (i, kf), res_r in zip(failures, res_rs_f):
                if lc.gates_ok(res_r, None):
                    lcs.append(lc.accept(res_r, kf, k))
        for lc_ in lcs:
            self.map = self.map.add_edge(
                lc_.kf_from, lc_.kf_to, jnp.asarray(lc_.rel),
                jnp.asarray(lc_.info), sso=lc_.sso, is_loop=True,
                n_live=self._n_edges_host,
            )
            self._nd()
            self._n_edges_host += 1
        ev["loop_closures"] = ev.get("loop_closures", 0) + len(lcs)
        self.n_loop_closures += len(lcs)

        # ---- phase D: optimize on new loop closures; periodic partition
        partition_due = (k + 1) % self.config.map.partition_every_n_kf == 0
        sso_f = None
        if lcs:
            g = self.config.graph
            n0 = self._n_kf_host  # keyframes the dispatched solve covers
            poses, chi2, _ = optimize_pose_graph(
                self.map.graph, g.max_iters, g.lm_lambda0, g.lm_step,
                loop_mask=self.map.edge_is_lc if g.robust_lc else None,
                dcs_phi=g.dcs_phi,
            )
            self._nd()
            # poses stay on device; chi2 readiness implies poses readiness
            if partition_due:  # one combined fetch round trip
                chi2_f, sso_f = yield (chi2, self.map.sso)
            else:
                chi2_f = (yield (chi2,))[0]
            # prefix-safe application: keyframes promoted while the solve
            # was in flight occupy later slots the solve never covered
            if self._n_kf_host > n0:
                poses = self.map.opt_poses.at[:n0].set(poses[:n0])
                self._nd()
            self.map = self.map.with_optimized(poses)
            self._opt_poses_host = None
            ev["chi2"] = float(chi2_f)
            ev["optimized"] = True
        elif partition_due:
            sso_f = (yield (self.map.sso,))[0]
        if partition_due:
            from dataclasses import replace as _replace

            area, n_areas = partition_map(
                self.map,
                self.config.map.sso_partition_threshold,
                sso=sso_f,
                n_kf=self._n_kf_host,
            )
            self.map = _replace(
                self.map, area=jnp.asarray(area), n_areas=jnp.int32(n_areas)
            )
        ev["kf_dispatches"] = self._cur_counter[0]
        self.kf_event_dispatches.append(self._cur_counter[0])
