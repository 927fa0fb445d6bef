"""SLAM layer tests: pose graph, map, topological partitioning, relocalizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.config import default_config
from rgbd360_tpu.ops import se3
from rgbd360_tpu.slam.graph import PoseGraph, graph_chi2, optimize_pose_graph
from rgbd360_tpu.slam.map import Map360
from rgbd360_tpu.slam.topological import (
    partition_map,
    recursive_spectral_partition,
)


def _ring_graph(n=12, noise=0.03, seed=0):
    """Odometry ring with a loop-closure edge: classic pose-graph test."""
    rng = np.random.default_rng(seed)
    # ground truth: walk around a circle
    gt = [np.eye(4)]
    step = np.asarray(
        se3.se3_exp(jnp.array([1.0, 0.0, 0.0, 0.0, 2 * np.pi / n, 0.0]))
    )
    for _ in range(n - 1):
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)

    g = PoseGraph.empty(n, 2 * n)
    # noisy odometry estimates accumulate drift
    poses = [np.eye(4)]
    e = 0
    edges_ij, rels, infos, emask = (
        np.full((2 * n, 2), -1, np.int32),
        np.tile(np.eye(4), (2 * n, 1, 1)),
        np.tile(np.eye(6), (2 * n, 1, 1)),
        np.zeros(2 * n, bool),
    )
    for i in range(n - 1):
        z = np.linalg.inv(gt[i]) @ gt[i + 1]
        z_noisy = z @ np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, noise, 6))))
        poses.append(poses[-1] @ z_noisy)
        edges_ij[e] = (i, i + 1)
        rels[e] = z_noisy
        infos[e] = np.eye(6) * 100
        emask[e] = True
        e += 1
    # exact loop closure n-1 -> 0
    z = np.linalg.inv(gt[n - 1]) @ gt[0]
    edges_ij[e] = (n - 1, 0)
    rels[e] = z
    infos[e] = np.eye(6) * 1000
    emask[e] = True
    e += 1

    g = PoseGraph(
        poses=jnp.asarray(np.stack(poses)),
        vmask=jnp.ones(n, bool),
        edges_ij=jnp.asarray(edges_ij),
        rel=jnp.asarray(rels),
        info=jnp.asarray(infos),
        emask=jnp.asarray(emask),
    )
    return g, gt


class TestPoseGraph:
    def test_ring_closes(self):
        g, gt = _ring_graph()
        chi2_before = float(graph_chi2(g))
        poses, chi2, iters = optimize_pose_graph(g, max_iters=20)
        assert float(chi2) < chi2_before * 0.1, (chi2_before, float(chi2))
        # end-point error vs ground truth should shrink dramatically
        err_before = np.linalg.norm(np.asarray(g.poses)[-1][:3, 3] - gt[-1][:3, 3])
        err_after = np.linalg.norm(np.asarray(poses)[-1][:3, 3] - gt[-1][:3, 3])
        assert err_after < err_before * 0.5, (err_before, err_after)
        # gauge: first pose stays fixed
        np.testing.assert_allclose(np.asarray(poses)[0], np.eye(4), atol=1e-3)

    def test_perfect_graph_stays(self):
        g, gt = _ring_graph(noise=0.0)
        poses, chi2, _ = optimize_pose_graph(g)
        assert float(chi2) < 1e-4
        np.testing.assert_allclose(np.asarray(poses), gt, atol=1e-3)

    def test_empty_graph_no_nan(self):
        g = PoseGraph.empty(8, 8)
        poses, chi2, _ = optimize_pose_graph(g)
        assert np.isfinite(np.asarray(poses)).all()


class TestRobustDCS:
    """Robust loop-closure handling (the RRR-class capability): a WRONG loop
    closure must be suppressed by Dynamic Covariance Scaling instead of
    folding the trajectory."""

    def _ring_with_false_lc(self, n=12):
        g, gt = _ring_graph(n=n, noise=0.02, seed=1)
        edges_ij = np.asarray(g.edges_ij).copy()
        rels = np.asarray(g.rel).copy()
        infos = np.asarray(g.info).copy()
        emask = np.asarray(g.emask).copy()
        # false loop closure: claims pose 3 and pose 9 (opposite side of the
        # ring) coincide — a classic perceptual-aliasing failure
        e = int(emask.sum())
        edges_ij[e] = (3, 9)
        rels[e] = np.eye(4)
        infos[e] = np.eye(6) * 1000
        emask[e] = True
        loop_mask = np.zeros(emask.shape[0], bool)
        loop_mask[e - 1] = True  # the true LC added by _ring_graph
        loop_mask[e] = True  # the false LC
        g = PoseGraph(
            poses=g.poses,
            vmask=g.vmask,
            edges_ij=jnp.asarray(edges_ij),
            rel=jnp.asarray(rels),
            info=jnp.asarray(infos),
            emask=jnp.asarray(emask),
        )
        return g, gt, jnp.asarray(loop_mask), e

    def _ate(self, poses, gt):
        return float(
            np.sqrt(
                np.mean(
                    np.sum((np.asarray(poses)[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1)
                )
            )
        )

    def test_dcs_rejects_false_loop_closure(self):
        from rgbd360_tpu.slam.graph import loop_closure_switches

        g, gt, loop_mask, e_false = self._ring_with_false_lc()
        # vanilla LM: the false edge folds the ring
        poses_v, _, _ = optimize_pose_graph(g, max_iters=20)
        ate_v = self._ate(poses_v, gt)
        # DCS: the false edge is switched off, the true one kept
        poses_r, _, _ = optimize_pose_graph(
            g, max_iters=20, loop_mask=loop_mask, dcs_phi=10.0
        )
        ate_r = self._ate(poses_r, gt)
        assert ate_r < 0.2, ate_r
        assert ate_r < ate_v * 0.5, (ate_v, ate_r)

        s = np.asarray(loop_closure_switches(g, poses_r, loop_mask))
        assert s[e_false] < 0.25, s[e_false]  # false LC identified
        assert s[e_false - 1] > 0.8, s[e_false - 1]  # true LC kept
        assert np.all(s[~np.asarray(loop_mask)] == 1.0)  # odometry untouched

    def test_dcs_pcg_matches_dense(self):
        from rgbd360_tpu.slam.graph import optimize_pose_graph_pcg

        g, gt, loop_mask, _ = self._ring_with_false_lc()
        pd, _, _ = optimize_pose_graph(g, max_iters=15, loop_mask=loop_mask)
        pp, _, _ = optimize_pose_graph_pcg(g, max_iters=15, loop_mask=loop_mask)
        assert abs(self._ate(pd, gt) - self._ate(pp, gt)) < 0.05

    def test_dcs_no_false_positives(self):
        """With only consistent edges, DCS must not change the solution."""
        g, gt = _ring_graph(noise=0.02, seed=2)
        loop_mask = jnp.zeros(g.emask.shape[0], bool).at[-1].set(True)
        p0, c0, _ = optimize_pose_graph(g, max_iters=20)
        p1, c1, _ = optimize_pose_graph(g, max_iters=20, loop_mask=loop_mask)
        assert abs(self._ate(p0, gt) - self._ate(p1, gt)) < 0.03


class TestMap:
    def _small_map(self):
        cfg = default_config()
        from dataclasses import replace

        mcfg = replace(cfg.map, max_keyframes=8, max_edges=16)
        m = Map360.empty(mcfg, 32, 64, cfg.seg.max_planes, cfg.seg.hull_dirs)
        return m, cfg

    def test_add_keyframes_edges(self):
        m, cfg = self._small_map()
        gray = jnp.ones((32, 64))
        depth = jnp.full((32, 64), 2.0)
        planes = jax.tree_util.tree_map(lambda a: a[0], m.planes)
        m = m.add_keyframe(jnp.eye(4), gray, depth, planes)
        pose2 = se3.se3_exp(jnp.array([0.5, 0, 0, 0, 0, 0]))
        m = m.add_keyframe(pose2, gray, depth, planes)
        assert int(m.n_kf) == 2
        m = m.add_edge(0, 1, pose2, jnp.eye(6) * 10, sso=0.8)
        assert int(m.n_edges) == 1
        assert float(m.sso[0, 1]) == pytest.approx(0.8)
        assert bool(m.graph.emask[0])

    def test_add_edges_batched_matches_sequential(self):
        """`Map360.add_edges` (ONE update program per batch, the async
        keyframe event's edge slate) must equal per-edge `add_edge`,
        including the SSO mirror, LC flags, and auto-grow past capacity."""
        m, cfg = self._small_map()
        gray = jnp.ones((32, 64))
        depth = jnp.full((32, 64), 2.0)
        planes = jax.tree_util.tree_map(lambda a: a[0], m.planes)
        for i in range(4):
            m = m.add_keyframe(jnp.eye(4), gray, depth, planes, n_live=i)
        rels = [np.asarray(se3.se3_exp(jnp.asarray([0.1 * i, 0, 0, 0, 0, 0])))
                for i in range(1, 4)]
        infos = [np.eye(6) * (10 + i) for i in range(3)]

        seq = m
        for i in range(3):
            seq = seq.add_edge(i, i + 1, jnp.asarray(rels[i]),
                               jnp.asarray(infos[i]), sso=0.1 * i,
                               is_loop=(i == 2), n_live=i)
        bat = m.add_edges(
            jnp.asarray([[0, 1], [1, 2], [2, 3]], jnp.int32),
            jnp.asarray(np.stack(rels)),
            jnp.asarray(np.stack(infos)),
            jnp.asarray([0.0, 0.1, 0.2], jnp.float32),
            jnp.asarray([False, False, True]),
            n_live=0,
        )
        assert int(bat.n_edges) == int(seq.n_edges) == 3
        for name in ("edges_ij", "rel", "info", "emask"):
            np.testing.assert_allclose(
                np.asarray(getattr(bat.graph, name)),
                np.asarray(getattr(seq.graph, name)), atol=1e-7,
            )
        np.testing.assert_allclose(np.asarray(bat.sso), np.asarray(seq.sso))
        np.testing.assert_array_equal(
            np.asarray(bat.edge_is_lc), np.asarray(seq.edge_is_lc)
        )
        # batch overflowing the edge capacity auto-grows like add_edge
        many = 20
        grown = bat.add_edges(
            jnp.zeros((many, 2), jnp.int32),
            jnp.broadcast_to(jnp.eye(4), (many, 4, 4)),
            jnp.broadcast_to(jnp.eye(6), (many, 6, 6)),
            jnp.zeros((many,)),
            jnp.zeros((many,), bool),
            n_live=3,
        )
        assert grown.graph.edges_ij.shape[0] >= 23
        assert int(grown.n_edges) == 23

    def test_save_load_roundtrip(self, tmp_path):
        m, _ = self._small_map()
        gray = jnp.ones((32, 64))
        depth = jnp.full((32, 64), 2.0)
        planes = jax.tree_util.tree_map(lambda a: a[0], m.planes)
        m = m.add_keyframe(jnp.eye(4), gray, depth, planes)
        p = str(tmp_path / "map.npz")
        m.save(p)
        m2 = Map360.load(p, m)
        assert int(m2.n_kf) == 1
        np.testing.assert_allclose(np.asarray(m2.poses), np.asarray(m.poses))

    def test_orbax_checkpoint_roundtrip(self, tmp_path):
        """The map is a registered pytree, so standard Orbax checkpointing
        works on it directly (SURVEY 5.4: map/graph state as an
        Orbax-checkpointable pytree for the distributed runs)."""
        import orbax.checkpoint as ocp

        m, _ = self._small_map()
        gray = jnp.ones((32, 64))
        depth = jnp.full((32, 64), 2.0)
        planes = jax.tree_util.tree_map(lambda a: a[0], m.planes)
        m = m.add_keyframe(jnp.eye(4), gray, depth, planes)
        m = m.add_keyframe(
            jnp.asarray(se3.se3_exp(jnp.array([0.4, 0, 0, 0, 0, 0]))),
            gray,
            depth,
            planes,
        )
        m = m.add_edge(0, 1, jnp.eye(4), jnp.eye(6) * 10, sso=0.5, is_loop=True)

        ckpt = ocp.StandardCheckpointer()
        path = tmp_path / "ckpt"
        ckpt.save(path, m)
        ckpt.wait_until_finished()
        m2 = ckpt.restore(path, m)
        assert int(m2.n_kf) == 2 and int(m2.n_edges) == 1
        assert bool(m2.edge_is_lc[0])
        for a, b in zip(jax.tree_util.tree_leaves(m), jax.tree_util.tree_leaves(m2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTopological:
    def test_two_clusters(self):
        # two tight groups with weak inter-links
        n = 12
        sso = np.zeros((n, n))
        for i in range(6):
            for j in range(6):
                sso[i, j] = 0.9
                sso[i + 6, j + 6] = 0.9
        sso[5, 6] = sso[6, 5] = 0.05
        np.fill_diagonal(sso, 0)
        labels = recursive_spectral_partition(sso, threshold=0.8, min_size=3)
        assert len(set(labels[:6])) == 1
        assert len(set(labels[6:])) == 1
        assert labels[0] != labels[6]

    def test_single_cluster_not_split(self):
        n = 8
        sso = np.full((n, n), 0.9)
        np.fill_diagonal(sso, 0)
        labels = recursive_spectral_partition(sso, threshold=0.8, min_size=3)
        assert len(set(labels)) == 1


class TestAreaDrivenSelection:
    """Topological areas must GATE loop-closure candidate selection
    (reference `LoopClosure360.h:289-366` + `Map360.h:66-76` vSelectedKFs)."""

    def _map_three_areas(self):
        from dataclasses import replace

        cfg = default_config()
        m = Map360.empty(
            replace(cfg.map, max_keyframes=16, max_edges=64),
            4, 8, cfg.seg.max_planes, cfg.seg.hull_dirs,
        )
        # 9 keyframes in a line, three areas of three
        for i in range(9):
            pose = np.eye(4)
            pose[0, 3] = 0.3 * i  # everything within the 5 m radius
            m = m.add_keyframe(
                jnp.asarray(pose),
                jnp.zeros((4, 8)),
                jnp.zeros((4, 8)),
                jax.tree_util.tree_map(lambda a: a[0], m.planes),
                area_id=i // 3,
            )
        # odometry chain => areas (0,1) and (1,2) are neighbors, (0,2) not
        for i in range(8):
            m = m.add_edge(i, i + 1, jnp.eye(4), jnp.eye(6))
        from dataclasses import replace as _r

        # SSO: make kf1 the most co-visible member of area 0
        sso = np.zeros((16, 16), np.float32)
        sso[0, 1] = sso[1, 0] = 0.9
        sso[1, 2] = sso[2, 1] = 0.9
        sso[0, 2] = sso[2, 0] = 0.1
        return _r(m, n_areas=jnp.int32(3), sso=jnp.asarray(sso))

    def test_representatives(self):
        from rgbd360_tpu.slam.topological import representative_keyframes

        m = self._map_three_areas()
        reps = representative_keyframes(m)
        assert reps[0] == 1  # max SSO row sum in area 0

    def test_candidate_gate(self):
        from rgbd360_tpu.slam.loop_closure import candidate_gate

        cfg = default_config()
        m = self._map_three_areas()
        q_pose = np.asarray(m.opt_poses[8])
        gate = candidate_gate(m, q_pose, 8, exclude_recent=2, lc_cfg=cfg.lc)
        # query kf8 is in area 2: same-area kfs 6,7 are excluded by the
        # recency window; neighbor area 1 (kf 3-5) is NOT scanned by LC
        # (covered by the connection search); non-neighbor area 0
        # contributes ONLY its representative, kf1
        assert list(np.where(gate)[0]) == [1]
        # without area gating every keyframe in radius outside the recency
        # window is a candidate
        from dataclasses import replace

        gate2 = candidate_gate(
            m, q_pose, 8, 2, replace(cfg.lc, area_gating=False)
        )
        assert list(np.where(gate2)[0]) == [0, 1, 2, 3, 4, 5]

    def test_unpartitioned_map_degrades_to_radius(self):
        from dataclasses import replace

        from rgbd360_tpu.slam.loop_closure import candidate_gate

        cfg = default_config()
        m = replace(self._map_three_areas(), n_areas=jnp.int32(1))
        gate = candidate_gate(m, np.asarray(m.opt_poses[8]), 8, 2, cfg.lc)
        assert list(np.where(gate)[0]) == [0, 1, 2, 3, 4, 5]


class TestRealSLAM:
    """End-to-end on the two real samples."""

    @pytest.fixture(scope="class")
    def tracker(self, calibration):
        from dataclasses import replace

        from rgbd360_tpu.core.frame import FrameBuilder
        from rgbd360_tpu.slam.odometry import KeyframeSLAM

        cfg = default_config()
        cfg = cfg.replace(map=replace(cfg.map, max_keyframes=16, max_edges=64))
        builder = FrameBuilder(calibration, cfg)
        return KeyframeSLAM(builder, cfg)

    def test_two_frame_slam(self, tracker, sample_paths):
        from rgbd360_tpu.io.bin_format import read_rig_frame

        ev1 = tracker.process(read_rig_frame(sample_paths[0]))
        assert ev1["keyframe"]
        ev2 = tracker.process(read_rig_frame(sample_paths[1]))
        # frame 10 is ~0.32 m away with depth residual ~2.4 -> promoted to KF
        assert ev2["keyframe"], ev2
        assert int(tracker.map.n_kf) == 2
        assert int(tracker.map.n_edges) >= 1
        pose2 = tracker.trajectory[-1]
        dt = np.linalg.norm(pose2[:3, 3])
        assert 0.1 < dt < 0.8, pose2[:3, 3]

    def test_relocalize_against_map(self, tracker, sample_paths):
        from rgbd360_tpu.io.bin_format import read_rig_frame
        from rgbd360_tpu.slam.relocalizer import Relocalizer

        raw = read_rig_frame(sample_paths[1])
        state = tracker.make_state(raw)
        r = Relocalizer(tracker.config).relocalize(tracker.map, state.planes)
        assert r.success
        assert r.kf == 1  # frame 10 IS keyframe 1
        assert np.linalg.norm(np.asarray(r.pose)[:3, 3]) < 0.1


class TestPbMapGraphSLAM:
    def test_two_frames(self, calibration, sample_paths):
        from dataclasses import replace

        from rgbd360_tpu.core.frame import FrameBuilder
        from rgbd360_tpu.io.bin_format import read_rig_frame
        from rgbd360_tpu.slam.pbmap_slam import PbMapGraphSLAM

        cfg = default_config()
        cfg = cfg.replace(map=replace(cfg.map, max_keyframes=16, max_edges=64))
        builder = FrameBuilder(calibration, cfg)
        slam = PbMapGraphSLAM(builder, cfg)
        ev1 = slam.process(read_rig_frame(sample_paths[0]))
        assert ev1["keyframe"]
        ev2 = slam.process(read_rig_frame(sample_paths[1]))
        assert ev2["tracked"], ev2
        assert int(slam.map.n_kf) == 2
        pose2 = slam.trajectory[-1]
        dt = np.linalg.norm(pose2[:3, 3])
        assert 0.1 < dt < 0.8, pose2[:3, 3]
        # the driver's LC/optimize runs through the deferred engine — a
        # flush must leave no pending event work (VERDICT r4 #5)
        slam.flush()
        assert not slam._pending

    def test_pbmap_async_matches_sync(self, calibration):
        """The SphereGraphSLAM driver's deferred keyframe event (LC search +
        optimize + partition through the shared engine) must reproduce the
        synchronous driver's map: same keyframes, same loop closures, poses
        within 2 cm (the KeyframeSLAM equivalence bar)."""
        from dataclasses import replace

        from rgbd360_tpu.core.frame import FrameBuilder
        from rgbd360_tpu.io.bin_format import read_rig_frame
        from rgbd360_tpu.ops import se3
        from rgbd360_tpu.slam.pbmap_slam import PbMapGraphSLAM

        from helpers import render_sphere_from

        cfg0 = default_config()
        builder = FrameBuilder(calibration, cfg0)
        base = builder.build_from_raw(
            read_rig_frame("/root/reference/samples/sphere_images_1.bin")
        )
        side = 0.3
        waypoints = [
            (0.0, 0.0), (side, 0.0), (2 * side, 0.0), (2 * side, side),
            (2 * side, 2 * side), (side, 2 * side), (0.0, 2 * side),
            (0.0, side), (0.0, 0.02),
        ]
        frames = []
        for i, (x, z) in enumerate(waypoints):
            pose = np.eye(4)
            pose[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0.0, 0.015 * i, 0.0])))
            pose[:3, 3] = (x, 0.0, z)
            frames.append(render_sphere_from(base.sphere_gray, base.sphere_depth, pose))

        results = {}
        for mode in (False, True):
            cfg = cfg0.replace(
                map=replace(cfg0.map, max_keyframes=16, max_edges=64),
                kf=replace(cfg0.kf, async_kf_events=mode),
            )
            slam = PbMapGraphSLAM(builder, cfg)
            for g, d in frames:
                slam.process_state(slam.make_state_from_sphere(g, d))
            slam.flush()
            results[mode] = (
                int(slam.map.n_kf),
                slam.n_loop_closures,
                np.asarray(slam.map.opt_poses)[: int(slam.map.n_kf)],
            )
        n_sync, lc_sync, p_sync = results[False]
        n_async, lc_async, p_async = results[True]
        assert n_async == n_sync
        # This driver promotes EVERY tracked frame (SphereGraphSLAM
        # semantics), so a deferred event's optimization can land after the
        # next frame already tracked on uncorrected poses — the exact
        # staleness the reference's background thread exhibits
        # (`SLAM/SphereGraphSLAM.cpp:251-271` applies LC edges
        # opportunistically).  The scan itself is snapshot-exact
        # (`scan_dispatch` caps), so the async pipeline must still CLOSE
        # the loop and converge to the same map within solver tolerance;
        # candidate-for-candidate LC-count equality is only achievable when
        # events complete between keyframes (the KeyframeSLAM equivalence
        # test covers that schedule).
        assert lc_sync >= 1, "sync driver failed to close the loop"
        assert lc_async >= 1, "deferred driver failed to close the loop"
        err = np.linalg.norm(p_async[:, :3, 3] - p_sync[:, :3, 3], axis=1)
        assert err.max() < 0.02, err


class TestPCGGraph:
    """Matrix-free PCG pose-graph solver vs the dense reference path."""

    def test_matches_dense(self):
        from rgbd360_tpu.slam.graph import (
            optimize_pose_graph,
            optimize_pose_graph_pcg,
        )

        g, gt = _ring_graph(n=16)
        pd, c2d, _ = optimize_pose_graph(g, max_iters=15)
        pp, c2p, _ = optimize_pose_graph_pcg(g, max_iters=15)
        np.testing.assert_allclose(float(c2p), float(c2d), rtol=0.05)
        np.testing.assert_allclose(np.asarray(pp), np.asarray(pd), atol=5e-3)

    def test_large_graph_converges(self):
        # 512-KF ring + random loop-closure chords, noisy initial poses:
        # the shape of a real SLAM graph (chords keep the graph diameter
        # small, which is what lets Jacobi-PCG converge in ~100 iterations;
        # a pure 512-ring would need ~diameter CG steps).
        import jax.numpy as jnp
        from rgbd360_tpu.slam.graph import (
            PoseGraph,
            graph_chi2,
            optimize_pose_graph_pcg,
        )

        n = 512  # beyond the comfortable dense range on CPU test hardware
        rng = np.random.default_rng(0)
        edges = [(i, (i + 1) % n) for i in range(n)]
        edges += [
            (int(rng.integers(n)), int(rng.integers(n))) for _ in range(n)
        ]
        edges = [(i, j) for i, j in edges if i != j]
        while len(edges) % 8:
            edges.append((0, 1))
        e_n = len(edges)

        def ring_pose(i):
            th = 2 * np.pi * i / n
            c, s = np.cos(th), np.sin(th)
            return np.array(
                [[c, -s, 0, c], [s, c, 0, s], [0, 0, 1, 0], [0, 0, 0, 1.0]]
            )

        gt = np.stack([ring_pose(i) for i in range(n)])
        rel = np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in edges])
        noisy = jnp.asarray(gt + rng.normal(0, 0.05, gt.shape))
        noisy = noisy.at[:, 3, :].set(jnp.array([0, 0, 0, 1.0]))
        g = PoseGraph(
            poses=noisy,
            vmask=jnp.ones((n,), bool),
            edges_ij=jnp.asarray(np.array(edges), jnp.int32),
            rel=jnp.asarray(rel, jnp.float32),
            info=PoseGraph.empty(n, e_n).info,
            emask=jnp.ones((e_n,), bool),
        )
        chi2_0 = float(graph_chi2(g))
        poses, chi2, iters = optimize_pose_graph_pcg(g, max_iters=10)
        assert np.isfinite(np.asarray(poses)).all()
        assert float(chi2) < 0.1 * chi2_0, (float(chi2), chi2_0)


def test_lc_salient_verify_wiring():
    """verify_salient_pixels > 0 must give the LC verify aligner the
    salient budget AND the mandatory dense polish (measured: thinned
    sweeps without polish lose borderline closures at the depth gate —
    see LoopClosureConfig.verify_salient_pixels)."""
    from dataclasses import replace

    from rgbd360_tpu.slam.loop_closure import LoopCloser

    cfg = default_config()
    # default ON since round 4 (keyframe-event device time), polish forced
    lc = LoopCloser(cfg)
    assert cfg.lc.verify_salient_pixels == 16384
    assert lc._aligner.cfg.salient_pixels == 16384
    assert lc._aligner.cfg.polish_iters >= 2
    # 0 restores full sweeps (the gate-calibration configuration)
    lc_full = LoopCloser(cfg.replace(lc=replace(cfg.lc, verify_salient_pixels=0)))
    assert lc_full._aligner.cfg.salient_pixels == cfg.dense.salient_pixels
