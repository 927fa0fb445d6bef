"""Tests: occlusion-aware dense modes, metrics, trace, graph backend, labels."""

import numpy as np
import pytest

import jax.numpy as jnp

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import se3


class TestOcclusionModes:
    @pytest.fixture(scope="class")
    def pyrs(self, calibration, sample_paths):
        from rgbd360_tpu.core.frame import FrameBuilder
        from rgbd360_tpu.io.bin_format import read_rig_frame
        from rgbd360_tpu.registration import dense as D

        b = FrameBuilder(calibration)
        cfg = DenseRegConfig()
        out = []
        for p in sample_paths[:2]:
            f = b.build_from_raw(read_rig_frame(p))
            out.append(D.build_frame_pyramid(f.sphere_gray, f.sphere_depth, cfg))
        return out

    @pytest.mark.parametrize("occ", [1, 2])
    def test_occlusion_agrees_with_plain(self, pyrs, occ):
        from rgbd360_tpu.registration import dense as D

        al = D.DenseAligner(DenseRegConfig())
        r0 = al.align(pyrs[0], pyrs[1], method=D.PHOTO_DEPTH)
        r = al.align(pyrs[0], pyrs[1], method=D.PHOTO_DEPTH, occlusion=occ)
        assert not bool(r.ill_posed)
        d = np.asarray(se3.se3_log(se3.se3_inverse(r.pose) @ r0.pose))
        # occlusion handling shifts the optimum slightly, not wildly
        assert np.linalg.norm(d[:3]) < 0.08, d
        assert np.linalg.norm(d[3:]) < 0.05, d


class TestMetrics:
    def test_entropy_monotonic(self):
        from rgbd360_tpu.utils.metrics import entropy

        low_info = jnp.eye(6) * 1.0
        high_info = jnp.eye(6) * 1000.0
        assert float(entropy(high_info)) < float(entropy(low_info))

    def test_tracking_score(self):
        from rgbd360_tpu.utils import metrics as M

        assert M.tracking_score(8, 10) == M.GOOD
        assert M.tracking_score(4, 10) == M.WEAK
        assert M.tracking_score(1, 10) == M.BAD

    def test_rpe(self):
        from rgbd360_tpu.utils.metrics import rpe

        n = 10
        gt = np.stack([np.eye(4)] * n)
        for i in range(n):
            gt[i][:3, 3] = [0, 0.1 * i, 0]
        est = gt.copy()
        est[:, 1, 3] += np.linspace(0, 0.05, n)  # growing drift
        t_err, r_err = rpe(est, gt)
        assert 0 < t_err < 0.02
        assert r_err < 1e-6


class TestTrace:
    def test_stage_timer(self):
        import time

        from rgbd360_tpu.utils.trace import StageTimer

        t = StageTimer()
        with t.region("stitch"):
            time.sleep(0.01)
        with t.region("stitch"):
            time.sleep(0.01)
        rep = t.report()
        assert "stitch" in rep
        assert t.counts["stitch"] == 2
        assert t.times["stitch"] >= 0.02


class TestGraphBackend:
    def test_incremental_api(self, tmp_path):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        g = GraphOptimizerBackend(max_vertices=8, max_edges=8)
        p0 = np.eye(4)
        step = np.asarray(se3.se3_exp(jnp.array([1.0, 0, 0, 0, 0, 0])))
        g.add_vertex(p0)
        g.add_vertex(p0)  # wrong initial guess for vertex 1
        g.add_edge(0, 1, step, np.eye(6) * 100)
        chi2, iters = g.optimize()
        poses = g.get_poses()
        np.testing.assert_allclose(poses[1][:3, 3], [1, 0, 0], atol=1e-2)
        g.save_graph(str(tmp_path / "g.txt"))
        text = (tmp_path / "g.txt").read_text()
        assert "VERTEX_SE3 0" in text and "EDGE_SE3 0 1" in text

    def test_unknown_backend(self):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        with pytest.raises(ValueError):
            GraphOptimizerBackend(backend="ceres")


class TestLabels:
    def test_store_roundtrip(self, tmp_path):
        from rgbd360_tpu.slam.labeling import LabelStore

        st = LabelStore(capacity=8)
        st.set_label(0, 2, "wall")
        st.set_label(0, 3, "table", "object")
        st.propagate(0, 1, np.array([[2, 5], [3, 1], [-1, -1]]))
        assert st.get_label(1, 5) == "wall"
        assert st.get_label(1, 1, "object") == "table"
        p = str(tmp_path / "labels.json")
        st.save(p)
        st2 = LabelStore.load(p)
        assert st2.get_label(1, 5) == "wall"


class TestReviewRegressions:
    """Regressions for the round-1 code-review findings."""

    def test_undistort_accepts_raw_units(self, calibration):
        from rgbd360_tpu.core.frame import FrameBuilder, RigFrame
        from rgbd360_tpu.io.bin_format import read_rig_frame

        b = FrameBuilder(calibration)
        raw = read_rig_frame("/root/reference/samples/sphere_images_1.bin")
        out = b.undistort(RigFrame.from_raw(raw))  # u16 mm input
        d = np.asarray(out.depth)
        assert d.dtype == np.float32
        m = d > 0
        assert 0.3 < np.median(d[m]) < 10.0  # meters, not millimeters

    def test_map_capacity_auto_grows(self):
        """Exhausting the fixed capacity doubles it (SURVEY section 7:
        geometric capacity bumps, one re-jit per bump) with every live
        keyframe, edge, and SSO entry preserved."""
        from dataclasses import replace

        from rgbd360_tpu.config import default_config
        from rgbd360_tpu.slam.map import Map360

        cfg = default_config()
        m = Map360.empty(
            replace(cfg.map, max_keyframes=2, max_edges=2), 8, 16,
            cfg.seg.max_planes, cfg.seg.hull_dirs,
        )
        import jax

        planes = jax.tree_util.tree_map(lambda a: a[0], m.planes)
        g = jnp.zeros((8, 16))
        for i in range(3):
            pose = jnp.eye(4).at[0, 3].set(float(i))
            m = m.add_keyframe(pose, g + i, g, planes)
        assert int(m.n_kf) == 3
        assert m.poses.shape[0] == 4  # doubled from 2
        for i in range(3):
            assert float(m.poses[i, 0, 3]) == float(i)  # contents preserved
            assert float(m.gray[i, 0, 0]) == float(i)
        m = m.add_edge(0, 1, jnp.eye(4), jnp.eye(6), sso=0.5)
        m = m.add_edge(1, 2, jnp.eye(4), jnp.eye(6), sso=0.25)
        m = m.add_edge(0, 2, jnp.eye(4), jnp.eye(6), sso=0.75, is_loop=True)
        assert int(m.n_edges) == 3
        assert m.graph.edges_ij.shape[0] == 4  # doubled from 2
        assert float(m.sso[0, 1]) == 0.5 and float(m.sso[0, 2]) == 0.75
        assert bool(m.edge_is_lc[2]) and not bool(m.edge_is_lc[0])

    def test_quaternion_180_degrees(self, tmp_path):
        from rgbd360_tpu.apps._common import rotation_to_quaternion

        r = np.diag([1.0, -1.0, -1.0])  # 180 deg about x
        q = rotation_to_quaternion(r)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
        np.testing.assert_allclose(np.abs(q), [0, 1, 0, 0], atol=1e-9)

    def test_dataset_error_propagates(self, tmp_path):
        import pathlib

        from rgbd360_tpu.io.dataset import SequenceDataset

        good = pathlib.Path("/root/reference/samples/sphere_images_1.bin")
        (tmp_path / "sphere_images_1.bin").write_bytes(good.read_bytes())
        (tmp_path / "sphere_images_2.bin").write_bytes(b"garbage" * 100)
        ds = SequenceDataset(tmp_path)
        with pytest.raises(ValueError):
            list(ds)


def test_matcher_config_from_reference_ini():
    """The reference's configLocaliser INI files load directly; values match
    `config_files/configLocaliser_sphericalOdometry.ini:9-36`."""
    from rgbd360_tpu.config import MatcherConfig

    cfg = MatcherConfig.from_ini(
        "/root/reference/config_files/configLocaliser_sphericalOdometry.ini"
    )
    assert cfg.min_planes_recognition == 3
    assert cfg.unary_dist_d == 0.5
    assert cfg.unary_angle_deg == 50.0
    assert cfg.hue_threshold == 0.35
    assert cfg.binary_dist_threshold == 3.0
    assert cfg.binary_angle_threshold_deg == 10.0
    assert cfg.height_threshold == 0.33
    assert cfg.cos_normal_threshold == 0.985
    # the other bundled INI parses too
    cfg2 = MatcherConfig.from_ini(
        "/root/reference/config_files/configLocaliser_spherical.ini"
    )
    assert cfg2.min_planes_recognition >= 1
