"""Tests: occlusion-aware dense modes, metrics, trace, graph backend, labels."""

import json

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
        assert "VERTEX_SE3:QUAT 0" in text and "EDGE_SE3:QUAT 0 1" in text
        assert "FIX 0" in text

    def test_unknown_backend(self):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        with pytest.raises(ValueError):
            GraphOptimizerBackend(backend="ceres")


class TestG2OCodec:
    """Pin the g2o text interchange codec (`write_g2o`/`read_g2o`) added for
    `GraphOptimizer::saveGraph` parity (reference `GraphOptimizer.h:273`,
    which delegates to g2o's own `optimizer.save()`)."""

    def _build(self, tmp_path):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        g = GraphOptimizerBackend(max_vertices=8, max_edges=8)
        rng = np.random.default_rng(3)
        poses = [np.eye(4)]
        for k in range(3):
            xi = jnp.asarray(rng.normal(size=6) * 0.2)
            poses.append(poses[-1] @ np.asarray(se3.se3_exp(xi)))
        for p in poses:
            g.add_vertex(p)
        for i in range(3):
            rel = np.linalg.inv(poses[i]) @ poses[i + 1]
            g.add_edge(i, i + 1, rel, np.diag(rng.uniform(50, 150, 6)))
        g.add_edge(0, 3, np.linalg.inv(poses[0]) @ poses[3], np.eye(6) * 80)
        return g

    def test_save_load_optimize_roundtrip(self, tmp_path):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        g = self._build(tmp_path)
        p = str(tmp_path / "g.g2o")
        g.save_graph(p)

        g2 = GraphOptimizerBackend(max_vertices=8, max_edges=8)
        g2.load_graph(p)
        assert g2.n_vertices == g.n_vertices and g2.n_edges == g.n_edges
        np.testing.assert_allclose(g2.get_poses(), g.get_poses(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g2.graph.info[: g2.n_edges]),
            np.asarray(g.graph.info[: g.n_edges]),
            atol=1e-5,
        )
        # The reloaded graph must optimize just like the original.
        chi2_a, _ = g.optimize()
        chi2_b, _ = g2.optimize()
        np.testing.assert_allclose(chi2_b, chi2_a, atol=1e-6)
        np.testing.assert_allclose(g2.get_poses(), g.get_poses(), atol=1e-5)

    def test_canonical_dialect_fixture(self, tmp_path):
        """Hand-authored file in the genuine g2o dialect: pins the
        qx-qy-qz-qw component order and the row-major upper-triangle
        information layout (g2o `VertexSE3::read` / `EdgeSE3::read`)."""
        from rgbd360_tpu.slam.graph_backend import read_g2o

        s2 = 0.7071067811865476  # sin/cos 45 deg
        upper = " ".join(str(float(v)) for v in range(1, 22))
        p = tmp_path / "fixture.g2o"
        p.write_text(
            "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
            # +90 deg about z: qx qy qz qw = 0 0 s2 s2 (qw LAST in g2o)
            f"VERTEX_SE3:QUAT 1 1 2 3 0 0 {s2} {s2}\n"
            "FIX 0\n"
            f"EDGE_SE3:QUAT 0 1 1 2 3 0 0 {s2} {s2} {upper}\n"
        )
        poses, edges, rels, infos, fixed = read_g2o(str(p))
        assert fixed == (0,)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-12)
        # qz=s2, qw=s2 is a +90deg yaw — NOT +90deg roll (qx) — so a reader
        # that confuses wxyz/xyzw order fails here.
        expect_R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(poses[1][:3, :3], expect_R, atol=1e-9)
        np.testing.assert_allclose(poses[1][:3, 3], [1, 2, 3], atol=1e-12)
        np.testing.assert_allclose(rels[0][:3, :3], expect_R, atol=1e-9)
        assert edges.tolist() == [[0, 1]]
        # Row-major upper triangle: row 0 is 1..6, info[1,1]=7, info[5,5]=21.
        info = infos[0]
        np.testing.assert_allclose(info[0], [1, 2, 3, 4, 5, 6], atol=0)
        assert info[1, 1] == 7.0 and info[5, 5] == 21.0
        np.testing.assert_allclose(info, info.T, atol=0)  # symmetrized

    def test_writer_emits_canonical_dialect(self, tmp_path):
        """write_g2o's own bytes parse under the fixture's conventions."""
        from rgbd360_tpu.slam.graph_backend import write_g2o

        yaw90 = np.eye(4)
        yaw90[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        yaw90[:3, 3] = [1, 2, 3]
        info = np.arange(36, dtype=np.float64).reshape(6, 6)
        info = (info + info.T) / 2
        p = tmp_path / "w.g2o"
        write_g2o(str(p), [np.eye(4), yaw90], [(0, 1)], [yaw90], [info], fixed=(0,))
        lines = p.read_text().splitlines()
        v1 = lines[1].split()
        assert v1[0] == "VERTEX_SE3:QUAT" and v1[1] == "1"
        # x y z then qx qy qz qw: yaw-90 has qx=qy=0, qz=qw=s2.
        vals = [float(x) for x in v1[2:]]
        np.testing.assert_allclose(vals[:3], [1, 2, 3], atol=1e-9)
        np.testing.assert_allclose(vals[3:5], [0, 0], atol=1e-9)
        np.testing.assert_allclose(vals[5:], [0.70710678, 0.70710678], atol=1e-7)
        e = lines[3].split()
        assert e[0] == "EDGE_SE3:QUAT"
        tri = [float(x) for x in e[10:]]
        assert len(tri) == 21
        # row-major upper triangle of `info`
        expect = [info[r, c] for r in range(6) for c in range(r, 6)]
        np.testing.assert_allclose(tri, expect, atol=1e-6)

    def test_malformed_rows_raise(self, tmp_path):
        from rgbd360_tpu.slam.graph_backend import read_g2o

        bad_tag = tmp_path / "a.g2o"
        bad_tag.write_text("VERTEX_SE2 0 0 0 0\n")
        with pytest.raises(ValueError, match="unsupported g2o row"):
            read_g2o(str(bad_tag))

        short_info = tmp_path / "b.g2o"
        short_info.write_text(
            "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
            "VERTEX_SE3:QUAT 1 0 0 0 0 0 0 1\n"
            "EDGE_SE3:QUAT 0 1 0 0 0 0 0 0 1 1 2 3\n"
        )
        with pytest.raises(ValueError, match="21 information"):
            read_g2o(str(short_info))

    def test_load_capacity_overflow(self, tmp_path):
        from rgbd360_tpu.slam.graph_backend import GraphOptimizerBackend

        g = self._build(tmp_path)
        p = str(tmp_path / "g.g2o")
        g.save_graph(p)
        tiny = GraphOptimizerBackend(max_vertices=2, max_edges=2)
        with pytest.raises(ValueError, match="capacity"):
            tiny.load_graph(p)


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


def test_bench_stdout_line_is_compact_json():
    """The driver records only the last ~2000 chars of bench output; round
    3's 4.6 kB stdout line overflowed that window (`BENCH_r03.json
    parsed: null`).  Pin that the emitted line json-parses and stays under
    the budget even with a worst-case-size stage table."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    stages = {}
    for i in range(14):  # more stages than the real bench emits
        stages[f"stage_with_a_long_name_{i:02d}"] = {
            "value": 1234.567,
            "unit": "frames/sec/chip (build+segment+pyramid+align)",
            "attribution": "x" * 600,  # prose must NOT reach stdout
            "bound": {
                "resource": "gather-row latency",
                "peak": "y" * 200,
                "floor_ms": 7.716,
                "achieved_fraction": 0.5619,
            },
            "dispatches_per_tracked_frame": 1,
            "median_tracked_ms": 53.79,
            "median_keyframe_ms": 2761.28,
            "tracked_fps_net_of_tunnel": 61.26,
            "tunnel_roundtrip_ms": 37.46,
        }
    summary = {
        "metric": "registration_pipeline_fps",
        "value": 497.181,
        "unit": "frames/sec/chip",
        "vs_baseline": 243.716,
        "chip_utilization": 0.7637,
        "stages": stages,
    }
    line = bench.compact_line(summary)
    assert len(line) <= 1500
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "registration_pipeline_fps"
    assert parsed["value"] == 497.181
    assert "attribution" not in json.dumps(parsed)  # numbers only, no prose
