"""End-to-end SLAM on a synthetic spherical sequence rendered from real data.

Establishes the ATE metric from BASELINE.md: frames are rendered along a
known trajectory from real sample geometry, the keyframe SLAM runs on them,
and the recovered trajectory must match ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import ate_rmse, render_sphere_from, synth_trajectory


@pytest.fixture(scope="module")
def seq(calibration, sample_paths):
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    builder = FrameBuilder(calibration)
    f = builder.build_from_raw(read_rig_frame(sample_paths[0]))
    gt = synth_trajectory(6, step=0.12, yaw_step=0.03)
    frames = []
    for pose in gt:
        g, d = render_sphere_from(f.sphere_gray, f.sphere_depth, pose)
        frames.append((g, d))
    return builder, frames, gt


def test_frame_to_frame_odometry_ate(seq):
    from rgbd360_tpu.slam.odometry import FrameToFrameOdometry

    builder, frames, gt = seq
    odo = FrameToFrameOdometry(builder)
    for g, d in frames:
        odo.process_state(odo.make_state_from_sphere(g, d))
    est = np.stack(odo.trajectory)
    ate = ate_rmse(est, gt)
    assert ate < 0.05, f"ATE {ate:.3f} m over {len(frames)} frames"


def test_keyframe_slam_closes_loop(seq):
    """A square walk returning to the start must fire at least one loop
    closure through the LoopCloser (distance-gated plane match + dense
    verification) and trigger robust pose-graph optimization, keeping the
    trajectory at GT-level accuracy."""
    from dataclasses import replace

    import jax.numpy as jnp

    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.ops import se3
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    builder, _, _ = seq
    # render a closed square loop from the real sample geometry
    import jax

    from rgbd360_tpu.core.frame import FrameBuilder  # noqa: F401

    f0 = None
    # base frame for rendering: reuse builder on sample 1 via the fixture's
    # first rendered frame inputs (identity pose)
    from rgbd360_tpu.io.bin_format import read_rig_frame

    base = builder.build_from_raw(
        read_rig_frame("/root/reference/samples/sphere_images_1.bin")
    )
    side = 0.3
    waypoints = [
        (0.0, 0.0), (side, 0.0), (2 * side, 0.0),
        (2 * side, side), (2 * side, 2 * side),
        (side, 2 * side), (0.0, 2 * side),
        (0.0, side), (0.0, 0.02),  # back next to the start
    ]
    gt = []
    for i, (x, z) in enumerate(waypoints):
        pose = np.eye(4)
        pose[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0.0, 0.015 * i, 0.0])))
        pose[:3, 3] = (x, 0.0, z)
        gt.append(pose)
    gt = np.stack(gt)
    frames = [
        render_sphere_from(base.sphere_gray, base.sphere_depth, p) for p in gt
    ]

    cfg = default_config()
    cfg = cfg.replace(
        map=replace(cfg.map, max_keyframes=16, max_edges=64),
        kf=replace(cfg.kf, select_kf_icp_dist=0.35),
    )
    slam = KeyframeSLAM(builder, cfg)
    for g, d in frames:
        slam.process_state(slam.make_state_from_sphere(g, d))
    slam.flush()  # apply the deferred keyframe events (join the LC "thread")

    est = np.stack(slam.trajectory)
    ate = ate_rmse(est, gt)
    assert int(slam.map.n_kf) >= 5, int(slam.map.n_kf)
    assert slam.n_loop_closures >= 1, "no loop closure fired on a closed loop"
    assert bool(jnp.any(slam.map.edge_is_lc)), "LC edge not marked robust"
    assert ate < 0.08, f"ATE {ate:.3f} m around the loop"
    # optimized trajectory: frames re-anchored to corrected keyframes —
    # same length, never materially worse than the raw trajectory
    opt = slam.optimized_trajectory()
    assert opt.shape == est.shape
    ate_opt = ate_rmse(opt, gt)
    assert ate_opt < ate + 0.02, (ate_opt, ate)


def test_keyframe_slam_checkpoint_resume(seq, tmp_path):
    """Interrupt a run mid-sequence, resume into a FRESH tracker from the
    checkpoint, and finish: the resumed trajectory must match the
    uninterrupted run (checkpoint-restart, SURVEY 5.4)."""
    from dataclasses import replace

    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    builder, frames, gt = seq
    cfg = default_config()
    cfg = cfg.replace(
        map=replace(cfg.map, max_keyframes=16, max_edges=64),
        kf=replace(cfg.kf, select_kf_icp_dist=0.35),
    )

    ref = KeyframeSLAM(builder, cfg)
    for g, d in frames:
        ref.process_state(ref.make_state_from_sphere(g, d))

    a = KeyframeSLAM(builder, cfg)
    cut = 3
    for g, d in frames[:cut]:
        a.process_state(a.make_state_from_sphere(g, d))
    ckpt = str(tmp_path / "session.npz")
    a.save_checkpoint(ckpt)

    b = KeyframeSLAM(builder, cfg)
    b.resume_from_checkpoint(ckpt)
    assert b.current_kf == a.current_kf
    for g, d in frames[cut:]:
        b.process_state(b.make_state_from_sphere(g, d))

    est_ref = np.stack(ref.trajectory)
    est_res = np.stack(b.trajectory)
    assert est_res.shape == est_ref.shape
    assert int(b.map.n_kf) == int(ref.map.n_kf)
    # bfloat16 map payload round-trips losslessly; trajectories agree to mm
    np.testing.assert_allclose(
        est_res[:, :3, 3], est_ref[:, :3, 3], atol=2e-3
    )


def test_keyframe_slam_ate(seq):
    from dataclasses import replace

    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    builder, frames, gt = seq
    cfg = default_config()
    cfg = cfg.replace(
        map=replace(cfg.map, max_keyframes=16, max_edges=64),
        kf=replace(cfg.kf, select_kf_icp_dist=0.35),  # force several KFs
    )
    slam = KeyframeSLAM(builder, cfg)
    for g, d in frames:
        slam.process_state(slam.make_state_from_sphere(g, d))
    est = np.stack(slam.trajectory)
    ate = ate_rmse(est, gt)
    n_kf = int(slam.map.n_kf)
    assert n_kf >= 2, n_kf
    assert ate < 0.08, f"ATE {ate:.3f} m with {n_kf} keyframes"


def test_octagon_loop_raw_pipeline_ate(calibration, tmp_path):
    """Full-stack integration on RAW synthetic rig captures: a closed loop
    inside an octagonal room (`apps/grabber.py synth --trajectory loop
    --room octagon`) through the complete pipeline — bin round-trip, stitch,
    plane segmentation, PbMap seeding, motion-model dense tracking,
    rotation-triggered keyframe promotion, neighbor connections, pose-graph
    optimization.  Guards the step-based motion-continuity semantics (a
    KF-relative rotation past `max_rotation_odometry` must NOT be rejected)
    and the constant-velocity seed chain: with either broken, this loop's
    ATE blows past 1.5 m."""
    from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.io.bin_format import write_rig_frame
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.io.dataset import SequenceDataset
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    # extrinsics only: CLAMS models describe real-device distortion and
    # would corrupt the exact synthetic depth
    calib = load_calibration("/root/reference/Calibration/Extrinsics", None)
    rt = np.asarray(calib.rt, np.float64)
    n = 16
    gt = synth_trajectory_poses("loop", n, radius=0.8)
    for i in range(n):
        raw = synth_capture(i, rt=rt, pose=gt[i], room="octagon")
        write_rig_frame(tmp_path / f"sphere_images_{i + 1}.bin", raw)

    cfg = default_config()
    from rgbd360_tpu.core.frame import FrameBuilder

    builder = FrameBuilder(calib, cfg)
    slam = KeyframeSLAM(builder, cfg)
    ds = SequenceDataset(tmp_path)
    for i in range(len(ds)):
        slam.process(ds[i])

    est = np.stack(slam.trajectory)
    ate = ate_rmse(est, gt)
    from rgbd360_tpu.utils.metrics import rpe

    rpe_t, rpe_r = rpe(est, gt)
    assert int(slam.map.n_kf) >= 4, int(slam.map.n_kf)
    assert ate < 0.15, f"ATE {ate:.3f} m around the octagon loop"
    assert rpe_r < 0.05, f"RPE rot {rpe_r:.3f} rad"


def test_kidnapped_robot_relocalizes(calibration):
    """Teleport mid-sequence in a self-similar room: tracking must go LOST
    (step continuity), the plane-only relocalization hypothesis is heading-
    aliased and must be REJECTED by the dense+photometric verification,
    and the multi-hypothesis coarse-alignment rescue must recover the true
    pose (reference `Relocalizer360.h:82-83` accepts the aliased match)."""
    from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    calib = load_calibration("/root/reference/Calibration/Extrinsics", None)
    rt = np.asarray(calib.rt, np.float64)
    gt = synth_trajectory_poses("loop", 24, radius=0.8)
    cfg = default_config()
    slam = KeyframeSLAM(FrameBuilder(calib, cfg), cfg)
    order = list(range(10)) + list(range(18, 22))  # teleport after frame 10
    events, errs = [], []
    for i in order:
        ev = slam.process(synth_capture(i, rt=rt, pose=gt[i], room="octagon"))
        events.append(ev)
        errs.append(
            float(np.linalg.norm(slam.trajectory[-1][:3, 3] - gt[i][:3, 3]))
        )
    assert events[10].get("lost", False), "teleport not detected as lost"
    assert any(e.get("relocalized") for e in events[10:]), "never relocalized"
    k = next(j for j in range(10, len(events)) if events[j].get("relocalized"))
    assert errs[k] < 0.15, f"relocalized to a wrong pose: {errs[k]:.3f} m off"
    assert errs[-1] < 0.15, f"post-relocalization tracking lost: {errs[-1]:.3f}"


def test_soak_long_horizon(calibration, tmp_path):
    """Long-horizon soak (VERDICT r1 #2): ~180 frames / 50+ keyframes in ONE
    run at half resolution, forcing every map-scale mechanism the fixed-
    capacity design was built for:

      * Map360 capacity auto-grow at least twice (start capacity 16),
      * >= 2 genuine loop closures plus >= 3 revisit constraints (each
        clover petal's return re-enters the origin's area),
      * one tracking loss (3-frame sensor dropout) followed by
        relocalization in mapped space,
      * checkpoint + resume into a FRESH tracker mid-run,
      * PCG engagement once capacity crosses graph.pcg_threshold_kf,
      * periodic re-partitioning (every 4 KFs) feeding area-driven selection,

    and asserts the final ATE plus that steady-state per-frame wall time does
    not degrade as the map grows (area gating keeps per-frame work bounded).
    """
    import time
    from dataclasses import replace

    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.ops import se3 as se3_ops
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    # ---- half-resolution configuration (same pipeline, 4x faster on CPU).
    # select_kf_icp_dist drops so keyframes come every ~2-3 frames; the LC
    # matched-area gate scales down with the halved segmentation resolution
    # (revisit matches measure ~15 m^2 here vs >25 at full res); the LC
    # depth gate widens to 3.0 sigma because half-res splat renders plus the
    # map's bfloat16 keyframe payload put wide-baseline verify residuals at
    # ~2.5 sigma even for CORRECT poses (measured; full-res tests keep the
    # reference 2.0 gate).
    cfg = default_config()
    cfg = cfg.replace(
        sphere=replace(cfg.sphere, width=960, height=160),
        map=replace(cfg.map, max_keyframes=16, max_edges=32),
        kf=replace(cfg.kf, select_kf_icp_dist=0.25),
        lc=replace(cfg.lc, min_area=10.0, max_depth_residual=3.0),
        # half-res segmentation yields ~5 planes/frame, so the reference's
        # 5-match relocalization gate demands a PERFECT match (measured:
        # a flipped revisit matches 4/5); the plane-count gate scales down
        # with resolution like the area gates, and every reloc hypothesis
        # is dense-verified before acceptance anyway.
        reloc=replace(cfg.reloc, min_matches=4),
        graph=replace(cfg.graph, pcg_threshold_kf=48),
    )
    builder = FrameBuilder(calibration, cfg)
    full = FrameBuilder(calibration).build_from_raw(
        read_rig_frame("/root/reference/samples/sphere_images_1.bin")
    )
    base_gray = full.sphere_gray[::2, ::2]
    base_depth = full.sphere_depth[::2, ::2]

    # ---- ground truth: a three-petal clover — each petal leaves the origin
    # ~2.2 m (past the 2.5 m connection radius from most of the map, and far
    # enough that the chain partitions into several areas), loops sideways,
    # and returns; each RETURN re-enters the origin's area from a
    # NON-neighbor area, which is exactly the event the loop-closure search
    # fires on (first contact; later constraints between now-neighbor areas
    # arrive as connections, reference semantics).  After the clover, a
    # 3-frame SENSOR DROPOUT (all-invalid depth — the realistic loss mode
    # this pipeline can detect unambiguously: the solve goes ill-posed, no
    # threshold involved; a pure teleport is NOT detectable here — its
    # residual 2.4x the LC gate sits BELOW the 3.05x the worst correctly-
    # tracked frames reach under degraded wide-baseline renders, measured,
    # see KeyframeConfig.lost_residual_factor; kidnap-and-relocalize is
    # covered at full resolution by test_kidnapped_robot_relocalizes),
    # then the rig reappears at petal 0's far point and walks home through
    # mapped space until relocalization re-acquires.  Yaw stays small:
    # the splat renderer degrades under large rotations.
    petal_len, n_petals, reach, width = 46, 3, 2.2, 0.35
    clover = n_petals * petal_len
    n_dropout = 3

    def gt_pose(i):
        pose = np.eye(4)
        pose[:3, :3] = np.asarray(
            se3_ops.so3_exp(jnp.array([0.0, 0.002 * i, 0.0]))
        )
        if i < clover:
            k, t = divmod(i, petal_len)
            t = t / (petal_len - 1)
            th = 2 * np.pi * k / n_petals
            radial = reach * np.sin(np.pi * t)
            lateral = width * np.sin(2 * np.pi * t)
            d = np.array([np.cos(th), 0.0, np.sin(th)])
            p = np.array([-np.sin(th), 0.0, np.cos(th)])
            pose[:3, 3] = radial * d + lateral * p
        else:
            # after the dropout: reappear at petal 0's far point, walk
            # straight home through mapped space
            t = (i - clover - n_dropout) / 20.0
            pose[:3, 3] = (1 - min(max(t, 0.0), 1.0)) * np.array(
                [reach, 0.0, 0.0]
            )
        return pose

    n_frames = clover + n_dropout + 25
    dropout_at = clover
    checkpoint_at = 80

    slam = KeyframeSLAM(builder, cfg)
    events, times, est, gt_used = [], [], [], []
    grew = set()
    for i in range(n_frames):
        gt_i = gt_pose(i)
        if dropout_at <= i < dropout_at + n_dropout:
            g = jnp.zeros_like(base_gray)
            d = jnp.zeros_like(base_depth)
        else:
            g, d = render_sphere_from(base_gray, base_depth, gt_i)
        t0 = time.perf_counter()
        ev = slam.process_state(slam.make_state_from_sphere(g, d))
        times.append(time.perf_counter() - t0)
        events.append(ev)
        est.append(slam.trajectory[-1].copy())
        gt_used.append(gt_i)
        grew.add(slam.map.poses.shape[0])

        if i == checkpoint_at:
            ck = tmp_path / "soak.ckpt.npz"
            slam.save_checkpoint(ck)
            fresh = KeyframeSLAM(builder, cfg)
            fresh.resume_from_checkpoint(ck)
            assert int(fresh.map.n_kf) == int(slam.map.n_kf)
            assert len(fresh.trajectory) == len(slam.trajectory)
            slam = fresh  # continue the run on the resumed tracker

    slam.flush()  # apply the deferred keyframe events before reading stats
    n_kf = int(slam.map.n_kf)
    # --- scale assertions
    assert n_kf >= 50, f"only {n_kf} keyframes"
    assert len(grew) >= 3, f"capacities seen: {sorted(grew)} (expected 2+ grows)"
    assert slam.map.poses.shape[0] > cfg.graph.pcg_threshold_kf, (
        "PCG threshold never crossed"
    )
    # Revisit constraints: genuine LC edges (first contact between
    # non-neighbor areas) plus temporally-distant connection edges (later
    # petal returns re-enter a now-NEIGHBOR area, so the reference semantics
    # deliver those constraints through the connection search, not the LC
    # thread — `include/LoopClosure360.h:289-366`).
    n_e = int(slam.map.n_edges)
    eij = np.asarray(slam.map.graph.edges_ij[:n_e])
    n_revisit = int(np.sum(np.abs(eij[:, 1] - eij[:, 0]) >= 8))
    assert slam.n_loop_closures >= 2, slam.n_loop_closures
    assert n_revisit >= 3, f"only {n_revisit} revisit constraints"
    assert events[dropout_at].get("lost"), "sensor dropout not detected"
    assert any(e.get("relocalized") for e in events[dropout_at:]), (
        "never relocalized after the dropout"
    )
    assert not slam.lost

    # --- accuracy: tracked portion before the dropout, and the recovery
    pre = np.stack(est[:dropout_at])
    ate_pre = ate_rmse(pre, np.stack(gt_used[:dropout_at]))
    assert ate_pre < 0.3, f"pre-dropout ATE {ate_pre:.3f} m"
    err_final = np.linalg.norm(est[-1][:3, 3] - gt_used[-1][:3, 3])
    assert err_final < 0.3, f"final error {err_final:.3f} m"

    # --- bounded per-frame work: steady-state tracking frames late in the
    # run (map ~4x bigger) must not be materially slower than early ones.
    # Keyframe frames and the frames right after a capacity grow (re-jit)
    # are excluded — they are the known, amortized spikes.
    kf_frames = {i for i, e in enumerate(events) if e.get("keyframe")}
    def steady(lo, hi):
        vals = [
            t for i, t in enumerate(times[lo:hi], start=lo)
            if i not in kf_frames
        ]
        return float(np.median(vals))

    early = steady(20, 60)
    late = steady(n_frames - 45, n_frames)
    # measured headroom (round 2, CPU backend): late/early ~ 0.81 — the
    # area-driven candidate gating keeps per-frame work flat as the map
    # quadruples, so a 1.5x bound catches real degradation with margin
    assert late < 1.5 * early, (
        f"per-frame time degraded with map size: {early:.3f}s -> {late:.3f}s"
    )
    print(
        f"soak: {n_frames} frames, {n_kf} KFs, {int(slam.map.n_edges)} edges, "
        f"{slam.n_loop_closures} LCs, {n_revisit} revisit constraints, "
        f"{int(slam.map.n_areas)} areas, "
        f"capacity {slam.map.poses.shape[0]}, ATE(pre) {ate_pre:.3f} m, "
        f"final err {err_final:.3f} m, steady frame time "
        f"{early * 1000:.0f} -> {late * 1000:.0f} ms"
    )


def test_fused_track_matches_split(calibration):
    """The single-dispatch fused fast path of `KeyframeSLAM.process(raw)`
    (build + pyramid + segmentation + PbMap + motion-model-seeded dense
    solve in ONE jitted program) must track the same trajectory as the
    split make_state + process_state path."""
    from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    calib = load_calibration("/root/reference/Calibration/Extrinsics", None)
    rt = np.asarray(calib.rt, np.float64)
    gt = synth_trajectory_poses("loop", 8, radius=0.6)
    cfg = default_config()
    fused = KeyframeSLAM(FrameBuilder(calib, cfg), cfg)
    split = KeyframeSLAM(FrameBuilder(calib, cfg), cfg)
    n_fused_dispatch_frames = 0
    for i in range(6):
        raw = synth_capture(i, rt=rt, pose=gt[i], room="octagon")
        fused.process(raw)
        split.process_state(split.make_state(raw))
        if fused.timer.counts.get("fused_track", 0) > n_fused_dispatch_frames:
            n_fused_dispatch_frames = fused.timer.counts["fused_track"]
    # the fast path actually engaged (first frame seeds the map; the rest
    # should ride the fused dispatch)
    assert fused.timer.counts.get("fused_track", 0) >= 4, dict(fused.timer.counts)
    np.testing.assert_allclose(
        np.stack(fused.trajectory), np.stack(split.trajectory), atol=1e-4
    )
    assert int(fused.map.n_kf) == int(split.map.n_kf)


def test_async_kf_events_match_sync(calibration):
    """The deferred keyframe-event pipeline (`kf.async_kf_events`, the
    reference's background LC thread redesigned on JAX async dispatch,
    `include/LoopClosure360.h:93`) must reproduce the synchronous pipeline:
    same keyframes, same edges, same loop closures, and an optimized
    trajectory within solver tolerance — deferred constraint application
    (the staleness `SLAM/SphereGraphSLAM.cpp:251-271` tolerates) must not
    change where the map converges."""
    from dataclasses import replace

    from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    calib = load_calibration("/root/reference/Calibration/Extrinsics", None)
    rt = np.asarray(calib.rt, np.float64)
    n = 14
    gt = synth_trajectory_poses("loop", n, radius=0.8)
    raws = [synth_capture(i, rt=rt, pose=gt[i], room="octagon") for i in range(n)]

    cfg = default_config()
    builder = FrameBuilder(calib, cfg)
    runs = {}
    for mode in (False, True):
        cfg_m = cfg.replace(kf=replace(cfg.kf, async_kf_events=mode))
        slam = KeyframeSLAM(builder, cfg_m)
        for raw in raws:
            slam.process(raw)
        slam.flush()
        runs[mode] = slam

    sync, asy = runs[False], runs[True]
    assert not asy._pending
    assert int(asy.map.n_kf) == int(sync.map.n_kf)
    assert int(asy.map.n_edges) == int(sync.map.n_edges)
    assert asy.n_loop_closures == sync.n_loop_closures
    # keyframe events went through the deferred pipeline and the dispatch
    # counter recorded them (the bench's dispatches_per_kf_event source)
    assert asy.kf_event_dispatches, "no keyframe event was recorded"
    assert max(asy.kf_event_dispatches) <= 12, asy.kf_event_dispatches
    opt_s = sync.optimized_trajectory()
    opt_a = asy.optimized_trajectory()
    d = np.linalg.norm(opt_a[:, :3, 3] - opt_s[:, :3, 3], axis=1)
    assert d.max() < 0.02, f"async trajectory deviates {d.max():.4f} m"
