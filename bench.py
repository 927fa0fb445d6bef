"""Benchmark: full spherical registration pipeline throughput on one chip,
plus a per-stage breakdown so round-over-round regressions are machine
visible.

Headline metric - the per-frame cost of the flagship pipeline: raw rig
capture (device-resident u8 RGB / u16 depth) -> undistort -> stitch ->
pyramids -> dense spherical photo+depth alignment against a reference frame
- on the default JAX platform (the real TPU chip under the driver).

Methodology: the N input frames are preloaded to HBM (in deployment the
SequenceDataset prefetch thread streams them over PCIe well ahead of
compute).  The whole run is ONE jitted `lax.scan` whose per-step body
processes a BATCH of 4 frames through the full pipeline - the throughput
configuration used by sequence registration: the stitch gather indices are
calibration-fixed, so 4 frames stitch with ONE per-row latency-bound gather
(`ops/stitch.stitch_batch`), and the GN pyramids/levels vmap.  Batched poses
are bit-identical to the single-stream path (tested); every frame's pose is
read back and consumed - nothing can be elided or overlapped away.  The
single-stream (latency-oriented) figure is ~130 fps; see BASELINE.md.

Per-stage metrics (the BASELINE.md measured table, emitted as JSON): frame
build, pyramid build, 8-sensor plane segmentation, full dense alignment, and
pose-graph BA dense/PCG iteration rates.  Each stage entry carries an
`attribution` string naming the bounding resource (gather latency, MXU,
HBM bandwidth) so a regression points at the violated budget, not just a
number.  Stage loops are `lax.scan`s with data dependencies, so XLA cannot
elide or overlap the repeats; the scan amortizes the harness tunnel's fixed
~30 ms dispatch round trip to noise.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages"}.

Baseline: the reference is CPU-only C++/OpenMP with no published numbers and
un-buildable deps (PCL/MRPT/g2o) in this image, so the recorded baseline is
the same pipeline measured on this host's CPU via JAX CPU (see BASELINE.md
"measured" section): 2.04 frames/s.  vs_baseline = TPU fps / CPU fps.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_CPU_FPS = 2.04  # measured on this host, see BASELINE.md
BATCH = 4


def _bench_pipeline(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid):
    from rgbd360_tpu.registration import dense as D

    rgb = jnp.stack([jnp.asarray(r.rgb) for r in (raw1, raw2)])
    depth = jnp.stack([jnp.asarray(r.depth_mm) for r in (raw1, raw2)])
    params = builder._params

    # 480 frames: long enough that the harness tunnel's fixed ~30 ms
    # dispatch+readback round trip (a link artifact, not chip time) is <2%
    # of the run; fps converges to the on-chip rate by n~240.
    n = 480
    idx = (jnp.arange(n) % 2).reshape(n // BATCH, BATCH)

    def step(carry, ib):
        sg_b, sd_b = builder._build_gray_depth_batch_impl(params, rgb[ib], depth[ib])

        def one(sg, sd):
            pyr = D.build_frame_pyramid(sg, sd, cfg, seam_valid, allow_pallas=False)
            res = aligner._align_impl(pyr, trg_pyr, jnp.eye(4), D.PHOTO_DEPTH)
            return res.pose, res.error

        poses, errs = jax.vmap(one)(sg_b, sd_b)
        return carry, (poses, errs)

    @jax.jit
    def run(idx):
        _, (poses, errs) = jax.lax.scan(step, 0, idx)
        return poses, errs

    poses, errs = run(idx)  # compile + warm
    np.asarray(poses)

    best = 0.0
    for _ in range(3):
        t0 = time.time()
        poses, errs = run(idx)
        poses = np.asarray(poses)  # read back and consume EVERY frame's pose
        dt = time.time() - t0
        assert poses.shape == (n // BATCH, BATCH, 4, 4) and np.isfinite(poses).all()
        best = max(best, n / dt)
    return best


def _scan_time_ms(make_step, init_carry, k, consume):
    """Median per-iteration ms of `make_step` chained k times inside one jit
    (the carry dependency prevents elision; one readback per run)."""

    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (make_step(c), None), carry, None,
                            length=k)[0]

    out = run(init_carry)  # compile + warm
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run(init_carry)
        consume(out)
        best = min(best, (time.time() - t0) / k)
    return best * 1000.0


def _bench_stages(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid):
    """Per-stage table (the BASELINE.md measured rows, as JSON)."""
    from rgbd360_tpu.registration import dense as D

    stages = {}
    params = builder._params
    rgb = jnp.stack([jnp.asarray(r.rgb) for r in (raw1, raw2)])
    depth = jnp.stack([jnp.asarray(r.depth_mm) for r in (raw1, raw2)])

    # ---- frame build (undistort + stitch + gray): alternate the two real
    # captures; the carry picks which input feeds the next iteration
    def build_step(carry):
        i = carry % 2
        sg, sd = builder._build_gray_depth_batch_impl(
            params, rgb[i][None], depth[i][None]
        )
        return carry + 1 + (sg[0, 0, 0] * 0).astype(jnp.int32)

    stages["frame_build"] = {
        "value": round(_scan_time_ms(build_step, jnp.int32(0), 32,
                                     lambda o: np.asarray(o)), 3),
        "unit": "ms/frame",
        "attribution": (
            "614k-row stitch gather at the ~5 ns/row TPU gather latency "
            "floor (docs/PERFORMANCE.md); undistort and gray are fused "
            "elementwise"
        ),
    }

    # ---- pyramid build
    f1 = builder.build_from_raw(raw1)

    def pyr_step(carry):
        pyr = D.build_frame_pyramid(
            carry, f1.sphere_depth, cfg, seam_valid, allow_pallas=False
        )
        return carry + pyr.gray[-1][0, 0] * 0

    stages["pyramid_build"] = {
        "value": round(_scan_time_ms(pyr_step, f1.sphere_gray, 32,
                                     lambda o: np.asarray(o)), 3),
        "unit": "ms/frame",
        "attribution": (
            "banded-matmul pyrDown + 0/1-matmul depth block sums (MXU, "
            "zero gathers); bandwidth-bound at 614k px"
        ),
    }

    # ---- 8-sensor plane segmentation (grouped + merged): carry perturbs
    # the cloud so iterations depend on each other
    sph1 = f1  # same capture; one build serves pyramid + segmentation stages
    rt_p = params["rt"]

    def seg_step(carry):
        ps = builder._segment_impl(
            rt_p, carry, sph1.cloud_rgb, sph1.cloud_valid
        )
        return carry + ps.area[0] * 0

    # k=32: at k=8 the harness tunnel's fixed ~30 ms dispatch+readback
    # round trip leaked ~4 ms/frame into this stage (measured 10-14 ms vs
    # ~4.5 ms true chip time)
    seg_ms = _scan_time_ms(
        seg_step, sph1.local_xyz, 32, lambda o: np.asarray(o)
    )
    stages["segmentation"] = {
        "value": round(seg_ms, 3),
        "unit": "ms/frame",
        "attribution": (
            "Hillis-Steele segmented min-scan CC labeling + label "
            "histogram/moment sums as MXU matmuls; zero gathers/scatters"
        ),
    }

    # ---- full dense alignment (5 levels, PHOTO_DEPTH, dense sweeps)
    from rgbd360_tpu.config import DenseRegConfig

    dense_cfg = DenseRegConfig()
    dense_al = D.DenseAligner(dense_cfg)
    src_pyr = D.build_frame_pyramid(
        f1.sphere_gray, f1.sphere_depth, dense_cfg, seam_valid
    )

    def align_step(carry):
        res = dense_al._align_impl(src_pyr, trg_pyr, carry, D.PHOTO_DEPTH)
        # feed the solved pose back as the next seed: a real dependency
        return res.pose

    stages["dense_align"] = {
        "value": round(_scan_time_ms(align_step, jnp.eye(4), 32,
                                     lambda o: np.asarray(o)), 3),
        "unit": "ms/align",
        "attribution": (
            "GN sweeps are per-row gather-latency-bound (flat-index target "
            "gather); H/g assembly rides the MXU"
        ),
    }

    # ---- pose-graph BA, dense LM vs PCG (512 KF ring, 3 edges/KF)
    from rgbd360_tpu.slam.graph import (
        PoseGraph,
        optimize_pose_graph,
        optimize_pose_graph_pcg,
    )
    from rgbd360_tpu.ops import se3

    n_v, n_e = 512, 1536
    rng = np.random.default_rng(0)
    gt = [np.eye(4)]
    step_t = np.asarray(se3.se3_exp(jnp.array([0.5, 0, 0, 0, 2 * np.pi / n_v, 0])))
    for _ in range(n_v - 1):
        gt.append(gt[-1] @ step_t)
    edges, rels, infos, emask = (
        np.full((n_e, 2), -1, np.int32),
        np.tile(np.eye(4), (n_e, 1, 1)),
        np.tile(np.eye(6) * 100, (n_e, 1, 1)),
        np.zeros(n_e, bool),
    )
    poses = [np.eye(4)]
    e = 0
    for i in range(n_v - 1):
        z = np.linalg.inv(gt[i]) @ gt[i + 1]
        zn = z @ np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6))))
        poses.append(poses[-1] @ zn)
        edges[e], rels[e], emask[e] = (i, i + 1), zn, True
        e += 1
    for k in range(n_e - e):
        i = int(rng.integers(0, n_v - 8))
        j = i + int(rng.integers(4, 8))
        edges[e] = (i, j)
        rels[e] = np.linalg.inv(gt[i]) @ gt[j]
        emask[e] = True
        e += 1
    graph = PoseGraph(
        poses=jnp.asarray(np.stack(poses)),
        vmask=jnp.ones(n_v, bool),
        edges_ij=jnp.asarray(edges),
        rel=jnp.asarray(rels),
        info=jnp.asarray(infos),
        emask=jnp.asarray(emask),
    )

    for name, fn, iters in (
        ("ba_dense_lm", optimize_pose_graph, 10),
        ("ba_pcg", optimize_pose_graph_pcg, 10),
    ):
        out = fn(graph, iters)  # compile + warm
        jax.block_until_ready(out[0])
        reps, t0 = 3, time.time()
        for _ in range(reps):
            out = fn(graph, iters)
        jax.block_until_ready(out[0])
        n_it = max(int(out[2]), 1)
        stages[name] = {
            "value": round(reps * n_it / (time.time() - t0), 3),
            "unit": f"LM iters/sec ({n_v} KF, {n_e} edges)",
            "attribution": (
                "dense (N,N,6,6) assembly + one MXU solve per iter"
                if name == "ba_dense_lm"
                else "matrix-free block-Jacobi PCG; HBM-bandwidth-bound "
                "edge sweeps"
            ),
        }
    return stages


def main() -> None:
    from rgbd360_tpu.config import DenseRegConfig
    from rgbd360_tpu.core.frame import FrameBuilder, RigFrame
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.ops import stitch as stitch_ops
    from rgbd360_tpu.registration import dense as D

    calib = load_calibration(
        "/root/reference/Calibration/Extrinsics",
        "/root/reference/Calibration/Intrinsics",
    )
    builder = FrameBuilder(calib)
    raw1 = read_rig_frame("/root/reference/samples/sphere_images_1.bin")
    raw2 = read_rig_frame("/root/reference/samples/sphere_images_10.bin")
    # salient finest level: 16384 stratified-salient pixels reproduce the
    # dense pose to ~3.5 mm on the rig samples (and ground-truthed synthetic
    # motion to the same error as the dense sweep); the GN sweeps are
    # per-row gather-latency-bound, so rows ~= time.
    cfg = DenseRegConfig(salient_pixels=16384)
    aligner = D.DenseAligner(cfg)

    # reference (target) frame: built once, like the keyframe in tracking
    _, trg_pyr = builder.build_with_pyramid(RigFrame.from_raw(raw2))
    seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
    seam_valid = D.seam_masks_per_level(seam, cfg.pyramid_levels)

    fps = _bench_pipeline(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid)
    stages = _bench_stages(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid)
    stages["pipeline_batch4"] = {
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "attribution": (
            "one calibration-fixed row gather stitches all 4 frames; "
            "vmapped GN levels; gather latency sets the ceiling"
        ),
    }
    # full per-frame KeyframeSLAM front-end work = the batch-4 registration
    # pipeline plus the 8-sensor plane segmentation each frame also pays
    stages["slam_frontend"] = {
        "value": round(1000.0 / (1000.0 / fps + stages["segmentation"]["value"]), 3),
        "unit": "frames/sec/chip",
        "attribution": (
            "derived: 1 / (batch-4 pipeline frame time + segmentation "
            "ms/frame)"
        ),
    }

    print(
        json.dumps(
            {
                "metric": "registration_pipeline_fps",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REF_CPU_FPS, 3),
                "stages": stages,
            }
        )
    )


if __name__ == "__main__":
    main()
