"""Benchmark: full spherical registration pipeline throughput on one chip.

Measures the per-frame cost of the flagship pipeline - raw rig capture
(device-resident u8 RGB / u16 depth) -> undistort -> stitch -> pyramids ->
dense spherical photo+depth alignment against a reference frame - on the
default JAX platform (the real TPU chip under the driver).

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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
    # per-row gather-latency-bound, so rows ~= time.  49152 was the previous
    # setting (282 fps); 16384 measures 358-362 fps at the same pose.
    cfg = DenseRegConfig(salient_pixels=16384)
    aligner = D.DenseAligner(cfg)

    # reference (target) frame: built once, like the keyframe in tracking
    _, trg_pyr = builder.build_with_pyramid(RigFrame.from_raw(raw2))

    # device-resident input window (the dataset prefetcher's job)
    rgb = jnp.stack([jnp.asarray(r.rgb) for r in (raw1, raw2)])
    depth = jnp.stack([jnp.asarray(r.depth_mm) for r in (raw1, raw2)])
    params = builder._params
    seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
    seam_valid = D.seam_masks_per_level(seam, cfg.pyramid_levels)

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

    # compile + warm
    poses, errs = run(idx)
    np.asarray(poses)

    best = 0.0
    for _ in range(3):
        t0 = time.time()
        poses, errs = run(idx)
        poses = np.asarray(poses)  # read back and consume EVERY frame's pose
        dt = time.time() - t0
        assert poses.shape == (n // BATCH, BATCH, 4, 4) and np.isfinite(poses).all()
        best = max(best, n / dt)

    print(
        json.dumps(
            {
                "metric": "registration_pipeline_fps",
                "value": round(best, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(best / REF_CPU_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
