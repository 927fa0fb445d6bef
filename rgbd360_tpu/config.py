"""Typed configuration tree for the whole framework.

The reference scatters its configuration over three mechanisms: global
threshold variables (reference `include/Miscellaneous.h:51-76`), compile-time
#defines (`include/Frame360.h:40-41`), and mrpt INI files for the plane-matcher
constraints (`config_files/configLocaliser_sphericalOdometry.ini`).  Here all
of it is a single immutable dataclass tree whose defaults reproduce the
reference behavior; instances are hashable so they can be passed as static
arguments to jitted functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class RigConfig:
    """Geometry of the 8-sensor ring rig (reference `include/Calib360.h`)."""

    num_sensors: int = 8
    # QVGA per-sensor resolution; images are stored 240 rows x 320 cols.
    width: int = 320
    height: int = 240
    # Pinhole intrinsics for QVGA (reference `include/Calib360.h:75-77`).
    fx: float = 262.5
    fy: float = 262.5
    cx: float = 159.5
    cy: float = 119.5
    # Valid depth gate in meters (reference `OpenNI2_Grabber/FrameRGBD/CloudRGBD_Ext.h`).
    min_depth: float = 0.3
    max_depth: float = 10.0
    # Edge-preserving bilateral smoothing of the per-sensor depth before the
    # cloud/plane stage, default ON like the reference
    # (`include/Frame360.h:40` `#define USE_BILATERAL_FILTER 1`, applied
    # per-sensor with sigmaS=10 px, sigmaR=0.05 m at `:492-499` before
    # transforming clouds into the rig frame).  Affects the per-sensor
    # clouds and plane segmentation only — the stitched sphere keeps the
    # raw undistorted depth, as in the reference.
    bilateral: bool = True
    bilateral_sigma_s: float = 10.0
    bilateral_sigma_r: float = 0.05


@dataclass(frozen=True)
class SphereConfig:
    """Spherical image layout (reference `include/Frame360.h:391-394`).

    width = 8 * sensor_rows = 1920; height = width * 0.5 * 60/180 = 320.
    Row r maps to elevation phi = (height/2 - 0.5 - r) * (2*pi/width); column c
    maps to azimuth theta = c * (2*pi/width).  The unit ray for (phi, theta) is
    (sin(phi), -cos(phi)*sin(theta), -cos(phi)*cos(theta)) (reference
    `include/Frame360.h:589-593`).
    """

    width: int = 1920
    height: int = 320
    # Two-pass parallax-corrected stitch (ops/stitch.stitch_refined):
    # re-projects each ray at its measured depth and stores exact
    # rig-centered radial distance.  Removes the rig-locked parallax warp of
    # the calibration-only maps (which the reference shares) at the cost of
    # one extra row gather per frame.  Off by default to match the
    # reference's sphere semantics and the recorded throughput numbers.
    parallax_refine: bool = False


@dataclass(frozen=True)
class DenseRegConfig:
    """Dense spherical photo+depth alignment (reference `include/RegisterPhotoICP.h`)."""

    pyramid_levels: int = 5
    max_iters_per_level: int = 10
    tol_update: float = 1e-4
    tol_residual: float = 1e-3
    # Photometric / depth noise models (reference `RegisterPhotoICP.h:125-131`:
    # stdDevPhoto defaults 3/255 as set by the SLAM apps, stdDevDepth=0.01).
    std_photo: float = 3.0 / 255.0
    std_depth: float = 0.01
    # Saliency gates on target gradients (reference `RegisterPhotoICP.h:149-151`).
    sal_intensity: float = 0.04
    sal_depth: float = 0.04
    min_depth: float = 0.3
    max_depth: float = 20.0
    # Width of the masked seam at each sensor boundary, in pixels at full res
    # (reference `RegisterPhotoICP.h:4537-4549` zeroes 2 columns per seam).
    seam_mask_px: int = 2
    # When > 0, the finest level's GN sweeps use only the top-K most salient
    # source pixels (by source gradient energy) instead of all ~614k — the
    # reference's bUseSalientPixels idea (`RegisterPhotoICP.h:266`), here as
    # a static top-k so it stays jittable.  0 disables (default: on real rig
    # data 48k salient pixels reproduce the dense pose to sub-mm and run the
    # finest level ~1.6x faster, but on low-texture scenes the selection can
    # concentrate and weaken conditioning, so it stays opt-in like the
    # reference's flag).  The final statistics/Hessian sweep is always dense.
    salient_pixels: int = 0
    # Validity-weighted bilinear target sampling (beyond reference, which
    # rounds warp coordinates — `RegisterPhotoICP.h:2545`).  Nearest-pixel
    # rounding costs ~half a pixel of warp address error (~3.3 mrad on the
    # 1920-wide sphere = 10-16 mm tangential at 3 m — the dominant term of
    # the measured pairwise accuracy floor, docs/PERFORMANCE.md).  All six
    # target channels are blended with ONE shared weight set (bilinear x
    # tap-depth-validity, renormalized); pixels whose taps straddle a depth
    # discontinuity or lose most weight to invalid taps fall back to the
    # nearest tap jointly.  Costs one 24-wide row gather per sweep instead
    # of 6-wide — same per-row gather latency.  Off by default for
    # reference parity of the residual statistics.
    bilinear: bool = False
    # Max relative depth spread across contributing taps before a pixel
    # falls back to nearest (guards against blending across surfaces).
    bilerp_depth_spread: float = 0.05
    # Dense polish after a salient solve (beyond reference): this many
    # FULL-sweep GN iterations at the finest level remove the salient
    # subset's selection bias.  On smooth/low-texture scenes the thinned
    # solve's per-frame bias compounds into trajectory drift (synthetic
    # octagon loop: ATE 0.83 m -> 0.037 m with polish=2, equal to full
    # dense); on real rig data the bias is ~3.5 mm and polish is
    # unnecessary.  Costs ~2 dense finest-level sweeps per align (the
    # batched registration bench drops 488 -> 123 fps), so it is OFF by
    # default and enabled by the SLAM app's --salient mode, where accuracy
    # governs.  Only applies when salient_pixels > 0.
    polish_iters: int = 0


@dataclass(frozen=True)
class SegmentationConfig:
    """Organized multi-plane segmentation (reference `include/Frame360.h:942-977`)."""

    min_inliers: int = 80
    angular_threshold: float = 0.039812  # rad, ~3 deg cone for region growing
    distance_threshold: float = 0.02  # m, point-to-plane gate
    max_curvature: float = 0.0013  # reference `include/Miscellaneous.h:54`
    # Gate applied to THIS estimator's curvature (lambda0 / sum(lambda) over
    # raw component points): depth noise alone puts real walls near 1e-3, so
    # the PCL-calibrated constant above is too strict here; curved surfaces
    # (r <~ 1 m) land at >= 5e-3.
    max_curvature_estimate: float = 5e-3
    min_area: float = 0.12  # reference `include/Miscellaneous.h:57`
    max_elongation: float = 6.0  # reference `include/Miscellaneous.h:60`
    normal_smoothing_size: int = 8
    max_depth_change: float = 0.02
    # Fixed capacity of the padded plane set per frame / per sensor.
    max_planes: int = 32
    max_planes_sensor: int = 16
    # Iterations of connected-component label propagation (power-of-two hops).
    cc_iters: int = 24
    # Number of hull directions for the polygonal contour approximation.
    hull_dirs: int = 16
    # Cross-sensor grouping gates (reference `include/Frame360.h:747-748`).
    group_max_dist_hull: float = 0.5
    group_max_dist_parallel: float = 0.09
    # Same-frame merge gates (reference `include/Frame360.h:671-701`).
    merge_normal_dot: float = 0.99
    merge_dist_d: float = 0.45
    merge_max_dist_hull: float = 0.3
    merge_max_dist_parallel: float = 0.06


@dataclass(frozen=True)
class MatcherConfig:
    """Plane-graph matching constraints.

    Defaults follow the interpretation-tree thresholds in the reference
    `config_files/configLocaliser_sphericalOdometry.ini:9-36`; the matcher
    itself is re-designed as masked exhaustive consistency scoring (see
    `registration/planes.py`) rather than a recursive tree.
    """

    min_planes_recognition: int = 3
    # Unary constraints
    unary_dist_d: float = 0.5
    unary_angle_deg: float = 50.0
    hue_threshold: float = 0.35
    area_threshold: float = 3.0  # ratio gate between matched plane areas
    elongation_threshold: float = 2.5
    # Binary constraints
    binary_dist_threshold: float = 3.0
    binary_angle_threshold_deg: float = 10.0
    height_threshold: float = 0.33
    cos_normal_threshold: float = 0.985
    # Capacity of the match set (reference `include/Miscellaneous.h:51`).
    max_match_planes: int = 25
    # Greedy consistency-expansion rounds.
    max_matches: int = 25

    @staticmethod
    def from_ini(path) -> "MatcherConfig":
        """Load matcher thresholds from a reference-format INI file
        (`config_files/configLocaliser_*.ini`, mrpt-pbmap interpretation-tree
        parameters; the SLAM apps pass this file to `RegisterRGBD360`,
        reference `include/RegisterRGBD360.h:100`).  Unknown keys are
        ignored; missing keys keep the baked-in defaults."""
        import re

        vals = {}
        for raw in open(path, encoding="utf-8", errors="replace"):
            line = raw.split("//")[0].split("%")[0].strip()
            m = re.match(r"([\w.]+)\s*=\s*([^\s]+)", line)
            if m:
                vals[m.group(1)] = m.group(2)

        def num(key, default, cast=float):
            try:
                return cast(vals[key])
            except (KeyError, ValueError):
                return default

        d = MatcherConfig()
        return MatcherConfig(
            min_planes_recognition=num(
                "min_planes_recognition", d.min_planes_recognition, int
            ),
            unary_dist_d=num("dist_d", d.unary_dist_d),
            unary_angle_deg=num("angle", d.unary_angle_deg),
            hue_threshold=num("hue_threshold", d.hue_threshold),
            area_threshold=num("area_threshold", d.area_threshold),
            elongation_threshold=num("elongation_threshold", d.elongation_threshold),
            binary_dist_threshold=num("dist_threshold", d.binary_dist_threshold),
            binary_angle_threshold_deg=num(
                "angle_threshold", d.binary_angle_threshold_deg
            ),
            height_threshold=num("height_threshold", d.height_threshold),
            cos_normal_threshold=num("cos_normal_threshold", d.cos_normal_threshold),
            max_match_planes=d.max_match_planes,
            max_matches=d.max_matches,
        )


@dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe selection / odometry policy (reference `SLAM/KFsphere_SLAM.cpp`)."""

    min_dist_keyframes: float = 0.2  # `include/Miscellaneous.h:66`
    max_translation_odometry: float = 1.8  # `include/Miscellaneous.h:69`
    max_rotation_odometry: float = 1.2  # `include/Miscellaneous.h:72`
    select_kf_icp_dist: float = 0.9  # depth-residual gate `KFsphere_SLAM.cpp:284`
    connection_radius: float = 2.5  # neighbor KF search `KFsphere_SLAM.cpp:286`
    max_connection_residual: float = 1.8
    # Connection candidates are keyframes of the SAME or a NEIGHBOR area
    # within connection_radius (reference `KFsphere_SLAM.cpp:405-461`); this
    # caps the dense alignments spent per new keyframe on top of that
    # (beyond-reference safety bound — the area partition already keeps the
    # pool size independent of total map size).
    max_connections: int = 6
    min_matches_fastpath: int = 6
    min_area_fastpath: float = 12.0
    # Beyond-reference rotation trigger: promote a keyframe once the
    # KF-relative rotation exceeds this (rad).  The reference promotes on
    # residual/distance only, so KF-relative rotation can grow past the
    # odometry continuity limit (`max_rotation_odometry`) and past the
    # range where PbMap seeds stay meaningful.
    max_rotation_keyframes: float = 0.8
    # Catastrophic-residual safety net (beyond-reference): a solve whose
    # final depth residual exceeds this many times `lc.max_depth_residual`
    # did not explain the scene — declare tracking lost instead of freezing
    # the pose into a keyframe.  Motion-continuity alone misses a failed
    # solve that settles near its seed (the step looks "continuous").
    # Anchoring on the LC verify gate makes the threshold track whatever
    # depth-noise level the deployment already calibrated (sensor noise,
    # render noise, bfloat16 map payload).  The factor is deliberately a
    # WIDE net, not a kidnap detector: on the half-res soak the worst
    # CORRECTLY-tracked frames (pose error ~1 cm under degraded wide-
    # baseline renders) measure 3.05x the LC gate, while a teleported
    # frame's solve measures only 2.4-2.5x — residual magnitude cannot
    # separate those (measured; neither can SSO: the teleport's 0.28
    # co-visibility equals the petal-tip normal minimum).  Kidnap-class
    # events are caught by the motion-continuity guards when the solve
    # diverges, and by loop-closure/relocalization consistency otherwise;
    # this gate exists for data that explains nothing (sensor corruption,
    # saturating noise) while the solve stays continuous.
    lost_residual_factor: float = 4.0
    # Seeded dense solves whose final mean residual exceeds this are suspect
    # enough to warrant the next seed in the fallback chain (bad PbMap seeds
    # land in high-error local minima; well-seeded solves sit well below).
    fallback_error: float = 3.0
    # CONNECTION dense aligns (the per-keyframe neighbor edges, reference
    # `KFsphere_SLAM.cpp:405-461`) start this many pyramid levels below
    # full resolution.  Full-res aligns cost ~14 ms each on chip and a
    # keyframe event batches up to `max_connections` of them — the single
    # largest block of event device time (measured round 4).  One level
    # down is 4x fewer rows per sweep at ~2x the alignment error (a few
    # mm) — ample for auxiliary graph edges, whose information matrix
    # (the coarse solve's own Hessian) scales accordingly.  0 = full res.
    connection_coarse_level: int = 1
    # Overlap keyframe-event map work (connection aligns, loop-closure
    # scan/verify, pose-graph optimization, partitioning) with subsequent
    # tracked frames — the reference's background loop-closure thread
    # (`include/LoopClosure360.h:93,108`; `SLAM/SphereGraphSLAM.cpp:251-271`
    # drains its edges opportunistically), redesigned on JAX async dispatch:
    # event programs are dispatched un-fetched and drained phase-by-phase on
    # later frames, so tracking never blocks on the event's host logic or
    # tunnel round trips.  False = run the whole event synchronously inside
    # the keyframe frame (bit-identical map, simpler timing).
    async_kf_events: bool = True
    # MULTI-PROCESS poll cadence: with >1 process, poll sites cannot consult
    # `is_ready()` (readiness diverges across processes and desynchronizes
    # collective dispatch order — an SPMD deadlock, round 4).  Round 4's
    # deterministic schedule advanced one phase at EVERY poll site, blocking
    # on each phase's fetches and re-serializing the pipeline; instead the
    # head event now advances only every Nth poll site (counter-keyed, so
    # every process advances at identical points in the frame stream),
    # giving each phase's dispatches N-1 poll intervals of tracked-frame
    # overlap to complete before the blocking fetch.  ~2 poll sites run per
    # frame; an event has ~4-6 phases.  1 = advance every poll (the round-4
    # schedule).  Ignored in single-process runs (readiness checks are
    # cheaper and non-hazardous there).
    det_poll_cadence: int = 3


@dataclass(frozen=True)
class LoopClosureConfig:
    """Loop closure search (reference `include/LoopClosure360.h:114-126,289-322`)."""

    search_radius: float = 5.0
    min_matches: int = 5
    min_area: float = 15.0
    max_depth_residual: float = 2.0
    # Upper bound on dense verifications per new keyframe.  Candidate
    # SELECTION is area-driven (same-area keyframes + representative
    # keyframes of non-neighbor areas, reference `LoopClosure360.h:289-366`),
    # which already bounds the candidate pool independently of map size;
    # this cap only guards the dense-verify cost against pathological
    # many-candidate frames.
    max_dense_checks: int = 3
    # When False, ignore topological areas and consider every keyframe in
    # radius (pre-partition behavior; also what tiny maps fall back to).
    area_gating: bool = True
    # Beyond-reference photo-consistency gate: the reference accepts a loop
    # closure on depth residual alone (`include/LoopClosure360.h:316`),
    # which is blind to rotational aliasing in (near-)symmetric rooms —
    # geometry repeats but texture does not.  A candidate is accepted only
    # if its photometric residual is within this ratio of the tracker's
    # CURRENT photometric residual (self-calibrating to the sequence's
    # lighting/noise level).  None disables the gate.
    max_photo_ratio: float | None = 1.3
    # Absolute floor for the photo gate threshold: on ultra-clean sequences
    # the tracker's residual can be near zero, and a pure ratio would then
    # reject every genuine wide-baseline closure (which carries resampling/
    # occlusion residual of its own).  Threshold = max(ratio * ref, floor).
    photo_gate_floor: float = 2.0
    # When > 0, the LC dense VERIFICATION aligner thins its GN sweeps to
    # this many stratified-salient pixels (the tracking loop's 16384-budget
    # trick) PLUS two dense polish iterations at the finest level.  The
    # acceptance gates always see FULL-sweep statistics (the final
    # residual/Hessian sweep of a salient solve is dense), but the solve
    # must land at the full-sweep pose for borderline candidates: measured
    # on the rendered closed-loop scenario (round 3, docs/PERFORMANCE.md),
    # salient-16k ALONE converges ~mm short on wide-baseline closures and
    # loses 1 of 2 closures at the 2.0 depth gate (residual 2.0+ vs 1.79),
    # while salient-16k + polish-2 reproduces both decisions with
    # residuals within 4% of full sweeps.  Default ON since round 4: the
    # keyframe event's verify batch is a major block of its device time and
    # the polish-2 configuration reproduces full-sweep decisions (measured,
    # docs/PERFORMANCE.md round 3).  0 restores full sweeps (the
    # gate-calibration configuration).
    verify_salient_pixels: int = 16384


@dataclass(frozen=True)
class RelocConfig:
    """Relocalization acceptance (reference `include/Relocalizer360.h:82-83`)."""

    min_matches: int = 5
    min_area: float = 10.0


@dataclass(frozen=True)
class MapConfig:
    """Fixed capacities for the jittable map state.

    These are STARTING capacities: the map auto-grows geometrically
    (doubling) when exhausted, recompiling the map-shaped programs once per
    bump.  Round 4 lowered the defaults 512/4096 -> 64/512: every
    map-shaped program (LC scan, candidate kernels, pose-graph solves)
    costs proportional to CAPACITY, not live count, so a fresh session was
    paying 512-KF solve time for a 10-keyframe map — measured as a large
    share of keyframe-event device time."""

    max_keyframes: int = 64
    max_edges: int = 512
    max_areas: int = 64
    # Topological partitioning (reference `include/TopologicalMap360.h:411`).
    sso_partition_threshold: float = 0.8
    partition_every_n_kf: int = 4


@dataclass(frozen=True)
class GraphConfig:
    """Pose-graph optimization (reference `include/GraphOptimizer.h:66-71,196`)."""

    max_iters: int = 10
    lm_lambda0: float = 1e-5
    lm_step: float = 10.0
    # Above this keyframe CAPACITY the tracker's optimizer switches from the
    # dense MXU solve (reference g2o LinearSolverDense semantics) to the
    # matrix-free block-Jacobi LM-PCG: the dense path materializes (N, N, 6,
    # 6) normal-equation blocks, which stops being the right trade around
    # hundreds of keyframes.  Capacity — not live count — so the choice only
    # changes at a grow, never per frame.  128 places the switch at the
    # measured on-chip crossover (round 5, tools/profile_ba.py: dense is
    # faster through capacity 128 [6.8 vs 7.5 ms/iter], PCG from 256 up
    # [8.2 vs 10.4 at 256, 11.6 vs 20.6 at 512, 17.0 vs 81.6 at 1024],
    # with identical chi2 at the crossover) — the round-4 value of 256
    # picked the 20%-slower dense solve at capacity 256 (VERDICT r4 #8).
    pcg_threshold_kf: int = 128
    # Robust loop-closure handling: Dynamic Covariance Scaling on edges
    # marked as loop closures (the RRR-class capability the reference's
    # broken `RRR.hpp` include reached for; `include/GraphOptimizer.h:28`).
    robust_lc: bool = True
    dcs_phi: float = 10.0


@dataclass(frozen=True)
class FrameworkConfig:
    rig: RigConfig = dataclasses.field(default_factory=RigConfig)
    sphere: SphereConfig = dataclasses.field(default_factory=SphereConfig)
    dense: DenseRegConfig = dataclasses.field(default_factory=DenseRegConfig)
    seg: SegmentationConfig = dataclasses.field(default_factory=SegmentationConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    kf: KeyframeConfig = dataclasses.field(default_factory=KeyframeConfig)
    lc: LoopClosureConfig = dataclasses.field(default_factory=LoopClosureConfig)
    reloc: RelocConfig = dataclasses.field(default_factory=RelocConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)

    def replace(self, **kw) -> "FrameworkConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> FrameworkConfig:
    return FrameworkConfig()
