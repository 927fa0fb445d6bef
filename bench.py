"""Benchmark: full spherical registration pipeline throughput on one chip,
plus a per-stage breakdown with roofline accounting and a MEASURED run of
the production SLAM tracker.

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
read back and consumed - nothing can be elided or overlapped away.

Per-stage metrics (the BASELINE.md measured table, emitted as JSON): frame
build, pyramid build, plane segmentation (single and batch-4), full dense
alignment, pose-graph BA dense/PCG rates, the batch-4 pipeline, and a
MEASURED sequential run of the real `KeyframeSLAM` tracker.  Each stage
entry carries an `attribution` string naming the bounding resource AND a
`bound` object with the numeric roofline: the hardware floor implied by the
stage's work (gather rows x the measured ~5 ns/row latency floor, HBM
bytes / 819 GB/s, MXU FLOPs / ~33 TF f32-HIGHEST) and
`achieved_fraction = floor / measured` - 1.0 means the stage sits on its
roofline; a small fraction names headroom (usually per-kernel dispatch
overhead at these small shapes), so regressions AND opportunities are
machine-visible.  Stage loops are `lax.scan`s with data dependencies, so
XLA cannot elide or overlap the repeats.

Prints ONE compact JSON line (all numbers, no prose; see `compact_line` —
the driver records only the tail of stdout) and writes the full-detail
table with attributions/bounds to BENCH_DETAIL.json.

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

# ---- v5e roofline constants (docs/PERFORMANCE.md) -------------------------
GATHER_MS_PER_ROW = 5.0e-6  # measured flat-row gather latency floor
HBM_GBPS = 819.0  # v5e HBM bandwidth
MXU_F32_TFLOPS = 33.0  # f32-HIGHEST (6-pass bf16) effective MXU peak


def _bound(resource, floor_ms, measured_ms, peak_desc):
    return {
        "resource": resource,
        "peak": peak_desc,
        "floor_ms": round(floor_ms, 4),
        "achieved_fraction": round(
            min(1.0, floor_ms / max(measured_ms, 1e-9)), 4
        ),
    }


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
        # batched pyramids with the fused Pallas level-0 gradients (the
        # per-frame vmap form could not use the halo kernel)
        pyr_b = D.build_frame_pyramid_batch(sg_b, sd_b, cfg, seam_valid)

        def one(pyr):
            res = aligner._align_impl(pyr, trg_pyr, jnp.eye(4), D.PHOTO_DEPTH)
            return res.pose, res.error

        poses, errs = jax.vmap(one)(pyr_b)
        return carry, (poses, errs)

    @jax.jit
    def run(idx):
        _, (poses, errs) = jax.lax.scan(step, 0, idx)
        return poses, errs

    poses, errs = run(idx)  # compile + warm
    np.asarray(poses)

    rates = []
    for _ in range(5):
        t0 = time.time()
        poses, errs = run(idx)
        poses = np.asarray(poses)  # read back and consume EVERY frame's pose
        dt = time.time() - t0
        assert poses.shape == (n // BATCH, BATCH, 4, 4) and np.isfinite(poses).all()
        rates.append(n / dt)
    rates = np.sort(np.asarray(rates))
    return float(np.median(rates)), float(rates[-1] - rates[0])


_HARNESS_MS_CACHE = {}


def _harness_overhead_ms(k, reps=5):
    """Per-step cost of an EMPTY k-step scan chain + scalar readback on this
    harness: dispatch + tunnel round trip + loop overhead, zero payload.
    ~25 ms/run on the tunneled chip — 0.78 ms/step at k=32 — and until
    round 5 it was silently counted as stage time in every scan-chained
    row.  Measured once per chain length and subtracted."""
    if k in _HARNESS_MS_CACHE:
        return _HARNESS_MS_CACHE[k]

    @jax.jit
    def run(c):
        return jax.lax.scan(
            lambda c, _: (c * 1.0000001 + 1e-9, None), c, None, length=k
        )[0]

    np.asarray(run(jnp.float32(1.0)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(run(jnp.float32(1.0)))
        ts.append((time.time() - t0) / k * 1000.0)
    v = float(np.median(np.sort(np.asarray(ts))))
    _HARNESS_MS_CACHE[k] = v
    return v


def _scan_time_ms(make_step, init_carry, k, consume, reps=5):
    """Per-iteration DEVICE ms of `make_step` chained k times inside one jit
    (the carry dependency prevents elision).

    Two harness artifacts are kept out of the numbers (round-5 fix):
      * the final carry is reduced to ONE scalar inside the jit, so the
        readback is O(4 bytes), not O(carry bytes) — the tunnel fetches
        ~95 MB/s, and stages that carried multi-MB arrays (segmentation's
        6.1 MB cloud, the 24.5 MB batch-4 cloud) were inflated by fetch/k:
        the round-4 "segmentation_batch4 (big carry) > frontend_batch4
        (scalar carry)" contradiction was EXACTLY this artifact;
      * the empty-chain overhead (`_harness_overhead_ms`: dispatch + ~25 ms
        tunnel round trip per run) is measured separately and subtracted.

    Returns (median_ms, spread_ms, min_ms) over `reps` timed runs.  Round-4
    verdict: single-shot stage timings on a tunneled chip vary up to 67%
    run-to-run — every stage reports its median AND the max-min spread, so
    two bench runs can be judged "agreeing within spread".  `min_ms` serves
    the chain-floor measurements (a latency floor wants the fastest clean
    observation)."""

    @jax.jit
    def run(carry):
        final = jax.lax.scan(lambda c, _: (make_step(c), None), carry, None,
                             length=k)[0]
        tot = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(final):
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    over = _harness_overhead_ms(k)
    consume(run(init_carry))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        consume(run(init_carry))
        ts.append(max((time.time() - t0) / k * 1000.0 - over, 0.0))
    ts = np.sort(np.asarray(ts))
    return float(np.median(ts)), float(ts[-1] - ts[0]), float(ts[0])


def _pyramid_floor_ms(h, w, levels):
    """Roofline floor of the pyramid stage: max(MXU FLOPs, HBM bytes) over
    all levels x {gray, depth} pyrDown banded matmuls + gradient passes."""
    flops = 0.0
    bytes_ = 0.0
    hh, ww = h, w
    for _ in range(levels - 1):
        # banded matmuls A(h/2, h) @ img(h, w) @ B(w, w/2), two channels
        flops += 2 * (hh / 2 * hh * ww + hh / 2 * ww * ww / 2) * 2
        bytes_ += 2 * (hh * ww + hh / 2 * ww / 2) * 4
        hh, ww = hh // 2, ww // 2
    # gradients: 4 output arrays per level, ~4 elementwise passes each
    hh, ww = h, w
    for _ in range(levels):
        bytes_ += 4 * 4 * hh * ww * 4
        hh, ww = hh // 2, ww // 2
    flop_ms = flops / (MXU_F32_TFLOPS * 1e12) * 1e3
    bw_ms = bytes_ / (HBM_GBPS * 1e9) * 1e3
    return max(flop_ms, bw_ms)


def _segmentation_floor_ms(s, h, w, cc_iters):
    """HBM floor of segmentation: cc_iters min-scan passes over the
    per-sensor label grids (~6 array touches each) + normal/moment passes."""
    px = s * h * w
    bytes_ = cc_iters * 6 * px * 4 + 30 * px * 4
    return bytes_ / (HBM_GBPS * 1e9) * 1e3


# ---- sequential-chain latency floors (round-4 honest-floor methodology) ----
#
# Several stages (segmentation's CC doubling chain, the PCG inner loop, the
# pyramid's per-level chain) are bound by SEQUENTIAL KERNEL-STEP LATENCY,
# not HBM bytes or MXU flops — an arithmetic roofline under-states their
# floor by 10-100x and makes `achieved_fraction` meaningless (round-3
# review).  The defensible floor is MEASURED: run the SAME loop body at
# negligible arithmetic size (tiny tensors, identical sequential structure)
# — what remains is pure chain latency, a hard lower bound for the
# full-size stage.  Each latency-bound stage's bound becomes
# max(arithmetic floor, tiny-size measured chain floor).


def _tiny_chain_floors(builder, cfg):
    """Measured sequential-chain latency floors (ms) for the latency-bound
    stages: {'seg', 'pyr', 'pcg_per_lm_iter', 'dense_lm_per_iter'}."""
    from dataclasses import replace as _replace

    from rgbd360_tpu.slam.graph import (
        PoseGraph,
        optimize_pose_graph,
        optimize_pose_graph_pcg,
    )
    from rgbd360_tpu.registration import dense as D
    from rgbd360_tpu.ops import se3

    floors = {}

    # segmentation: same kernels + cc_iters chain on an 8x(8x24) cloud
    rt_p = builder._params["rt"]
    s = rt_p.shape[0]
    tiny_xyz = jnp.zeros((s, 8, 24, 3), jnp.float32).at[..., 2].set(2.0)
    tiny_rgb = jnp.zeros((s, 8, 24, 3), jnp.float32)
    tiny_ok = jnp.ones((s, 8, 24), bool)

    def seg_step(carry):
        ps = builder._segment_impl(rt_p, carry, tiny_rgb, tiny_ok)
        return carry + ps.area[0] * 0

    floors["seg"] = _scan_time_ms(
        seg_step, tiny_xyz, 32, lambda o: np.asarray(o)
    )[2]

    # pyramid: same per-level chain on a 64x384 sphere (1/25th the pixels)
    tiny_g = jnp.zeros((64, 384), jnp.float32)
    tiny_d = jnp.ones((64, 384), jnp.float32)

    def pyr_step(carry):
        pyr = D.build_frame_pyramid(carry, tiny_d, cfg)
        return carry + pyr.gray[-1][0, 0] * 0

    floors["pyr"] = _scan_time_ms(
        pyr_step, tiny_g, 32, lambda o: np.asarray(o)
    )[2]

    # pose-graph solvers: ONE LM iteration on an 8-KF ring (the inner CG
    # runs its full 100 iterations — cg_tol=0 — so the chain is identical
    # to the full-size stage's; only the tensor sizes shrink)
    n8 = 8
    g8 = PoseGraph.empty(n8, n8)
    rels = jax.vmap(
        lambda i: se3.se3_exp(jnp.array([0.1, 0, 0, 0, 0.05, 0]))
    )(jnp.arange(n8 - 1))
    g8 = PoseGraph(
        poses=g8.poses,
        vmask=jnp.ones((n8,), bool),
        edges_ij=g8.edges_ij.at[: n8 - 1].set(
            jnp.stack([jnp.arange(n8 - 1), jnp.arange(1, n8)], 1).astype(
                jnp.int32
            )
        ),
        rel=g8.rel.at[: n8 - 1].set(rels),
        info=g8.info,
        emask=g8.emask.at[: n8 - 1].set(True),
    )

    def mk_step(opt, **kw):
        def step(poses):
            p2, chi2, _ = opt(_replace(g8, poses=poses), max_iters=1, **kw)
            return p2 + chi2 * 0

        return step

    floors["pcg_per_lm_iter"] = _scan_time_ms(
        mk_step(optimize_pose_graph_pcg, cg_tol=0.0), g8.poses, 8,
        lambda o: np.asarray(o),
    )[2]
    floors["dense_lm_per_iter"] = _scan_time_ms(
        mk_step(optimize_pose_graph), g8.poses, 8, lambda o: np.asarray(o)
    )[2]
    return floors


def _bench_stages(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid):
    """Per-stage table (the BASELINE.md measured rows, as JSON)."""
    from rgbd360_tpu.registration import dense as D

    stages = {}
    params = builder._params
    rgb = jnp.stack([jnp.asarray(r.rgb) for r in (raw1, raw2)])
    depth = jnp.stack([jnp.asarray(r.depth_mm) for r in (raw1, raw2)])
    sph_cfg = builder.config.sphere
    sphere_rows = sph_cfg.height * sph_cfg.width
    chain = _tiny_chain_floors(builder, cfg)

    # ---- frame build (undistort + stitch + gray): alternate the two real
    # captures; the carry picks which input feeds the next iteration
    def build_step(carry):
        i = carry % 2
        sg, sd = builder._build_gray_depth_batch_impl(
            params, rgb[i][None], depth[i][None]
        )
        return carry + 1 + (sg[0, 0, 0] * 0).astype(jnp.int32)

    build_ms, build_sp, _ = _scan_time_ms(
        build_step, jnp.int32(0), 32, lambda o: np.asarray(o)
    )
    stages["frame_build"] = {
        "value": round(build_ms, 3),
        "spread_ms": round(build_sp, 3),
        "unit": "ms/frame",
        "attribution": (
            "614k-row stitch gather at the ~5 ns/row TPU gather latency "
            "floor (docs/PERFORMANCE.md); undistort and gray are fused "
            "elementwise"
        ),
        "bound": _bound(
            "gather-row latency", sphere_rows * GATHER_MS_PER_ROW, build_ms,
            "5 ns/row flat-index gather",
        ),
    }

    # ---- pyramid build
    f1 = builder.build_from_raw(raw1)

    def pyr_step(carry):
        pyr = D.build_frame_pyramid(carry, f1.sphere_depth, cfg, seam_valid)
        return carry + pyr.gray[-1][0, 0] * 0

    pyr_ms, pyr_sp, _ = _scan_time_ms(
        pyr_step, f1.sphere_gray, 32, lambda o: np.asarray(o)
    )
    pyr_floor = max(
        _pyramid_floor_ms(sph_cfg.height, sph_cfg.width, cfg.pyramid_levels),
        chain["pyr"],
    )
    stages["pyramid_build"] = {
        "value": round(pyr_ms, 3),
        "spread_ms": round(pyr_sp, 3),
        "unit": "ms/frame",
        "attribution": (
            "banded-matmul pyrDown + 0/1-matmul depth block sums (MXU, zero "
            "gathers); bound by the per-level sequential kernel chain — "
            f"floor = the SAME chain measured at 1/25th size "
            f"({chain['pyr']:.2f} ms, pure chain latency)"
        ),
        "bound": _bound(
            "sequential chain latency", pyr_floor, pyr_ms,
            f"max(arith floor, tiny-size chain {chain['pyr']:.2f} ms)",
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
    # round trip leaked ~4 ms/frame into this row
    seg_ms, seg_sp, _ = _scan_time_ms(
        seg_step, sph1.local_xyz, 32, lambda o: np.asarray(o)
    )
    s_, hc, wc = sph1.cloud_valid.shape
    seg_hbm = _segmentation_floor_ms(s_, hc, wc, builder.config.seg.cc_iters)
    seg_floor = max(seg_hbm, chain["seg"])
    seg_bound_desc = (
        f"max(HBM {seg_hbm:.2f} ms, measured tiny-size chain "
        f"{chain['seg']:.2f} ms)"
    )
    stages["segmentation"] = {
        "value": round(seg_ms, 3),
        "spread_ms": round(seg_sp, 3),
        "unit": "ms/frame",
        "attribution": (
            "banded-matmul normal blur (round 3: was a 2.5 ms cumsum scan "
            "chain) + Hillis-Steele min-scan CC labeling + one-hot MXU "
            "moment matmuls; bound by the CC doubling chain's sequential "
            "steps — floor = the SAME kernel chain measured on an 8x24 "
            "cloud (pure chain latency; docs/PERFORMANCE.md round 4)"
        ),
        "bound": _bound(
            "sequential chain latency", seg_floor, seg_ms, seg_bound_desc
        ),
    }

    # ---- plane segmentation batched over 4 frames (the B=4 pipeline's
    # missing stage in round 2): same kernels, batch axis amortizes the
    # per-kernel overhead
    lx4 = jnp.stack([sph1.local_xyz] * BATCH)
    cr4 = jnp.stack([sph1.cloud_rgb] * BATCH)
    cv4 = jnp.stack([sph1.cloud_valid] * BATCH)

    def seg4_step(carry):
        ps = jax.vmap(
            lambda a: builder._segment_impl(rt_p, a, cr4[0], cv4[0])
        )(carry)
        return carry + ps.area[0, 0] * 0

    seg4_ms, seg4_sp, _ = _scan_time_ms(seg4_step, lx4, 16, lambda o: np.asarray(o))
    seg4_ms, seg4_sp = seg4_ms / BATCH, seg4_sp / BATCH
    stages["segmentation_batch4"] = {
        "value": round(seg4_ms, 3),
        "spread_ms": round(seg4_sp, 3),
        "unit": "ms/frame",
        "attribution": (
            "segment_planes vmapped over a 4-frame batch — measured NO "
            "amortization vs B=1: the stage is bound by sequential "
            "latency-floor chains (CC doubling steps), which a batch axis "
            "widens but does not shorten; the ideal floor divides the "
            "chain by 4 (one chain serves the batch), naming the real "
            "remaining headroom"
        ),
        "bound": _bound(
            "sequential chain latency",
            max(seg_hbm, chain["seg"] / BATCH), seg4_ms, seg_bound_desc,
        ),
    }

    # ---- COMPLETE frontend, batch-4: full build (incl. clouds), batched
    # segmentation, pyramids, dense align — every stage a SLAM frame pays,
    # in one scan step per 4 frames (round-2 review: the headline pipeline
    # must not exclude segmentation)
    sal_cfg, sal_al = cfg, aligner  # the 16k-salient throughput config
    rgb4 = jnp.stack([rgb[0], rgb[1], rgb[0], rgb[1]])
    depth4 = jnp.stack([depth[0], depth[1], depth[0], depth[1]])

    def frontend_step(carry):
        d4 = depth4 + (carry * 0).astype(depth4.dtype)
        sph = builder._build_batch_impl(params, rgb4, d4)
        ps = jax.vmap(
            lambda a, b, c: builder._segment_impl(rt_p, a, b, c)
        )(sph.local_xyz, sph.cloud_rgb, sph.cloud_valid)

        pyr_b = D.build_frame_pyramid_batch(
            sph.sphere_gray, sph.sphere_depth, sal_cfg, seam_valid
        )

        def one(pyr):
            res = sal_al._align_impl(pyr, trg_pyr, jnp.eye(4), D.PHOTO_DEPTH)
            return res.pose

        poses = jax.vmap(one)(pyr_b)
        return carry + poses[0, 0, 0] * 0 + ps.area[0, 0] * 0

    fe_ms, fe_sp, _ = _scan_time_ms(
        frontend_step, jnp.float32(0), 8, lambda o: np.asarray(o)
    )
    fe_ms, fe_sp = fe_ms / BATCH, fe_sp / BATCH
    fe_floor = (
        (sphere_rows / BATCH + sphere_rows / 4) * GATHER_MS_PER_ROW
        + max(seg_hbm, chain["seg"] / BATCH)
        + chain["pyr"] / BATCH
    )
    stages["frontend_batch4"] = {
        "value": round(1000.0 / fe_ms, 3),
        "ms_per_frame": round(fe_ms, 3),
        "spread_ms": round(fe_sp, 3),
        "unit": "frames/sec/chip (build+segment+pyramid+align)",
        "attribution": (
            "the COMPLETE per-frame SLAM frontend batched by 4: full build "
            "with clouds, vmapped 8-sensor segmentation, pyramids, "
            "16k-salient dense align — nothing excluded; floor = stitch "
            "gather /4 + align gather rows + segmentation chain/HBM + "
            "pyramid chain /4 (the composite's gap IS the sequential "
            "chains, itemized in docs/PERFORMANCE.md round 4)"
        ),
        "bound": _bound(
            "gather latency + sequential chains", fe_floor, fe_ms,
            "stitch/4 + align rows + max(seg HBM, seg chain/4) + pyr chain/4",
        ),
    }

    # ---- full dense alignment (5 levels, PHOTO_DEPTH, dense sweeps)
    from rgbd360_tpu.config import DenseRegConfig

    dense_cfg = DenseRegConfig()
    dense_al = D.DenseAligner(dense_cfg)
    src_pyr = D.build_frame_pyramid(
        f1.sphere_gray, f1.sphere_depth, cfg, seam_valid
    )

    def align_step(carry):
        res = dense_al._align_impl(src_pyr, trg_pyr, carry, D.PHOTO_DEPTH)
        # feed the solved pose back as the next seed: a real dependency
        return res.pose

    align_ms, align_sp, _ = _scan_time_ms(
        align_step, jnp.eye(4), 32, lambda o: np.asarray(o)
    )
    # rows actually gathered: (iters + 1 converged re-eval) sweeps per level
    res_probe = dense_al._align_impl(src_pyr, trg_pyr, jnp.eye(4), D.PHOTO_DEPTH)
    iters = np.asarray(res_probe.iters)
    lvl_px = [
        sphere_rows / 4**lvl for lvl in range(dense_cfg.pyramid_levels)
    ]
    align_rows = sum(
        (int(iters[lvl]) + 1) * lvl_px[lvl]
        for lvl in range(dense_cfg.pyramid_levels)
    )
    stages["dense_align"] = {
        "value": round(align_ms, 3),
        "spread_ms": round(align_sp, 3),
        "unit": "ms/align",
        "attribution": (
            "GN sweeps are per-row gather-latency-bound (flat-index target "
            "gather); H/g assembly rides the MXU"
        ),
        "bound": _bound(
            "gather-row latency", align_rows * GATHER_MS_PER_ROW, align_ms,
            f"5 ns/row over {int(align_rows)} gathered rows "
            f"(measured per-level iters {iters.tolist()})",
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

    # per-LM-iteration floors: max(arithmetic roofline, the SAME solver's
    # measured per-iteration latency on an 8-KF graph — the sequential
    # chain every iteration pays regardless of size: 100 CG steps for the
    # PCG, the blocked-LU panel chain for the dense LM)
    lm_floor_ms = max(
        ((6 * n_v) ** 3 / 3) / (MXU_F32_TFLOPS * 1e12) * 1e3,
        chain["dense_lm_per_iter"],
    )
    pcg_floor_ms = max(
        100 * n_e * (36 + 12) * 4 * 2 / (HBM_GBPS * 1e9) * 1e3,
        chain["pcg_per_lm_iter"],
    )
    for name, fn, iters_n, floor_ms, desc in (
        ("ba_dense_lm", optimize_pose_graph, 10, lm_floor_ms,
         f"max(MXU LU flops, tiny-graph chain "
         f"{chain['dense_lm_per_iter']:.2f} ms/iter)"),
        ("ba_pcg", optimize_pose_graph_pcg, 10, pcg_floor_ms,
         f"max(HBM edge-sweep bytes, tiny-graph 100-step CG chain "
         f"{chain['pcg_per_lm_iter']:.2f} ms/iter)"),
    ):
        out = fn(graph, iters_n)  # compile + warm
        _ = int(out[2])  # scalar fetch forces completion (axon's
        # block_until_ready does not synchronize the tunnel)
        rt_s = _harness_overhead_ms(1) / 1000.0  # dispatch+fetch round trip
        rates = []
        for _ in range(5):
            t0 = time.time()
            out = fn(graph, iters_n)
            n_it = max(int(out[2]), 1)
            rates.append(n_it / max(time.time() - t0 - rt_s, 1e-6))
        rates = np.sort(np.asarray(rates))
        rate = float(np.median(rates))
        stages[name] = {
            "value": round(rate, 3),
            "spread_ms": round(
                1000.0 / rates[0] - 1000.0 / rates[-1], 3
            ),
            "unit": f"LM iters/sec ({n_v} KF, {n_e} edges)",
            "attribution": (
                "dense (N,N,6,6) assembly + one MXU solve per iter"
                if name == "ba_dense_lm"
                else "matrix-free block-Jacobi PCG; HBM-bandwidth-bound "
                "edge sweeps"
            ),
            "bound": _bound(
                "MXU flops / chain latency"
                if name == "ba_dense_lm"
                else "CG chain latency",
                floor_ms, 1000.0 / rate, desc,
            ),
        }
    return stages


def _bench_slam_frontend(builder, stages):
    """MEASURED production tracker: N sequential frames of the REAL
    `KeyframeSLAM.process(raw)` (fused single-dispatch tracking path) on a
    rendered full-resolution sequence, keyframe events amortized.

    This is the number the round-2 review asked to replace the derived one:
    the per-frame wall time of the actual tracker loop, host logic, fetches
    and all.  On this harness every dispatch+fetch pays a fixed ~30 ms
    TUNNEL round trip that does not exist on a directly-attached TPU host,
    so the stage also reports the measured empty-dispatch round trip and
    the tunnel-corrected rate (raw_ms - roundtrips_per_frame * tunnel_ms)."""
    from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
    from rgbd360_tpu.slam.odometry import KeyframeSLAM

    import types

    rt = np.asarray(builder.rt, np.float64)
    n = 48
    gt = synth_trajectory_poses("loop", n, radius=0.8)
    raws = [
        synth_capture(i, rt=rt, pose=gt[i], room="octagon") for i in range(n)
    ]
    # pre-stage every capture in HBM — the production methodology (the
    # SequenceDataset prefetch thread streams frames ahead of compute); on
    # this harness it also keeps the ~30 MB/s tunnel's 2.3 MB/frame upload
    # (~75 ms, a link artifact) out of the per-frame numbers
    up0 = time.time()
    dev = [
        types.SimpleNamespace(
            rgb=jnp.asarray(r.rgb), depth_mm=jnp.asarray(r.depth_mm)
        )
        for r in raws
    ]
    jax.block_until_ready([d.rgb for d in dev])
    upload_ms = (time.time() - up0) / n * 1000.0

    slam = KeyframeSLAM(builder)
    # WARMUP LAP: run the whole sequence once so every program in the loop
    # compiles (fused tracking, KF promotion, connections, LC verify +
    # rescue, optimizer, partition), then reset the session keeping the
    # compiled programs — the timed lap measures execution, not XLA.
    for raw in dev:
        slam.process(raw)
    slam.flush()
    slam.reset()

    # measured empty dispatch+fetch round trip (the tunnel constant)
    trip = jax.jit(lambda x: x + 1)
    np.asarray(trip(jnp.float32(0)))
    t0 = time.time()
    reps = 10
    for i in range(reps):
        np.asarray(trip(jnp.float32(i)))
    tunnel_ms = (time.time() - t0) / reps * 1000.0

    times = []
    events = []
    t0 = time.time()
    for raw in dev:
        f0 = time.time()
        events.append(slam.process(raw))
        times.append(time.time() - f0)
    wall = time.time() - t0
    t_flush = time.time()
    slam.flush()  # apply any still-deferred keyframe-event work
    flush_ms = (time.time() - t_flush) * 1000.0
    raw_ms = wall / n * 1000.0
    fused = slam.timer.counts.get("fused_track", 0)
    n_kf = int(slam.map.n_kf)
    tr_ms = [
        t * 1e3 for t, e in zip(times, events) if not e.get("keyframe")
    ]
    kf_ms = [t * 1e3 for t, e in zip(times, events) if e.get("keyframe")]
    med_tr = float(np.median(tr_ms)) if tr_ms else 0.0
    med_kf = float(np.median(kf_ms)) if kf_ms else 0.0
    # frame-to-frame GAP with keyframe events overlapped (the async event
    # pipeline): p99 over ALL frames — the reference's background LC thread
    # keeps this near the tracked-frame time, and so must the deferred
    # pipeline (round-4 target: p99 within ~2x the median tracked frame)
    p99_gap = float(np.percentile(np.asarray(times) * 1e3, 99))
    kf_nd = slam.kf_event_dispatches
    med_nd = float(np.median(kf_nd)) if kf_nd else 0.0
    # common-case tracked frame = ONE fused dispatch + ONE fetch = 1 round
    # trip + the 2.3 MB capture upload; both are harness-link artifacts
    corrected_ms = max(med_tr - tunnel_ms, 0.05)
    stages["slam_frontend"] = {
        "value": round(1000.0 / raw_ms, 3),
        "unit": "frames/sec/chip (measured, sequential tracker)",
        "attribution": (
            f"MEASURED: {n} HBM-prestaged frames of KeyframeSLAM.process "
            f"after a full warmup lap (programs compiled, session reset), "
            f"{fused}/{n} on the fused single-dispatch path (1 dispatch + "
            f"1 fetch per tracked frame), {n_kf} keyframes; median tracked "
            f"frame {med_tr:.1f} ms, median keyframe FRAME {med_kf:.1f} ms "
            f"with the event work deferred (async pipeline: median "
            f"{med_nd:.0f} dispatches/KF event drain over later frames; "
            f"end-of-run flush {flush_ms:.0f} ms); p99 frame gap "
            f"{p99_gap:.1f} ms; the {tunnel_ms:.1f} ms harness tunnel round "
            f"trip rides every dispatch — tracked-frame rate net of it: "
            f"{1000.0 / corrected_ms:.1f} fps ({corrected_ms:.1f} ms "
            f"on-chip+host); capture upload measured separately at "
            f"{upload_ms:.1f} ms/frame over the tunnel (PCIe-negligible in "
            f"deployment, prefetched either way)"
        ),
        "dispatches_per_tracked_frame": 1,
        "dispatches_per_kf_event": round(med_nd, 1),
        "tunnel_roundtrip_ms": round(tunnel_ms, 2),
        "upload_ms_per_frame": round(upload_ms, 2),
        "median_tracked_ms": round(med_tr, 2),
        "median_keyframe_ms": round(med_kf, 2),
        "p99_gap_ms": round(p99_gap, 2),
        "tracked_fps_net_of_tunnel": round(1000.0 / corrected_ms, 2),
    }
    return stages


def _self_check(stages: dict) -> list:
    """Internal-consistency gate (round-4 verdict: segmentation_batch4
    reported 7.11 ms/frame while frontend_batch4 — whose program CONTAINS
    the same vmapped segmentation — reported 4.38 ms/frame total, and
    nobody noticed).  A component must not out-cost its composite beyond
    the two measurements' combined run-to-run spread; violations are
    recorded in the summary (and the compact line) so they are
    machine-visible, never silently published."""
    out = []

    def check(comp_name, comp_ms, comp_sp, composite_name, total_ms, total_sp):
        tol = comp_sp + total_sp + 0.05 * total_ms
        if comp_ms > total_ms + tol:
            out.append(
                {
                    "component": comp_name,
                    "component_ms": round(comp_ms, 3),
                    "composite": composite_name,
                    "composite_ms": round(total_ms, 3),
                    "tolerance_ms": round(tol, 3),
                }
            )

    fe = stages.get("frontend_batch4")
    s4 = stages.get("segmentation_batch4")
    if fe and s4:
        check(
            "segmentation_batch4", s4["value"], s4.get("spread_ms", 0.0),
            "frontend_batch4", fe["ms_per_frame"], fe.get("spread_ms", 0.0),
        )
    return out


def _write_baseline_section(summary: dict) -> None:
    """Regenerate BASELINE.md's auto-measured table from THE SAME summary
    the bench just emitted (round-4 verdict: the hand-written BASELINE
    table and the driver's scoring artifact disagreed by up to 67% because
    they came from different runs).  The section lives between sentinel
    comments; everything else in BASELINE.md is left untouched."""
    import pathlib

    path = pathlib.Path(__file__).with_name("BASELINE.md")
    if not path.exists():
        return
    begin, end = "<!-- BENCH_AUTO_BEGIN -->", "<!-- BENCH_AUTO_END -->"
    rows = [
        "| Stage | Value (median) | Spread | Floor fraction |",
        "|---|---|---|---|",
    ]
    for name, st in summary["stages"].items():
        sp = st.get("spread_ms", st.get("spread_fps"))
        sp_s = "—" if sp is None else f"{sp}"
        frac = st.get("bound", {}).get("achieved_fraction", "—")
        rows.append(f"| {name} | {st['value']} {st['unit']} | {sp_s} | {frac} |")
    sf = summary["stages"].get("slam_frontend", {})
    extra = ""
    if sf:
        extra = (
            f"\nTracker detail: median tracked {sf.get('median_tracked_ms')} ms, "
            f"median keyframe FRAME {sf.get('median_keyframe_ms')} ms, p99 gap "
            f"{sf.get('p99_gap_ms')} ms, {sf.get('dispatches_per_kf_event')} "
            f"dispatches/KF event, tunnel round trip "
            f"{sf.get('tunnel_roundtrip_ms')} ms, tracked fps net of tunnel "
            f"{sf.get('tracked_fps_net_of_tunnel')}.\n"
        )
    cons = summary.get("consistency", [])
    cons_s = (
        "All component-vs-composite self-checks passed."
        if not cons
        else f"CONSISTENCY VIOLATIONS: {json.dumps(cons)}"
    )
    section = (
        f"{begin}\n"
        f"### Auto-measured table (regenerated by every `bench.py` run; "
        f"spreads are max-min over >=5 timed repeats)\n\n"
        f"Headline: {summary['value']} {summary['unit']} "
        f"({summary['vs_baseline']}x the measured CPU proxy baseline of "
        f"{REF_CPU_FPS} fps).  Full detail: `BENCH_DETAIL.json`.\n\n"
        + "\n".join(rows)
        + "\n" + extra + "\n" + cons_s + "\n" + end
    )
    text = path.read_text()
    if begin in text and end in text:
        pre = text.split(begin)[0]
        post = text.split(end)[1]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n## Measured (auto, latest bench run)\n\n" + section + "\n"
    path.write_text(text)


def compact_line(summary: dict, limit: int = 1500) -> str:
    """The ONE stdout JSON line, kept compact: the driver records only the
    LAST ~2000 chars of output, and round 3's full-detail line (4.6 kB)
    overflowed that window and failed to parse (`BENCH_r03.json parsed:
    null`).  Full detail (attributions, bound descriptions) goes to
    BENCH_DETAIL.json instead; the stdout line carries every numeric result
    but no prose, and is asserted under `limit` chars."""
    comp = {
        "metric": summary["metric"],
        "value": summary["value"],
        "unit": summary["unit"],
        "vs_baseline": summary["vs_baseline"],
        "chip_utilization": summary["chip_utilization"],
        "consistency_violations": len(summary.get("consistency", [])),
        "detail": "BENCH_DETAIL.json",
        "stages": {},
    }
    for name, st in summary["stages"].items():
        e = {"value": st["value"]}
        if "spread_ms" in st:
            e["sp"] = st["spread_ms"]
        if "bound" in st:
            e["frac"] = st["bound"]["achieved_fraction"]
        for k in (
            "dispatches_per_tracked_frame",
            "dispatches_per_kf_event",
            "median_tracked_ms",
            "median_keyframe_ms",
            "p99_gap_ms",
            "tracked_fps_net_of_tunnel",
            "tunnel_roundtrip_ms",
        ):
            if k in st:
                e[k] = st[k]
        comp["stages"][name] = e
    line = json.dumps(comp, separators=(",", ":"))
    if len(line) > limit:  # drop per-stage extras before the whole table
        comp["stages"] = {
            n: {"value": s["value"], "frac": s.get("frac")}
            for n, s in comp["stages"].items()
        }
        line = json.dumps(comp, separators=(",", ":"))
    if len(line) > limit:
        comp.pop("stages")
        line = json.dumps(comp, separators=(",", ":"))
    assert len(line) <= limit, len(line)
    return line


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

    fps, fps_spread = _bench_pipeline(
        builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid
    )
    stages = _bench_stages(builder, raw1, raw2, cfg, aligner, trg_pyr, seam_valid)
    sph = builder.config.sphere
    pipe_ms = 1000.0 / fps
    # pipeline roofline: the batch-amortized stitch gather + the salient
    # alignment gather rows per frame
    pipe_floor = (
        sph.height * sph.width / BATCH  # one stitch gather per 4 frames
        + sph.height * sph.width / 4  # ~level-1-dominated GN sweeps
    ) * GATHER_MS_PER_ROW
    stages["pipeline_batch4"] = {
        "value": round(fps, 3),
        "spread_fps": round(fps_spread, 3),
        "unit": "frames/sec/chip",
        "attribution": (
            "one calibration-fixed row gather stitches all 4 frames; "
            "vmapped GN levels; gather latency sets the ceiling"
        ),
        "bound": _bound(
            "gather-row latency", pipe_floor, pipe_ms,
            "5 ns/row; stitch amortized over the 4-frame batch",
        ),
    }
    stages = _bench_slam_frontend(builder, stages)
    consistency = _self_check(stages)

    summary = {
        "metric": "registration_pipeline_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REF_CPU_FPS, 3),
        "chip_utilization": stages["pipeline_batch4"]["bound"][
            "achieved_fraction"
        ],
        "consistency": consistency,
        "stages": stages,
    }
    import pathlib

    pathlib.Path(__file__).with_name("BENCH_DETAIL.json").write_text(
        json.dumps(summary, indent=1)
    )
    _write_baseline_section(summary)
    print(compact_line(summary))


if __name__ == "__main__":
    main()
