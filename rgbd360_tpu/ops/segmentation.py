"""Organized multi-plane segmentation on TPU.

Replaces the PCL pipeline used by the reference (`IntegralImageNormalEstimation`
+ `OrganizedMultiPlaneSegmentation`, reference `include/Frame360.h:949-977`)
with an XLA-friendly formulation:

  1. normals from smoothed organized-cloud gradients (AVERAGE_3D_GRADIENT
     analogue) — box-filtered tangent vectors + cross product;
  2. planar region growing as connected-component labeling: a pixel connects
     to its 4-neighbors when their normals agree within the angular threshold
     and their points lie within the distance threshold of each other's
     plane; components found by iterated min-label propagation with pointer
     jumping (fixed iteration count — compiler-friendly);
  3. per-component statistics via segment_sum: centroid, covariance
     eigendecomposition -> refined normal + curvature (the
     `segmentAndRefine` equivalent), inlier count, hue histogram;
  4. fixed-capacity padded output (`PlaneSet`) with validity masks, gated by
     min_inliers / max_curvature / min_area / max_elongation exactly like
     the reference (`include/Frame360.h:952-1034`,
     `include/Miscellaneous.h:51-76`).

The polygonal contour is approximated by extreme points along `hull_dirs`
in-plane directions (the hull is only consumed through area and
point-to-polygon distances, SURVEY.md section 7)."""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import SegmentationConfig


@jax.tree_util.register_dataclass
@dataclass
class PlaneSet:
    """Fixed-capacity padded plane set (leading axes = batch, then K planes).

    normal:    (K, 3) unit, oriented toward the viewpoint
    center:    (K, 3)
    d:         (K,) plane offset, n . x + d = 0 with d = -n . c
    curvature: (K,)
    area:      (K,) convex-hull area (m^2)
    elongation:(K,) hull axis ratio
    n_inliers: (K,)
    hull:      (K, R, 3) polygon contour (extreme points, CCW in plane)
    hue_hist:  (K, 37) normalized H histogram (36 hue bins + gray bin),
               mirroring mrpt::pbmap Plane::calcPlaneHistH
    main_color:(K, 3) dominant rgb (0..1)
    valid:     (K,) bool
    """

    normal: jnp.ndarray
    center: jnp.ndarray
    d: jnp.ndarray
    curvature: jnp.ndarray
    area: jnp.ndarray
    elongation: jnp.ndarray
    n_inliers: jnp.ndarray
    hull: jnp.ndarray
    hue_hist: jnp.ndarray
    main_color: jnp.ndarray
    valid: jnp.ndarray


import functools


@functools.lru_cache(maxsize=16)
def _box_band(n: int, k: int):
    """(n, n) float32 matrix EXACTLY reproducing the former
    cumsum-of-edge-padded box filter: out_i = (c[b_i] - c[a_i]) / k with
    c = cumsum, a_i = clip(i - k//2 - 1, 0, n-1), b_i = clip(i + k - k//2
    - 1, 0, n-1) — i.e. window (a_i, b_i], uniform 1/k weights, truncated
    (NOT renormalized) at the borders.  The boundary weighting is part of
    the validated normal-estimation behavior (a "corrected" clamped window
    shifts border normals enough to change half-res plane matching —
    measured in the soak).  A banded matmul runs on the MXU in one pass;
    the cumsum form lowered to a chain of log-step scan kernels that
    dominated the normal-estimation stage (2.5 of the 6.3 ms stage)."""
    import numpy as _np

    a = _np.zeros((n, n), _np.float32)
    lpad = k // 2 + 1
    for i in range(n):
        lo = min(max(i - lpad, 0), n - 1)
        hi = min(max(i + k - lpad, 0), n - 1)
        a[i, lo + 1 : hi + 1] = 1.0 / k
    return a


def _box_blur(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable box blur over the last two axes as banded MXU matmuls.

    The contractions are written as einsums with every leading axis (sensor
    vmap, channel, frame batch) flattened into ONE free dimension, so each
    pass lowers to a single large matmul: the broadcast-batched
    `matmul(a_h, x)` form emitted 8x4 small (120,120)@(120,160) MXU calls
    per frame under the sensor vmap, and their per-kernel overhead — not
    FLOPs — dominated the whole segmentation stage (measured 2.47 ms of the
    3.8 ms stage, round 5; the restructured pass pair is one (H,H)@(H, B*W)
    and one (B*H, W)@(W, W) matmul)."""
    if k <= 1:
        return x
    hi = jax.lax.Precision.HIGHEST
    h, w = x.shape[-2], x.shape[-1]
    a_h = jnp.asarray(_box_band(h, k))
    a_w = jnp.asarray(_box_band(w, k))
    x = jnp.einsum("ih,...hw->...iw", a_h, x, precision=hi)
    return jnp.einsum("...hw,jw->...hj", x, a_w, precision=hi)


def estimate_normals(
    xyz: jnp.ndarray, valid: jnp.ndarray, smoothing: int = 8
) -> jnp.ndarray:
    """Organized normal estimation (PCL AVERAGE_3D_GRADIENT analogue).

    xyz: (..., H, W, 3) organized points (NaN/garbage where ~valid);
    returns unit normals oriented toward the origin (viewpoint), zero where
    undefined.
    """
    p = jnp.where(valid[..., None], xyz, 0.0)
    w = valid.astype(xyz.dtype)[..., None]
    ps = _box_blur(jnp.moveaxis(p, -1, -3), smoothing)
    ws = _box_blur(jnp.moveaxis(w, -1, -3), smoothing)
    sm = jnp.moveaxis(ps / jnp.maximum(ws, 1e-6), -3, -1)  # smoothed points

    du = 0.5 * (jnp.roll(sm, -1, axis=-2) - jnp.roll(sm, 1, axis=-2))
    dv = 0.5 * (jnp.roll(sm, -1, axis=-3) - jnp.roll(sm, 1, axis=-3))
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward viewpoint (camera at origin): n . p < 0
    flip = jnp.sum(n * sm, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where(valid[..., None] & (norm > 1e-9), n, 0.0)


def _seg_min_scan(lab, r_fwd, r_bwd, axis):
    """Min within each contiguous compatible run along `axis`, both
    directions, in ONE Hillis-Steele doubling chain.

    Each doubling step is mathematically identical to
    `lax.associative_scan(combine, (lab, brk))` with
    combine((m1,r1),(m2,r2)) = (r2 ? m2 : min(m1,m2), r1|r2), but lowers to
    ~log2(n) fused elementwise kernels instead of associative_scan's
    pad/slice chains (which cost ~0.2 ms apiece on TPU and dominated the
    labeling loop).

    The backward scan of x equals the forward scan of flip(x), so the two
    directions ride a single doubling loop stacked along a new leading axis:
    the chain is the binding resource of this stage (sequential kernel
    latency, docs/PERFORMANCE.md round 4-5), and stacking halves its length
    for free — the kernels get 2x wider, which latency-bound shapes don't
    notice."""
    ax = axis % lab.ndim
    n = lab.shape[ax]
    sax = ax + 1  # scan axis after the direction-stack
    v = jnp.stack([lab, jnp.flip(lab, ax)])
    f = jnp.stack([r_fwd, jnp.flip(r_bwd, ax)])
    shape = [1] * v.ndim
    shape[sax] = n
    idx = jnp.arange(n).reshape(shape)
    d = 1
    while d < n:
        # ok-gating keeps jnp.roll's wrap-around from leaking values across
        # the row edge (the edge break alone does not protect i < d reads)
        ok = idx >= d
        vp = jnp.roll(v, d, sax)
        fp = jnp.roll(f, d, sax)
        v = jnp.where(ok & ~f, jnp.minimum(v, vp), v)
        f = jnp.where(ok, f | fp, f)
        d *= 2
    return jnp.minimum(v[0], jnp.flip(v[1], ax))


def _connected_labels(compat_r, compat_c, valid, iters: int) -> jnp.ndarray:
    """Connected components by alternating row/column segmented min-scans.

    compat_r: (H-1, W) connectivity between (r, c) and (r+1, c);
    compat_c: (H, W-1) connectivity between (r, c) and (r, c+1).
    Returns int32 labels (H, W); invalid pixels get their own index.

    Each pass propagates the component-min label across an ENTIRE row/column
    run at once (associative scan), so a handful of alternations converge
    where plain 4-neighbour diffusion needed dozens — and, unlike pointer
    jumping, there are no data-dependent gathers (the former hot spot: 48
    gathers per frame at ~1.2 ms each on TPU).
    """
    h, w = valid.shape
    lab = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    # run-break masks, hoisted out of the loop (loop-invariant)
    brk_c = ~compat_c
    brk_r = ~compat_r
    edge_c = jnp.ones((h, 1), bool)
    edge_r = jnp.ones((1, w), bool)
    rc_f = jnp.concatenate([edge_c, brk_c], axis=1)
    rc_b = jnp.concatenate([brk_c, edge_c], axis=1)
    rr_f = jnp.concatenate([edge_r, brk_r], axis=0)
    rr_b = jnp.concatenate([brk_r, edge_r], axis=0)
    # each alternation strictly dominates one diffusion step; regions in
    # organized depth images converge in a few passes.  (A Pallas-fused
    # form of this whole loop was built and measured at exact parity with
    # this XLA chain — 1.31 vs 1.32 ms on the v5e — XLA already fuses the
    # roll/min chain into few kernels; the simpler form stays.  The
    # stage's real cost was the cumsum box blur in estimate_normals, now a
    # banded MXU matmul.  docs/PERFORMANCE.md round 3.)
    n_alt = max(2, min(iters, 8))

    def step(_, lab):
        lab = _seg_min_scan(lab, rc_f, rc_b, axis=1)
        lab = _seg_min_scan(lab, rr_f, rr_b, axis=0)
        return lab

    return jax.lax.fori_loop(0, n_alt, step, lab)


def _rgb_to_hue_hist(rgb, weights, num_segments):
    """Per-segment hue histogram (36 hue bins + 1 low-saturation bin),
    mirroring mrpt::pbmap `Plane::calcPlaneHistH` semantics."""
    r, g, b = rgb[..., 2] / 255.0, rgb[..., 1] / 255.0, rgb[..., 0] / 255.0
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.maximum(diff, 1e-6)
    hue = jnp.where(
        mx == r, (g - b) / safe % 6.0, jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0)
    ) * 60.0
    sat = diff / jnp.maximum(mx, 1e-6)
    gray = (sat < 0.1) | (mx < 0.1)
    bin_idx = jnp.where(gray, 36, jnp.clip(hue / 10.0, 0, 35.999).astype(jnp.int32))
    return bin_idx


def segment_planes_sensor(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: SegmentationConfig = SegmentationConfig(),
) -> PlaneSet:
    """Segment planes in one organized sensor cloud (camera frame).

    xyz: (H, W, 3); rgb: (H, W, 3) BGR 0..255; valid: (H, W) bool.
    Returns a PlaneSet with capacity cfg.max_planes_sensor in the SAME frame
    as xyz (transform afterwards, like the reference transforms planes by Rt,
    `include/Frame360.h:1040`).
    """
    h, w = valid.shape
    k_cap = cfg.max_planes_sensor
    normals = estimate_normals(xyz, valid, cfg.normal_smoothing_size)

    p = jnp.where(valid[..., None], xyz, 0.0)
    cos_gate = math.cos(cfg.angular_threshold)

    def edge_compat(pa, na, va, pb, nb, vb):
        cos = jnp.sum(na * nb, axis=-1)
        dp = pb - pa
        # symmetric point-to-plane gate
        dist_a = jnp.abs(jnp.sum(na * dp, axis=-1))
        dist_b = jnp.abs(jnp.sum(nb * dp, axis=-1))
        return (
            va
            & vb
            & (cos > cos_gate)
            & (dist_a < cfg.distance_threshold)
            & (dist_b < cfg.distance_threshold)
        )

    compat_r = edge_compat(
        p[:-1], normals[:-1], valid[:-1], p[1:], normals[1:], valid[1:]
    )
    compat_c = edge_compat(
        p[:, :-1], normals[:, :-1], valid[:, :-1], p[:, 1:], normals[:, 1:], valid[:, 1:]
    )

    labels = _connected_labels(compat_r, compat_c, valid, cfg.cc_iters)
    flat_lab = jnp.where(valid, labels, h * w).reshape(-1)  # invalid -> bin h*w
    nbins = h * w + 1

    ones = valid.reshape(-1).astype(jnp.float32)
    # Label histogram WITHOUT a scatter (segment_sum is per-element
    # latency-bound, ~1.3 ms here): factor the bin index as hi*128 + lo and
    # accumulate the two-level one-hot outer product on the MXU —
    # counts2d = OneHotHi^T-free (n_hi, N) @ (N, 128) matmul; bf16 0/1
    # inputs with f32 accumulation keep integer counts exact.
    n_hi = (nbins + 127) // 128
    oh_hi = (flat_lab[None, :] // 128 == jnp.arange(n_hi)[:, None]).astype(
        jnp.bfloat16
    )
    oh_lo = (flat_lab[:, None] % 128 == jnp.arange(128)[None, :]).astype(jnp.bfloat16)
    counts = jnp.matmul(oh_hi, oh_lo, preferred_element_type=jnp.float32)
    counts = counts.reshape(-1)[:nbins]

    # top-K components by size
    k_counts, k_labels = jax.lax.top_k(counts[:-1], k_cap)
    seg_ok = k_counts >= cfg.min_inliers

    # pixel -> slot membership by DIRECT comparison against the K winning
    # labels: a (K, N) fused elementwise compare.  (The former form built a
    # label->slot table and gathered it per pixel — a 153k-row gather,
    # ~1.2 ms/frame; gathers/scatters are per-element latency-bound on TPU.)
    member = flat_lab[None, :] == k_labels[:, None]  # (K, N) bool

    pf = p.reshape(-1, 3)
    # Per-slot sums as ONE one-hot matmul on the MXU: with K<=16 slots the
    # (K, N) one-hot times (N, d) moment matrix is ~20 MFLOP, while the
    # equivalent segment_sum scatters ran ~8 ms/frame on TPU (scatter is
    # per-element latency-bound, like gather).
    onehot = member.astype(jnp.float32)  # (K, N)
    ppt = (pf[:, :, None] * pf[:, None, :]).reshape(-1, 9)
    moments = jnp.concatenate(
        [ones[:, None], pf * ones[:, None], ppt * ones[:, None]], axis=1
    )  # (N, 13)
    hi = jax.lax.Precision.HIGHEST  # full-f32 accumulation on the MXU
    segsum = jnp.matmul(onehot, moments, precision=hi)  # (K, 13)
    seg = lambda vals: jnp.matmul(
        onehot, vals if vals.ndim == 2 else vals[:, None], precision=hi
    )

    s1 = segsum[:, 0]
    sp = segsum[:, 1:4]
    spp = segsum[:, 4:13].reshape(-1, 3, 3)
    cnt = jnp.maximum(s1, 1.0)
    centroid = sp / cnt[:, None]
    cov = spp / cnt[:, None, None] - centroid[:, :, None] * centroid[:, None, :]

    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    normal = eigvec[..., 0]
    # orient toward viewpoint
    flip = jnp.sum(normal * centroid, axis=-1) > 0
    normal = jnp.where(flip[:, None], -normal, normal)
    curvature = eigval[:, 0] / jnp.maximum(jnp.sum(eigval, axis=1), 1e-12)
    d = -jnp.sum(normal * centroid, axis=-1)

    # in-plane basis for hull/elongation
    e1 = eigvec[..., 2]
    e2 = eigvec[..., 1]
    rel = pf[None, :, :] - centroid[:, None, :]  # (K, N, 3) -- N = H*W
    # NOTE: (K, H*W) coordinates; K<=16 keeps this small (~5 MB at 160x120).
    u = jnp.einsum("knj,kj->kn", rel, e1)
    v = jnp.einsum("knj,kj->kn", rel, e2)

    # extreme points along hull_dirs directions -> polygon
    angles = jnp.linspace(0, 2 * jnp.pi, cfg.hull_dirs, endpoint=False)
    proj = (
        u[:, None, :] * jnp.cos(angles)[None, :, None]
        + v[:, None, :] * jnp.sin(angles)[None, :, None]
    )  # (K, R, N)
    proj = jnp.where(member[:, None, :], proj, -jnp.inf)
    idx = jnp.argmax(proj, axis=-1)  # (K, R)
    hull_u = jnp.take_along_axis(u, idx, axis=1)
    hull_v = jnp.take_along_axis(v, idx, axis=1)
    hull = (
        centroid[:, None, :]
        + hull_u[..., None] * e1[:, None, :]
        + hull_v[..., None] * e2[:, None, :]
    )

    # shoelace area of the (u, v) polygon
    u2 = jnp.roll(hull_u, -1, axis=1)
    v2 = jnp.roll(hull_v, -1, axis=1)
    area = 0.5 * jnp.abs(jnp.sum(hull_u * v2 - u2 * hull_v, axis=1))

    # elongation: ratio of hull extents along principal axes (PCL
    # calcElongationAndPpalDir analogue via segment covariance)
    lam1 = jnp.sqrt(jnp.maximum(eigval[:, 2], 1e-12))
    lam2 = jnp.sqrt(jnp.maximum(eigval[:, 1], 1e-12))
    elongation = lam1 / jnp.maximum(lam2, 1e-9)

    # hue histogram + main color
    rgbf = rgb.reshape(-1, 3)
    hue_bins = _rgb_to_hue_hist(rgbf, ones, k_cap)
    seg_hist = seg(jax.nn.one_hot(hue_bins, 37) * ones[:, None])
    hist = seg_hist / jnp.maximum(jnp.sum(seg_hist, axis=1, keepdims=True), 1.0)
    mean_rgb = seg(rgbf * ones[:, None]) / cnt[:, None] / 255.0

    plane_ok = (
        seg_ok
        & (area >= cfg.min_area)
        & (elongation <= cfg.max_elongation)
        & (curvature < cfg.max_curvature_estimate)  # curved-surface gate
    )

    return PlaneSet(
        normal=normal,
        center=centroid,
        d=d,
        curvature=curvature,
        area=area,
        elongation=elongation,
        n_inliers=s1,
        hull=hull,
        hue_hist=hist,
        main_color=mean_rgb[:, ::-1],  # BGR -> RGB
        valid=plane_ok,
    )


def vertical_planes_mask(
    planes: PlaneSet, dev_angle_deg: float = 5.0, up_axis: int = 1
) -> jnp.ndarray:
    """Mask of valid planes whose normal is horizontal within `dev_angle_deg`
    — i.e. vertical surfaces like walls (reference
    `Miscellaneous.h:getVerticalPlanes:208`, which keeps planes with
    |normal.y| < sin(5 deg) in its gravity frame)."""
    s = jnp.sin(jnp.deg2rad(dev_angle_deg))
    return planes.valid & (jnp.abs(planes.normal[..., up_axis]) < s)


def transform_planes(planes: PlaneSet, rt: jnp.ndarray) -> PlaneSet:
    """Rigidly transform a PlaneSet (reference `Plane::transform`)."""
    r, t = rt[:3, :3], rt[:3, 3]
    hi = jax.lax.Precision.HIGHEST  # bf16 rotation would tilt plane normals
    normal = jnp.matmul(planes.normal, r.T, precision=hi)
    center = jnp.matmul(planes.center, r.T, precision=hi) + t
    return PlaneSet(
        normal=normal,
        center=center,
        d=-jnp.sum(normal * center, axis=-1),
        curvature=planes.curvature,
        area=planes.area,
        elongation=planes.elongation,
        n_inliers=planes.n_inliers,
        hull=jnp.matmul(planes.hull, r.T, precision=hi) + t,
        hue_hist=planes.hue_hist,
        main_color=planes.main_color,
        valid=planes.valid,
    )


def _min_hull_dist(hull_a, hull_b):
    """Min pairwise vertex distance between two hull polygons (..., R, 3)."""
    d = jnp.linalg.norm(hull_a[..., :, None, :] - hull_b[..., None, :, :], axis=-1)
    return jnp.min(d, axis=(-2, -1))


def merge_plane_sets(sets: list[PlaneSet], cfg: SegmentationConfig) -> PlaneSet:
    """Concatenate per-sensor plane sets and merge co-planar duplicates.

    Covers the reference's `groupPlanes` (cross-sensor merging,
    `include/Frame360.h:742-830`) and `mergePlanes` (same-surface merging,
    `:657-737`): two planes unify when their normals agree (dot > 0.99),
    |delta d| < 0.45 m, and their hulls come within the distance gates.
    Union-find is done as min-label propagation over the (small) K x K
    adjacency; merged attributes are inlier-weighted.
    """
    cat = lambda f: jnp.concatenate([getattr(s, f) for s in sets], axis=0)
    normal = cat("normal")
    center = cat("center")
    d = cat("d")
    curv = cat("curvature")
    area = cat("area")
    elong = cat("elongation")
    n_in = cat("n_inliers")
    hull = cat("hull")
    hist = cat("hue_hist")
    color = cat("main_color")
    valid = cat("valid")
    k = normal.shape[0]

    ndot = normal @ normal.T
    dd = jnp.abs(d[:, None] - d[None, :])
    hd = _min_hull_dist(hull[:, None], hull[None, :])
    # parallel-offset gate: displacement between close hull points along the
    # normal (merge threshold 0.06/0.09 in the reference; use the group gate)
    close_disp = jnp.abs(
        jnp.einsum("ij,kj->ik", normal, center) + d[:, None]
    )  # distance of other center to this plane
    same = (
        valid[:, None]
        & valid[None, :]
        & (ndot > cfg.merge_normal_dot)
        & (dd < cfg.merge_dist_d)
        & (hd < cfg.group_max_dist_hull)
        & (close_disp < cfg.group_max_dist_parallel * 2)
    )
    same = same | jnp.eye(k, dtype=bool)

    # union-find: iterate label = min over connected labels
    lab = jnp.arange(k)

    def body(i, lab):
        lmat = jnp.where(same, lab[None, :], k)
        newlab = jnp.minimum(lab, jnp.min(lmat, axis=1))
        return newlab[newlab]

    lab = jax.lax.fori_loop(0, 8, body, lab)

    # weighted merge into root slots
    wgt = jnp.where(valid, n_in, 0.0)
    seg = lambda vals, w: jax.ops.segment_sum(vals * w, lab, k)
    wsum = jax.ops.segment_sum(wgt, lab, k)
    wsafe = jnp.maximum(wsum, 1e-6)
    m_center = seg(center, wgt[:, None]) / wsafe[:, None]
    m_normal = seg(normal, wgt[:, None])
    m_norm = jnp.linalg.norm(m_normal, axis=-1, keepdims=True)
    m_normal = m_normal / jnp.maximum(m_norm, 1e-12)
    m_d = -jnp.sum(m_normal * m_center, axis=-1)
    m_curv = seg(curv, wgt) / wsafe
    m_area = jax.ops.segment_sum(jnp.where(valid, area, 0.0), lab, k)
    m_nin = jax.ops.segment_sum(wgt, lab, k)
    m_elong = seg(elong, wgt) / wsafe
    m_hist = seg(hist, wgt[:, None])
    m_hist = m_hist / jnp.maximum(jnp.sum(m_hist, axis=1, keepdims=True), 1e-6)
    m_color = seg(color, wgt[:, None]) / wsafe[:, None]
    is_root = lab == jnp.arange(k)
    m_valid = is_root & (wsum > 0)

    # hull of merged plane: keep the root's hull extended is complex; use the
    # member hull points' extreme approximation — project all member hull
    # points into the merged plane basis and take directional extremes.
    # Simpler robust choice: keep hull points of the largest member.
    # Collect per-root best member (max inliers):
    root_onehot = jax.nn.one_hot(lab, k)  # (k_members, k_roots)
    scores = root_onehot * jnp.where(valid, n_in, -1.0)[:, None]
    best_member = jnp.argmax(scores, axis=0)  # (k_roots,)
    m_hull = hull[best_member]

    merged = PlaneSet(
        normal=m_normal,
        center=m_center,
        d=m_d,
        curvature=m_curv,
        area=m_area,
        elongation=m_elong,
        n_inliers=m_nin,
        hull=m_hull,
        hue_hist=m_hist,
        main_color=m_color,
        valid=m_valid,
    )
    return _compact_top(merged, cfg.max_planes)


def _compact_top(planes: PlaneSet, k_out: int) -> PlaneSet:
    """Keep the k_out largest-area valid planes, compacted to the front."""
    k_have = planes.valid.shape[0]
    if k_have < k_out:  # pad capacity with invalid slots first
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((k_out - k_have,) + a.shape[1:], a.dtype)], axis=0
        )
        planes = jax.tree_util.tree_map(pad, planes)
    score = jnp.where(planes.valid, planes.area, -1.0)
    _, order = jax.lax.top_k(score, k_out)
    take = lambda a: a[order]
    return PlaneSet(
        normal=take(planes.normal),
        center=take(planes.center),
        d=take(planes.d),
        curvature=take(planes.curvature),
        area=take(planes.area),
        elongation=take(planes.elongation),
        n_inliers=take(planes.n_inliers),
        hull=take(planes.hull),
        hue_hist=take(planes.hue_hist),
        main_color=take(planes.main_color),
        valid=take(planes.valid),
    )
