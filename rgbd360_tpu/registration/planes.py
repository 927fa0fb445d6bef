"""Plane-graph matching and closed-form pose from plane correspondences.

TPU-native replacement for the mrpt::pbmap machinery the reference links
(`SubgraphMatcher::compareSubgraphs` + `ConsistencyTest::
estimatePoseWithCovariance`, used at reference `include/RegisterRGBD360.h:
306-320`).  The interpretation-tree recursion becomes masked exhaustive
consistency scoring (SURVEY.md section 7 "hard parts"): with <=K planes per
frame all O(K^2) candidate pairs and O(K^4) binary-consistency entries fit in
tiny tensors, and the best one-to-one match set is grown greedily by
consistency-vote count — deterministic, jittable, no recursion.

Constraint semantics follow the reference's INI thresholds
(`config_files/configLocaliser_sphericalOdometry.ini`):
  unary:  area ratio, elongation ratio, color (hue histogram distance);
          for *odometry* modes additionally direct normal/distance agreement
          (small motion assumption, RegisterRGBD360 registrationType).
  binary: pairwise-angle preservation, center-distance preservation, and the
          d-offset (height) relation.

Pose solve: closed-form weighted alignment of matched plane normals (SVD,
Arun-style) + least-squares translation from the plane-offset equations
n2 . t = d1 - d2; information matrix assembled from the same linear system
(Fisher information of the plane-pair measurement model).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import MatcherConfig
from rgbd360_tpu.ops.segmentation import PlaneSet

# Registration modes (reference `RegisterRGBD360.h:264-269`)
DEFAULT_6DOF = 0
PLANAR_3DOF = 1
ODOMETRY_6DOF = 2
PLANAR_ODOMETRY_3DOF = 3


@jax.tree_util.register_dataclass
@dataclass
class MatchResult:
    """Fixed-capacity match set + pose estimate.

    pairs: (M, 2) int32 indices (ref_plane, trg_plane), -1 padded.
    n_matches: () int32
    area_matched: () float — total matched hull area in the ref frame
    pose: (4, 4) — maps target-frame points into the ref frame
    information: (6, 6)
    success: () bool
    """

    pairs: jnp.ndarray
    n_matches: jnp.ndarray
    area_matched: jnp.ndarray
    pose: jnp.ndarray
    information: jnp.ndarray
    success: jnp.ndarray


def _bhattacharyya(h1, h2):
    """Bhattacharyya coefficient between color histograms (mrpt::pbmap uses
    this for the hue-histogram unary constraint)."""
    return jnp.sum(jnp.sqrt(jnp.maximum(h1, 0.0) * jnp.maximum(h2, 0.0)), axis=-1)


def unary_compatibility(
    ref: PlaneSet, trg: PlaneSet, cfg: MatcherConfig, mode: int
) -> jnp.ndarray:
    """(K1, K2) bool: which plane pairs may correspond."""
    a1 = ref.area[:, None]
    a2 = trg.area[None, :]
    ratio_area = jnp.maximum(a1, a2) / jnp.maximum(jnp.minimum(a1, a2), 1e-6)
    e1 = ref.elongation[:, None]
    e2 = trg.elongation[None, :]
    ratio_elong = jnp.maximum(e1, e2) / jnp.maximum(jnp.minimum(e1, e2), 1e-6)
    color_ok = (
        _bhattacharyya(ref.hue_hist[:, None, :], trg.hue_hist[None, :, :])
        > 1.0 - cfg.hue_threshold
    )
    ok = (
        ref.valid[:, None]
        & trg.valid[None, :]
        & (ratio_area < cfg.area_threshold)
        & (ratio_elong < cfg.elongation_threshold)
        & color_ok
    )
    if mode in (ODOMETRY_6DOF, PLANAR_ODOMETRY_3DOF):
        # small-motion assumption: normals and offsets must roughly agree
        ndot = jnp.einsum("ij,kj->ik", ref.normal, trg.normal)
        cos_gate = jnp.cos(jnp.deg2rad(cfg.unary_angle_deg))
        dd = jnp.abs(ref.d[:, None] - trg.d[None, :])
        ok = ok & (ndot > cos_gate) & (dd < cfg.unary_dist_d)
    if mode in (PLANAR_3DOF, PLANAR_ODOMETRY_3DOF):
        # planar motion: vertical planes stay vertical, horizontal stay
        # horizontal (the rig's x axis is up in the sphere frame).
        up1 = jnp.abs(ref.normal[:, 0])[:, None]
        up2 = jnp.abs(trg.normal[None, :, 0])
        ok = ok & (jnp.abs(up1 - up2) < 0.2)
    return ok


def binary_consistency(
    ref: PlaneSet, trg: PlaneSet, cand: jnp.ndarray, cfg: MatcherConfig
) -> jnp.ndarray:
    """(K1, K2, K1, K2) bool: pair (i, j) is geometrically consistent with
    pair (k, l) — rigid-invariant relations are preserved."""
    # pairwise angles between normals within each frame
    ang1 = jnp.einsum("ij,kj->ik", ref.normal, ref.normal)  # cos angles
    ang2 = jnp.einsum("ij,kj->ik", trg.normal, trg.normal)
    cos_tol = jnp.deg2rad(cfg.binary_angle_threshold_deg)
    ang_ok = jnp.abs(jnp.arccos(jnp.clip(ang1, -1, 1))[:, None, :, None]
                     - jnp.arccos(jnp.clip(ang2, -1, 1))[None, :, None, :]) < cos_tol

    dist1 = jnp.linalg.norm(ref.center[:, None] - ref.center[None, :], axis=-1)
    dist2 = jnp.linalg.norm(trg.center[:, None] - trg.center[None, :], axis=-1)
    dist_ok = (
        jnp.abs(dist1[:, None, :, None] - dist2[None, :, None, :])
        < cfg.binary_dist_threshold
    )

    # height relation: distance of plane k's center to plane i's plane must
    # be preserved (reference binary height_threshold).
    h1 = jnp.einsum("ij,kj->ik", ref.normal, ref.center) + ref.d[:, None]
    h2 = jnp.einsum("ij,kj->ik", trg.normal, trg.center) + trg.d[:, None]
    h_ok = (
        jnp.abs(h1[:, None, :, None] - h2[None, :, None, :]) < cfg.height_threshold * 3
    )

    c = cand[:, :, None, None] & cand[None, None, :, :]
    # a pair is never consistent with a conflicting pair (shared plane)
    k1, k2 = cand.shape
    i_eq = jnp.eye(k1, dtype=bool)[:, None, :, None]
    j_eq = jnp.eye(k2, dtype=bool)[None, :, None, :]
    conflict = (i_eq | j_eq) & ~(i_eq & j_eq)
    return c & ang_ok & dist_ok & h_ok & ~conflict


def match_planes(
    ref: PlaneSet, trg: PlaneSet, cfg: MatcherConfig, mode: int = PLANAR_3DOF
):
    """Greedy maximum-consistent-set matching.

    Returns (pairs (M, 2) int32 padded with -1, n_matches, score).
    """
    cand = unary_compatibility(ref, trg, cfg, mode)
    cons = binary_consistency(ref, trg, cand, cfg)
    k1, k2 = cand.shape
    m_cap = cfg.max_matches

    # weight votes by matched area so large planes anchor the match
    w = jnp.sqrt(
        jnp.maximum(ref.area[:, None], 1e-3) * jnp.maximum(trg.area[None, :], 1e-3)
    )

    def body(carry, _):
        cand_live, chosen, n = carry
        votes = jnp.einsum("ijkl,kl->ij", cons.astype(jnp.float32), (cand_live * w))
        votes = jnp.where(cand_live, votes * w, -1.0)
        best = jnp.argmax(votes.reshape(-1))
        bi, bj = best // k2, best % k2
        ok = votes.reshape(-1)[best] > 0
        # keep only pairs consistent with the chosen one; a matched plane
        # cannot match again (one-to-one), so drop its row and column too
        row = jnp.arange(k1)[:, None] == bi
        col = jnp.arange(k2)[None, :] == bj
        cand_next = cand_live & cons[bi, bj] & ~row & ~col
        chosen = chosen.at[n].set(
            jnp.where(ok, jnp.array([bi, bj], jnp.int32), jnp.array([-1, -1], jnp.int32))
        )
        return (jnp.where(ok, cand_next, cand_live), chosen, n + ok.astype(jnp.int32)), None

    # derive the carry init from the input so its sharding/varying axes
    # match under shard_map (constants would fail the scan VMA check)
    zero = (jnp.sum(cand) * 0).astype(jnp.int32)
    chosen0 = jnp.full((m_cap, 2), -1, dtype=jnp.int32) + zero
    (cand_f, chosen, n), _ = jax.lax.scan(
        body, (cand, chosen0, zero), None, length=m_cap
    )
    return chosen, n


def pose_from_matches(
    ref: PlaneSet, trg: PlaneSet, pairs: jnp.ndarray, n_matches: jnp.ndarray
):
    """Closed-form pose + information from matched planes.

    Solves for T = (R, t) mapping target-frame geometry onto the ref frame:
    R aligns trg normals to ref normals (weighted SVD over the correlation
    matrix), then t from the stack of constraints n1_i . t = d2_i - d1_i
    (each matched plane contributes one linear equation along its normal).
    Information matrix: J^T J of the stacked constraints (rotation block from
    the normal alignment residuals, translation block from the offsets) —
    the ConsistencyTest::estimatePoseWithCovariance equivalent.
    """
    m_cap = pairs.shape[0]
    vmask = (pairs[:, 0] >= 0).astype(jnp.float32)
    i = jnp.clip(pairs[:, 0], 0, None)
    j = jnp.clip(pairs[:, 1], 0, None)
    n1 = ref.normal[i]
    n2 = trg.normal[j]
    d1 = ref.d[i]
    d2 = trg.d[j]

    # Equal base weights (the matcher already area-gated the pairs) plus
    # Huber IRLS: area weighting proved harmful on real data — one biased
    # large wall can drag the weakly-constrained translation directions.
    def huber_w(r, scale):
        a_ = jnp.abs(r)
        return jnp.where(a_ < scale, 1.0, scale / jnp.maximum(a_, 1e-12))

    def solve(w):
        # rotation: maximize sum w_k (R n2_k) . n1_k
        corr = jnp.einsum("k,ki,kj->ij", w, n1, n2)
        uu, _, vt = jnp.linalg.svd(corr)
        det = jnp.linalg.det(uu @ vt)
        s = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
        rot = uu @ s @ vt
        # translation: n1_k . t = d2_k - d1_k  (n.x + d = 0 convention:
        # for x1 = R x2 + t on the plane, d1 = -n1.x1 = -n1.(R x2) - n1.t
        # = d2 - n1.t  =>  n1.t = d2 - d1)
        rhs = (d2 - d1) * w
        amat = n1 * w[:, None]
        ata = amat.T @ amat
        att = amat.T @ rhs
        # Eigen-truncated solve: translation directions carrying less than
        # ~a quarter of one unit-weight constraint are unobserved from this
        # match set — return exactly 0 there (the information matrix
        # reports the deficiency) instead of amplifying the tiny residual
        # leakage of near-orthogonal inlier normals by 1/eig.
        evals, evecs = jnp.linalg.eigh(ata)
        inv = jnp.where(evals > 0.25, 1.0 / jnp.maximum(evals, 1e-12), 0.0)
        t = evecs @ (inv * (evecs.T @ att))
        return rot, t, ata

    w = vmask
    rot, t, ata = solve(w)
    for _ in range(2):  # IRLS refinement
        r_t = jnp.einsum("ki,i->k", n1, t) - (d2 - d1)
        r_r = 1.0 - jnp.einsum("ki,ki->k", n1, n2 @ rot.T)
        w = vmask * huber_w(r_t, 0.05) * huber_w(r_r, 0.002)
        rot, t, ata = solve(w)
    # Redescending final passes: pairs whose d-offset residual is grossly
    # inconsistent with the converged solution are WRONG data associations
    # (same-normal small planes swapped between frames — e.g. ceiling
    # fixtures segmented differently per frame), not noisy measurements;
    # Huber's scale/|r| soft weight still lets a mutually-consistent outlier
    # group drag any translation direction the inliers constrain weakly.
    # Hard-zero them — and ALSO revoke any surviving pair that shares a cut
    # pair's normal direction without a second supporting inlier: when an
    # outlier group alone owns a translation direction, the IRLS solution
    # splits the error among the group, so after cutting part of it the
    # remainder fits its own drag exactly (leverage ~ 1) and can never be
    # residual-tested.  Without redundant support that direction is simply
    # unobservable from this match set; the information matrix then reports
    # it (near-zero eigenvalue) instead of a confidently wrong translation.
    # Clean data is unaffected (the cut binds ~3x beyond the IRLS Huber
    # scale and no cut means no revocation).  The reference's
    # ConsistencyTest has no such guard and inherits the drag.
    for _ in range(2):
        r_t = jnp.einsum("ki,i->k", n1, t) - (d2 - d1)
        r_r = 1.0 - jnp.einsum("ki,ki->k", n1, n2 @ rot.T)
        # scale-adaptive cut: threshold = max(floor, 4x the Huber-weighted
        # RMS residual).  On clean data the floors bind (0.15 m / 0.01 =
        # ~8 deg); in noisy regimes (low-res, degraded renders) genuine
        # pairs carry residuals well above the floors and an absolute cut
        # would shred the match set and collapse the translation — the
        # IRLS weights already bound how much true outliers inflate the
        # scale estimate.
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        thr_t = jnp.maximum(0.15, 4.0 * jnp.sqrt(jnp.sum(w * r_t**2) / wsum))
        thr_r = jnp.maximum(0.01, 4.0 * jnp.sqrt(jnp.sum(w * r_r**2) / wsum))
        keep = (jnp.abs(r_t) < thr_t) & (r_r < thr_r)
        cut = (w > 0.0) & ~keep
        same_dir = jnp.abs(jnp.einsum("ki,li->kl", n1, n1)) > 0.966  # ~15 deg
        suspect = jnp.any(same_dir & cut[None, :], axis=1)
        support = jnp.sum(
            same_dir & keep[None, :] & (w[None, :] > 0.0), axis=1
        ) - 1  # other supporting inliers in this pair's direction
        keep = keep & (~suspect | (support >= 1))
        w = jnp.where(keep, w, 0.0)
        rot, t, ata = solve(w)
    det_t = jnp.linalg.det(ata)

    pose = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(t)
    a = w  # final robust weights feed the information matrix

    # information: translation block = A^T A (meters); rotation block from
    # normal-alignment residuals: J_r = -skew(R n2) per constraint.
    rn2 = n2 @ rot.T
    jr = -jnp.stack(
        [
            jnp.zeros_like(rn2[:, 0]),
            -rn2[:, 2],
            rn2[:, 1],
            rn2[:, 2],
            jnp.zeros_like(rn2[:, 0]),
            -rn2[:, 0],
            -rn2[:, 1],
            rn2[:, 0],
            jnp.zeros_like(rn2[:, 0]),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    h_rot = jnp.einsum("k,kij,kil->jl", a, jr, jr)
    info = jnp.zeros((6, 6)).at[:3, :3].set(ata).at[3:, 3:].set(h_rot)

    observable = (n_matches >= 3) & (det_t > 1e-9)
    return pose, info, observable


class PlaneRegistration:
    """RegisterRGBD360 equivalent: match two frames' PbMaps and solve pose."""

    def __init__(self, cfg: MatcherConfig = MatcherConfig()):
        self.cfg = cfg
        self._run = jax.jit(self._run_impl, static_argnames=("mode",))

    def register(
        self, ref: PlaneSet, trg: PlaneSet, mode: int = PLANAR_3DOF
    ) -> MatchResult:
        return self._run(ref, trg, mode=mode)

    def _run_impl(self, ref: PlaneSet, trg: PlaneSet, mode: int) -> MatchResult:
        cfg = self.cfg
        pairs, n = match_planes(ref, trg, cfg, mode)
        pose, info, observable = pose_from_matches(ref, trg, pairs, n)
        vmask = pairs[:, 0] >= 0
        area = jnp.sum(
            jnp.where(vmask, ref.area[jnp.clip(pairs[:, 0], 0, None)], 0.0)
        )
        success = observable & (n >= cfg.min_planes_recognition)
        return MatchResult(
            pairs=pairs,
            n_matches=n,
            area_matched=area,
            pose=jnp.where(success, pose, jnp.eye(4)),
            information=info,
            success=success,
        )
