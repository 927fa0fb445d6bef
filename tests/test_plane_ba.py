"""Planar bundle adjustment tests: synthetic recovery + Schur correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.ops import se3
from rgbd360_tpu.slam.plane_ba import (
    PlaneBAProblem,
    associate_planes,
    optimize_plane_ba,
    predict_plane,
)


def _box_planes():
    """Six planes of a 6x8x3 m room (world frame), n.x + d = 0."""
    planes = np.array(
        [
            [1, 0, 0, 3.0],
            [-1, 0, 0, 3.0],
            [0, 1, 0, 1.5],
            [0, -1, 0, 1.5],
            [0, 0, 1, 4.0],
            [0, 0, -1, 4.0],
        ],
        np.float32,
    )
    return planes


def _make_problem(n_kf=6, noise=0.0, perturb=0.05, seed=0):
    rng = np.random.default_rng(seed)
    planes_gt = _box_planes()
    m = planes_gt.shape[0]
    # ground-truth trajectory: small walk with yaw
    gt = [np.eye(4)]
    for i in range(n_kf - 1):
        step = np.asarray(
            se3.se3_exp(jnp.asarray([0.25, 0.02, 0.1, 0.01, 0.06, 0.0]))
        )
        gt.append(gt[-1] @ step)
    gt = np.stack(gt).astype(np.float32)

    obs_kf, obs_pl, obs, w = [], [], [], []
    for i in range(n_kf):
        for k in range(m):
            pred = np.asarray(
                predict_plane(jnp.asarray(gt[i]), jnp.asarray(planes_gt[k]))
            )
            pred = pred + rng.normal(0, noise, 4).astype(np.float32)
            pred[:3] /= np.linalg.norm(pred[:3])
            obs_kf.append(i)
            obs_pl.append(k)
            obs.append(pred)
            w.append(100.0)

    # perturbed initialization
    poses0 = np.stack(
        [
            gt[i]
            @ np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, perturb, 6))))
            for i in range(n_kf)
        ]
    ).astype(np.float32)
    poses0[0] = gt[0]  # gauge
    planes0 = planes_gt + rng.normal(0, perturb, planes_gt.shape).astype(np.float32)
    planes0[:, :3] /= np.linalg.norm(planes0[:, :3], axis=1, keepdims=True)

    prob = PlaneBAProblem(
        poses=jnp.asarray(poses0),
        planes=jnp.asarray(planes0),
        obs_kf=jnp.asarray(np.asarray(obs_kf, np.int32)),
        obs_pl=jnp.asarray(np.asarray(obs_pl, np.int32)),
        obs=jnp.asarray(np.stack(obs)),
        w=jnp.asarray(np.asarray(w, np.float32)),
    )
    return prob, gt, planes_gt


def _pose_err(poses, gt):
    return float(
        np.max(np.linalg.norm(np.asarray(poses)[:, :3, 3] - gt[:, :3, 3], axis=1))
    )


def test_plane_ba_recovers_exact():
    prob, gt, planes_gt = _make_problem(noise=0.0, perturb=0.08)
    err0 = _pose_err(prob.poses, gt)
    poses, planes, chi2, iters = optimize_plane_ba(prob, max_iters=15)
    err = _pose_err(poses, gt)
    assert err < 1e-3, (err0, err)
    assert float(chi2) < 1e-6
    # plane landmarks recovered too (up to the fixed gauge)
    np.testing.assert_allclose(np.asarray(planes), planes_gt, atol=2e-3)


def test_plane_ba_noisy_observations():
    prob, gt, planes_gt = _make_problem(noise=0.004, perturb=0.06, seed=3)
    err0 = _pose_err(prob.poses, gt)
    poses, planes, chi2, _ = optimize_plane_ba(prob, max_iters=15)
    err = _pose_err(poses, gt)
    assert err < 0.25 * err0, (err0, err)


def test_schur_matches_full_dense_solve():
    """One GN step via the Schur-PCG path must equal the explicit full
    (6N+4M) dense normal-equation solve."""
    from rgbd360_tpu.slam import plane_ba as B

    prob, _, _ = _make_problem(n_kf=4, noise=0.002, perturb=0.05, seed=1)
    lam = jnp.array(0.0)
    t = B._normal_blocks(prob.poses, prob.planes, prob, lam)

    # explicit dense assembly
    n = prob.poses.shape[0]
    m = prob.planes.shape[0]
    r, jp, jl, w, _ = B._obs_terms(prob.poses, prob.planes, prob)
    dim = 6 * n + 4 * m
    h = np.zeros((dim, dim))
    b = np.zeros(dim)
    for o in range(prob.obs.shape[0]):
        i = int(prob.obs_kf[o])
        k = int(prob.obs_pl[o])
        jpo = np.asarray(jp[o])
        jlo = np.asarray(jl[o])
        ro = np.asarray(r[o])
        wo = float(w[o])
        sp = slice(6 * i, 6 * i + 6)
        sl = slice(6 * n + 4 * k, 6 * n + 4 * k + 4)
        h[sp, sp] += wo * jpo.T @ jpo
        h[sl, sl] += wo * jlo.T @ jlo
        h[sp, sl] += wo * jpo.T @ jlo
        h[sl, sp] += wo * jlo.T @ jpo
        b[sp] += wo * jpo.T @ ro
        b[sl] += wo * jlo.T @ ro
    # same priors as _normal_blocks
    h[: 6 * n, : 6 * n] += 1e-6 * np.eye(6 * n)
    h[:6, :6] += 1e8 * np.eye(6)
    h[6 * n :, 6 * n :] += 1e-6 * np.eye(4 * m)
    delta = np.linalg.solve(h, -b)
    dx_p_dense = delta[: 6 * n].reshape(n, 6)
    dx_l_dense = delta[6 * n :].reshape(m, 4)

    hpp_inv = jnp.linalg.inv(t["hpp"])
    dx_p = B._pcg(
        lambda x: B._schur_matvec(t, x),
        lambda rr: jnp.einsum("nab,nb->na", hpp_inv, rr),
        B._schur_rhs(t),
        200,
        1e-10,
    )
    dx_l = B._back_substitute(t, dx_p)
    np.testing.assert_allclose(np.asarray(dx_p), dx_p_dense, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_l), dx_l_dense, atol=1e-4)


def test_associate_planes_builds_problem():
    """Data association groups per-KF plane observations of the same wall
    into one landmark."""
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.ops.segmentation import PlaneSet

    planes_gt = _box_planes()
    gt = [np.eye(4, dtype=np.float32)]
    gt.append(
        np.asarray(se3.se3_exp(jnp.asarray([0.3, 0.0, 0.1, 0.0, 0.05, 0.0])))
    )

    sets = []
    cap = 8
    for pose in gt:
        n_l, d_l, valid = [], [], []
        for k in range(planes_gt.shape[0]):
            pred = np.asarray(
                predict_plane(jnp.asarray(pose), jnp.asarray(planes_gt[k]))
            )
            n_l.append(pred[:3])
            d_l.append(pred[3])
            valid.append(True)
        while len(n_l) < cap:
            n_l.append(np.zeros(3))
            d_l.append(0.0)
            valid.append(False)
        z = np.zeros(cap)
        sets.append(
            PlaneSet(
                normal=jnp.asarray(np.stack(n_l), jnp.float32),
                center=jnp.zeros((cap, 3)),
                d=jnp.asarray(np.asarray(d_l), jnp.float32),
                curvature=jnp.asarray(z),
                area=jnp.asarray(z + 1.0),
                elongation=jnp.asarray(z + 1.0),
                n_inliers=jnp.asarray(z + 100.0),
                hull=jnp.zeros((cap, 4, 3)),
                hue_hist=jnp.zeros((cap, 37)),
                main_color=jnp.zeros((cap, 3)),
                valid=jnp.asarray(np.asarray(valid)),
            )
        )

    prob = associate_planes([jnp.asarray(p) for p in gt], sets, max_planes=16)
    # 6 walls seen from both KFs -> 6 landmarks, 12 observations
    n_landmarks = int(jnp.sum(jnp.linalg.norm(prob.planes[:, :3], axis=1) > 0.5))
    assert n_landmarks == 6, n_landmarks
    assert prob.obs.shape[0] == 12
    poses, planes, chi2, _ = optimize_plane_ba(prob, max_iters=5)
    assert float(chi2) < 1e-6  # perfect data stays put
