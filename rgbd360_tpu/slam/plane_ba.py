"""Planar bundle adjustment: joint poses + plane-landmark refinement.

The reference stops at pose-graph optimization (g2o over keyframe poses,
`include/GraphOptimizer.h`); its PbMap planes are per-keyframe observations
that never feed a joint solve.  This module closes that loop TPU-natively:
keyframe poses and GLOBAL plane landmarks are optimized together against the
per-keyframe plane observations that the segmentation layer already produces
(reference `Frame360::getPlanes`, `include/Frame360.h:615`), which is the
classic structure exploited by planar BA (Zhou et al., "An Efficient Planar
Bundle Adjustment Algorithm").

Model.  World plane k: (n_k, d_k) with n_k . x + d_k = 0, |n_k| = 1.
Keyframe i pose T_i (world <- kf).  Its prediction in the keyframe frame:

    n_ik = R_i^T n_k,      d_ik = n_k . t_i + d_k

Observation: the segmented plane (n_obs, d_obs) in the keyframe frame, with
scalar weight w (e.g. inlier count).  Residual r = [n_ik - n_obs,
d_ik - d_obs] (4,).  Jacobians come from `jax.jacfwd` of the residual at the
zero increment — 4x6 and 4x4 blocks per observation, batched by vmap, so the
whole assembly is one fused program (no hand-derived chain rules to get
wrong).

Solver.  Gauss-Newton/LM with the SCHUR COMPLEMENT over plane landmarks:
observations couple one pose with one plane only, so H_ll is block-diagonal
(4x4 per plane) and the reduced pose system

    S = H_pp - H_pl H_ll^-1 H_lp

is applied MATRIX-FREE: every S-matvec is two observation sweeps
(scatter-add by plane id, gather by plane id) around the block-diagonal
H_ll^-1 — O(obs) work, no (6N)^2 matrix.  Solved with block-Jacobi PCG.
Plane updates back-substitute in closed form.  This is the structure that
shards over a mesh: observations split across devices and each S-matvec
psum-reduces (`parallel.sharded.distributed_plane_ba`).

Gauge: pose 0 is pinned with a strong prior (like the pose graph).  Plane
normals are renormalized after each accepted step (4-dof overparametrized
update + LM damping, standard for plane BA).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import se3

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclass
class PlaneBAProblem:
    """Fixed-capacity planar BA problem.

    poses:   (N, 4, 4) initial keyframe poses (world <- kf)
    planes:  (M, 4) initial world planes [nx, ny, nz, d], |n| = 1
    obs_kf:  (O,) int32 keyframe index per observation
    obs_pl:  (O,) int32 plane index per observation
    obs:     (O, 4) observed [n (kf frame), d]
    w:       (O,) float32 observation weights (0 = padding)
    """

    poses: jnp.ndarray
    planes: jnp.ndarray
    obs_kf: jnp.ndarray
    obs_pl: jnp.ndarray
    obs: jnp.ndarray
    w: jnp.ndarray


def predict_plane(pose: jnp.ndarray, plane: jnp.ndarray) -> jnp.ndarray:
    """World plane -> keyframe-frame plane [n, d] under pose (world <- kf)."""
    r = pose[:3, :3]
    t = pose[:3, 3]
    n_w = plane[:3]
    n_c = jnp.matmul(n_w, r, precision=_HI)  # R^T n
    d_c = jnp.dot(n_w, t) + plane[3]
    return jnp.concatenate([n_c, d_c[None]])


def _residual(xi, dpi, pose, plane, obs):
    """Observation residual at increments (xi on the pose, dpi on the plane)."""
    t_new = se3.se3_exp(xi) @ pose
    return predict_plane(t_new, plane + dpi) - obs


# numpy, not jnp: module-level device arrays would initialize the XLA
# backend at import, breaking multi-host jax.distributed bring-up
_zero6 = np.zeros(6, np.float32)
_zero4 = np.zeros(4, np.float32)


def _obs_terms(poses, planes, prob):
    """Per-observation residuals and jacobians (autodiff at zero increment)."""
    p_i = poses[prob.obs_kf]
    l_k = planes[prob.obs_pl]

    def one(pose, plane, obs):
        r = _residual(_zero6, _zero4, pose, plane, obs)
        jp = jax.jacfwd(_residual, argnums=0)(_zero6, _zero4, pose, plane, obs)
        jl = jax.jacfwd(_residual, argnums=1)(_zero6, _zero4, pose, plane, obs)
        return r, jp, jl

    r, jp, jl = jax.vmap(one)(p_i, l_k, prob.obs)
    w = prob.w
    chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return r, jp, jl, w, chi2


def _normal_blocks(poses, planes, prob, lam):
    """All GN blocks needed by the Schur solve.

    Returns dict with per-observation (wjp (O,4,6), wjl (O,4,4)), residual
    gradients b_p (N,6) / b_l (M,4), block diagonals hpp (N,6,6) damped,
    hll_inv (M,4,4) damped+inverted, and chi2."""
    n = poses.shape[0]
    m = planes.shape[0]
    r, jp, jl, w, chi2 = _obs_terms(poses, planes, prob)
    wj = w[:, None, None]
    i = prob.obs_kf
    k = prob.obs_pl

    hpp = jnp.zeros((n, 6, 6)).at[i].add(
        wj * jnp.einsum("oab,oac->obc", jp, jp)
    )
    hll = jnp.zeros((m, 4, 4)).at[k].add(
        wj * jnp.einsum("oab,oac->obc", jl, jl)
    )
    b_p = jnp.zeros((n, 6)).at[i].add(w[:, None] * jnp.einsum("oab,oa->ob", jp, r))
    b_l = jnp.zeros((m, 4)).at[k].add(w[:, None] * jnp.einsum("oab,oa->ob", jl, r))

    # gauge prior on pose 0 + floor so empty poses/planes stay invertible
    eye6 = jnp.eye(6)
    hpp = hpp + 1e-6 * eye6[None]
    hpp = hpp.at[0].add(1e8 * eye6)
    hpp = hpp + lam * hpp * eye6[None]  # LM damping on the diagonal
    eye4 = jnp.eye(4)
    hll = hll + 1e-6 * eye4[None]
    hll = hll + lam * hll * eye4[None]
    hll_inv = jnp.linalg.inv(hll)

    return dict(
        jp=jp, jl=jl, w=w, i=i, k=k,
        hpp=hpp, hll_inv=hll_inv, b_p=b_p, b_l=b_l, chi2=chi2,
    )


def _schur_matvec(t, x):
    """S @ x = H_pp x - H_pl H_ll^-1 H_lp x, matrix-free over observations."""
    i, k, jp, jl, w = t["i"], t["k"], t["jp"], t["jl"], t["w"]
    # H_lp x: per-obs jl^T (jp x_i), scatter-add by plane
    jpx = jnp.einsum("oab,ob->oa", jp, x[i])  # (O, 4)
    hlp_x = jnp.zeros_like(t["b_l"]).at[k].add(
        w[:, None] * jnp.einsum("oab,oa->ob", jl, jpx)
    )
    y_l = jnp.einsum("kab,kb->ka", t["hll_inv"], hlp_x)  # (M, 4)
    # H_pl y_l: per-obs jp^T (jl y_k), scatter-add by pose
    jly = jnp.einsum("oab,ob->oa", jl, y_l[k])  # (O, 4)
    hpl_y = jnp.zeros_like(t["b_p"]).at[i].add(
        w[:, None] * jnp.einsum("oab,oa->ob", jp, jly)
    )
    hpp_x = jnp.einsum("nab,nb->na", t["hpp"], x)
    return hpp_x - hpl_y


def _schur_rhs(t):
    """-b_p + H_pl H_ll^-1 b_l (the reduced right-hand side)."""
    i, k, jp, jl, w = t["i"], t["k"], t["jp"], t["jl"], t["w"]
    y_l = jnp.einsum("kab,kb->ka", t["hll_inv"], t["b_l"])
    jly = jnp.einsum("oab,ob->oa", jl, y_l[k])
    hpl_y = jnp.zeros_like(t["b_p"]).at[i].add(
        w[:, None] * jnp.einsum("oab,oa->ob", jp, jly)
    )
    return -t["b_p"] + hpl_y


def _back_substitute(t, dx_p):
    """delta_l = -H_ll^-1 (b_l + H_lp dx_p)."""
    i, k, jp, jl, w = t["i"], t["k"], t["jp"], t["jl"], t["w"]
    jpx = jnp.einsum("oab,ob->oa", jp, dx_p[i])
    hlp_x = jnp.zeros_like(t["b_l"]).at[k].add(
        w[:, None] * jnp.einsum("oab,oa->ob", jl, jpx)
    )
    return -jnp.einsum("kab,kb->ka", t["hll_inv"], t["b_l"] + hlp_x)


def _pcg(matvec, precond, b, iters, tol):
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.sum(b * b)

    def body(carry):
        x, r, p, rz, it = carry
        hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return x, r, z + beta * p, rz_new, it + 1

    def cond(carry):
        _, r, _, _, it = carry
        return (it < iters) & (jnp.sum(r * r) > tol * tol * b2)

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x


@partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def optimize_plane_ba(
    prob: PlaneBAProblem,
    max_iters: int = 10,
    cg_iters: int = 50,
    cg_tol: float = 1e-6,
    lm_lambda0: float = 1e-4,
    lm_step: float = 10.0,
):
    """LM planar BA with matrix-free Schur-complement PCG.

    Returns (poses, planes, chi2, iters).  Pose 0 is the gauge.
    """

    def lm_body(carry):
        poses, planes, lam, chi2_prev, it, done = carry
        t = _normal_blocks(poses, planes, prob, lam)
        hpp_inv = jnp.linalg.inv(t["hpp"])
        dx_p = _pcg(
            lambda x: _schur_matvec(t, x),
            lambda r: jnp.einsum("nab,nb->na", hpp_inv, r),
            _schur_rhs(t),
            cg_iters,
            cg_tol,
        )
        dx_l = _back_substitute(t, dx_p)
        new_poses = jax.vmap(lambda d, p: se3.se3_exp(d) @ p)(dx_p, poses)
        new_planes = planes + dx_l
        # renormalize plane normals (4-dof overparametrized update)
        norm = jnp.linalg.norm(new_planes[:, :3], axis=1, keepdims=True)
        norm = jnp.maximum(norm, 1e-9)
        new_planes = jnp.concatenate(
            [new_planes[:, :3] / norm, new_planes[:, 3:] / norm], axis=1
        )
        chi2_new = _obs_terms(new_poses, new_planes, prob)[4]
        improved = chi2_new < t["chi2"]
        rel_impr = (t["chi2"] - chi2_new) / jnp.maximum(t["chi2"], 1e-12)
        return (
            jnp.where(improved, new_poses, poses),
            jnp.where(improved, new_planes, planes),
            jnp.where(improved, lam / lm_step, lam * lm_step),
            jnp.where(improved, chi2_new, t["chi2"]),
            it + 1,
            done | (improved & (rel_impr < 1e-8)),
        )

    def lm_cond(carry):
        _, _, _, _, it, done = carry
        return (it < max_iters) & ~done

    chi2_0 = _obs_terms(prob.poses, prob.planes, prob)[4]
    poses, planes, _, chi2, iters, _ = jax.lax.while_loop(
        lm_cond,
        lm_body,
        (
            prob.poses,
            prob.planes,
            jnp.array(lm_lambda0),
            chi2_0,
            jnp.array(0),
            jnp.array(False),
        ),
    )
    return poses, planes, chi2, iters


def associate_planes(
    poses, plane_sets, max_planes: int, cos_thresh: float = 0.97, d_thresh: float = 0.15
):
    """Greedy data association of per-keyframe PlaneSets into global plane
    landmarks using the current pose estimates (host-side, runs once before
    BA — the reference's plane identity tracking is its matched-plane
    bookkeeping in `LabelizeSequence.cpp:129-154`).

    plane_sets: list over keyframes of PlaneSet (kf frame).  Returns a
    PlaneBAProblem (capacities: len(plane_sets) poses, max_planes landmarks,
    all valid observations).
    """
    import numpy as np

    poses_np = [np.asarray(p) for p in poses]
    globals_n: list[np.ndarray] = []
    globals_d: list[float] = []
    obs_kf, obs_pl, obs, w = [], [], [], []

    for i, ps in enumerate(plane_sets):
        valid = np.asarray(ps.valid)
        normals = np.asarray(ps.normal)
        ds = np.asarray(ps.d)
        ninl = np.asarray(ps.n_inliers)
        r = poses_np[i][:3, :3]
        t = poses_np[i][:3, 3]
        for j in np.where(valid)[0]:
            n_kf = normals[j]
            d_kf = float(ds[j])
            # to world: n_w = R n_kf, d_w = d_kf - n_w . t
            n_w = r @ n_kf
            d_w = d_kf - float(n_w @ t)
            # match against existing landmarks
            best = -1
            for g, (gn, gd) in enumerate(zip(globals_n, globals_d)):
                if float(gn @ n_w) > cos_thresh and abs(gd - d_w) < d_thresh:
                    best = g
                    break
            if best < 0:
                if len(globals_n) >= max_planes:
                    continue
                globals_n.append(n_w)
                globals_d.append(d_w)
                best = len(globals_n) - 1
            obs_kf.append(i)
            obs_pl.append(best)
            obs.append(np.concatenate([n_kf, [d_kf]]))
            w.append(max(float(ninl[j]), 1.0))

    m = max_planes
    planes = np.zeros((m, 4), np.float32)
    for g, (gn, gd) in enumerate(zip(globals_n, globals_d)):
        planes[g, :3] = gn
        planes[g, 3] = gd
    o = len(obs)
    return PlaneBAProblem(
        poses=jnp.asarray(np.stack(poses_np)),
        planes=jnp.asarray(planes),
        obs_kf=jnp.asarray(np.asarray(obs_kf, np.int32)),
        obs_pl=jnp.asarray(np.asarray(obs_pl, np.int32)),
        obs=jnp.asarray(np.stack(obs).astype(np.float32)) if o else jnp.zeros((0, 4)),
        w=jnp.asarray(np.asarray(w, np.float32)) if o else jnp.zeros((0,)),
    )
