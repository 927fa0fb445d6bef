"""SE(3) pose-graph optimization in pure JAX.

Replaces the reference's g2o backend (`include/GraphOptimizer.h:66-216`:
BlockSolverX + dense linear solver + Levenberg-Marquardt, 10 iterations) with
a dense batched Gauss-Newton/LM solver: per-edge residuals
e_ij = log(Z_ij^-1 T_i^-1 T_j), first-order jacobians via the adjoint, one
scatter-add into the (6N x 6N) normal matrix, Cholesky solve on the MXU.
Dense is the right call at the reference's scale — the reference itself
chooses `LinearSolverDense` (`GraphOptimizer.h:67`) — and a 3072x3072
factorization is microseconds of MXU time.  For maps beyond ~1k keyframes,
`optimize_pose_graph_pcg` swaps the dense solve for a matrix-free
block-Jacobi-preconditioned conjugate-gradient solver whose H-matvec is two
gathers and two scatter-adds over the edge list (O(E) memory instead of
O(N^2)); the edge-sharded multi-chip variant lives in `parallel/sharded.py`.

Gauge freedom is fixed by a strong prior on vertex 0 (the reference fixes the
first vertex, `GraphOptimizer.h:105`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import GraphConfig
from rgbd360_tpu.ops import se3


@jax.tree_util.register_dataclass
@dataclass
class PoseGraph:
    """Fixed-capacity pose graph.

    poses:   (N, 4, 4) vertex poses (world <- keyframe)
    vmask:   (N,) bool vertex validity
    edges_ij:(E, 2) int32 vertex indices, -1 padded
    rel:     (E, 4, 4) measured relative pose Z_ij with x_i = Z_ij x_j
    info:    (E, 6, 6) measurement information
    emask:   (E,) bool edge validity
    """

    poses: jnp.ndarray
    vmask: jnp.ndarray
    edges_ij: jnp.ndarray
    rel: jnp.ndarray
    info: jnp.ndarray
    emask: jnp.ndarray

    @staticmethod
    def empty(n: int, e: int) -> "PoseGraph":
        return PoseGraph(
            poses=jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            vmask=jnp.zeros((n,), bool),
            edges_ij=jnp.full((e, 2), -1, jnp.int32),
            rel=jnp.broadcast_to(jnp.eye(4), (e, 4, 4)),
            info=jnp.broadcast_to(jnp.eye(6), (e, 6, 6)),
            emask=jnp.zeros((e,), bool),
        )


def _edge_residuals(poses, graph: PoseGraph):
    """Per-edge residual twists + adjoint jacobian factors."""
    i = jnp.clip(graph.edges_ij[:, 0], 0, None)
    j = jnp.clip(graph.edges_ij[:, 1], 0, None)
    ti = poses[i]
    tj = poses[j]
    m = se3.se3_inverse(graph.rel) @ se3.se3_inverse(ti) @ tj
    e = se3.se3_log(m)  # (E, 6)
    return e, i, j


def _adjoint(t4):
    """SE(3) adjoint (..., 6, 6) for twist order (v, w)."""
    r = t4[..., :3, :3]
    t = t4[..., :3, 3]
    tx = se3.skew(t)
    top = jnp.concatenate([r, tx @ r], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(r), r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _dcs_scale(e, lam, dcs, dtype):
    """Per-edge Dynamic Covariance Scaling factors s_e in (0, 1].

    DCS (Agarwal et al., ICRA'13) is the closed-form generalization of
    switchable constraints: s_e = min(1, 2*phi / (phi + chi2_e)), applied as
    Λ_e <- s_e^2 Λ_e.  A consistent loop closure keeps s ~ 1; a wrong one is
    driven toward 0, which is the capability the reference reached for with
    the (absent) RRR library (`include/GraphOptimizer.h:28-29,76-80`) — here
    it is a branch-free per-edge formula instead of an external
    cluster-and-test pass, so it stays inside the jitted LM loop.
    """
    loop_w, phi = dcs
    c_e = jnp.einsum("ei,eil,el->e", e, lam, e)
    s = jnp.minimum(1.0, 2.0 * phi / jnp.maximum(phi + c_e, 1e-12))
    return jnp.where(loop_w, s, jnp.ones_like(s)).astype(dtype)


def _graph_normal_equations(poses, graph: PoseGraph, dcs=None):
    """Assemble H (N*6, N*6), b (N*6) and total chi2."""
    n = poses.shape[0]
    e, i, j = _edge_residuals(poses, graph)
    w = graph.emask.astype(poses.dtype)

    # First-order jacobian of e wrt left-multiplicative updates on T_i/T_j:
    # e(d) ~ e0 + Adj(T_j^-1) (d_j - d_i)  (small-residual approximation,
    # standard for pose-graph GN; LM damping covers the rest).
    tj = poses[j]
    a = _adjoint(se3.se3_inverse(tj))  # (E, 6, 6) = J_j; J_i = -a

    lam = graph.info * w[:, None, None]
    if dcs is not None:
        s = _dcs_scale(e, lam, dcs, poses.dtype)
        lam = lam * (s * s)[:, None, None]
    aw = jnp.einsum("eki,ekl->eil", a, lam)  # A^T * info
    h_jj = jnp.einsum("eil,elm->eim", aw, a)
    b_j = jnp.einsum("eil,el->ei", aw, e)

    # scatter into dense blocks (N, N, 6, 6)
    hblocks = jnp.zeros((n, n, 6, 6), poses.dtype)
    hblocks = hblocks.at[j, j].add(h_jj)
    hblocks = hblocks.at[i, i].add(h_jj)
    hblocks = hblocks.at[i, j].add(-h_jj)
    hblocks = hblocks.at[j, i].add(-h_jj)
    b = jnp.zeros((n, 6), poses.dtype)
    b = b.at[j].add(b_j)
    b = b.at[i].add(-b_j)

    chi2 = jnp.sum(jnp.einsum("ei,eil,el->e", e, lam, e))

    # gauge prior on vertex 0 + tiny prior on invalid vertices so H stays SPD
    eye6 = jnp.eye(6, dtype=poses.dtype)
    prior = jnp.where(graph.vmask, 1e-6, 1.0)[:, None, None] * eye6[None]
    prior = prior.at[0].add(1e6 * eye6)
    diag_idx = jnp.arange(n)
    hblocks = hblocks.at[diag_idx, diag_idx].add(prior)

    h = hblocks.transpose(0, 2, 1, 3).reshape(n * 6, n * 6)
    return h, b.reshape(-1), chi2


@partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph(
    graph: PoseGraph,
    max_iters: int = 10,
    lm_lambda0: float = 1e-5,
    lm_step: float = 10.0,
    loop_mask: jnp.ndarray | None = None,
    dcs_phi: float = 10.0,
):
    """Levenberg-Marquardt over the whole graph; returns (poses, chi2, iters).

    Matches the reference's `optimizeGraph` contract (10 LM iterations,
    dense solve, first vertex fixed, `GraphOptimizer.h:181-209`).

    loop_mask: optional (E,) bool marking loop-closure edges; when given,
    those edges are robustified with Dynamic Covariance Scaling at kernel
    width `dcs_phi` (odometry edges stay hard).  Wrong loop closures are
    then suppressed instead of folding the trajectory (the RRR capability
    the reference's broken include reached for; see `_dcs_scale`).
    """
    n = graph.poses.shape[0]
    dcs = None if loop_mask is None else (loop_mask, jnp.asarray(dcs_phi))

    def body(carry):
        poses, lam, chi2_prev, it, done = carry
        h, b, chi2 = _graph_normal_equations(poses, graph, dcs)
        diag = jnp.diag(jnp.diag(h))
        delta = -jnp.linalg.solve(h + lam * diag + 1e-9 * jnp.eye(n * 6), b)
        delta = delta.reshape(n, 6)
        new_poses = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(delta, poses)
        _, _, chi2_new = _graph_normal_equations(new_poses, graph, dcs)
        improved = chi2_new < chi2
        poses_next = jnp.where(improved, new_poses, poses)
        lam_next = jnp.where(improved, lam / lm_step, lam * lm_step)
        rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        done_next = done | (improved & (rel_impr < 1e-6))
        return (poses_next, lam_next, jnp.where(improved, chi2_new, chi2), it + 1, done_next)

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & ~done

    init_chi2 = _graph_normal_equations(graph.poses, graph, dcs)[2]
    poses, _, chi2, iters, _ = jax.lax.while_loop(
        cond, body, (graph.poses, jnp.array(lm_lambda0), init_chi2, jnp.array(0), jnp.array(False))
    )
    return poses, chi2, iters


def graph_chi2(graph: PoseGraph) -> jnp.ndarray:
    return _graph_normal_equations(graph.poses, graph)[2]


@jax.jit
def loop_closure_switches(
    graph: PoseGraph,
    poses: jnp.ndarray,
    loop_mask: jnp.ndarray,
    dcs_phi: float = 10.0,
) -> jnp.ndarray:
    """Per-edge DCS switch values s_e in (0, 1] at the given solution.

    Edges with s well below 1 (e.g. < 0.25) are inconsistent loop closures;
    callers prune them by clearing `emask` — the analysis half of the RRR
    reject/recover loop, computed in one vectorized pass.
    """
    e, _, _ = _edge_residuals(poses, graph)
    lam = graph.info * graph.emask.astype(poses.dtype)[:, None, None]
    return _dcs_scale(e, lam, (loop_mask, jnp.asarray(dcs_phi)), poses.dtype)


# ----------------------------------------------------- matrix-free PCG path


def _edge_terms(poses, graph: PoseGraph, dcs=None):
    """Per-edge quantities reused by chi2 / gradient / matvec:
    m_e = a_e^T Λ_e a_e (E, 6, 6), b contributions, chi2."""
    e, i, j = _edge_residuals(poses, graph)
    w = graph.emask.astype(poses.dtype)
    a = _adjoint(se3.se3_inverse(poses[j]))
    lam = graph.info * w[:, None, None]
    if dcs is not None:
        s = _dcs_scale(e, lam, dcs, poses.dtype)
        lam = lam * (s * s)[:, None, None]
    aw = jnp.einsum("eki,ekl->eil", a, lam)
    m_e = jnp.einsum("eil,elm->eim", aw, a)  # (E, 6, 6) PSD blocks
    b_j = jnp.einsum("eil,el->ei", aw, e)
    chi2 = jnp.sum(jnp.einsum("ei,eil,el->e", e, lam, e))
    return m_e, b_j, chi2, i, j


def _prior_diag(graph: PoseGraph, dtype):
    eye6 = jnp.eye(6, dtype=dtype)
    prior = jnp.where(graph.vmask, 1e-6, 1.0)[:, None, None] * eye6[None]
    return prior.at[0].add(1e6 * eye6)


def _hx(m_e, i, j, prior, lm_diag, x):
    """H @ x without materializing H: the graph Laplacian structure
    y_j += m_e (x_j - x_i), y_i -= m_e (x_j - x_i), plus diagonal priors
    and the LM damping term."""
    d = jnp.einsum("eil,el->ei", m_e, x[j] - x[i])  # (E, 6)
    y = jnp.zeros_like(x).at[j].add(d).at[i].add(-d)
    y = y + jnp.einsum("nil,nl->ni", prior + lm_diag, x)
    return y


def _block_diag(m_e, i, j, n, prior, lm_diag):
    """Block-diagonal of H (N, 6, 6) for the Jacobi preconditioner."""
    bd = jnp.zeros((n, 6, 6), m_e.dtype).at[j].add(m_e).at[i].add(m_e)
    return bd + prior + lm_diag


def _pcg(matvec, precond, b, iters, tol):
    """Pipelined (Chronopoulos–Gear) preconditioned CG on H x = b (H SPD).

    Mathematically identical to textbook PCG in exact arithmetic, but
    restructured for sequential-depth, the binding resource of this loop on
    TPU (each CG step is a chain of small kernels; arithmetic is trivial at
    pose-graph sizes — docs/PERFORMANCE.md round 4):

      * ONE synchronization per iteration: both scalars the update needs —
        gamma=(r,u) and delta=(w,u) — come out of a single fused reduction
        over a stacked (2,N,6) tensor, where standard PCG serializes
        (p,Hp) -> update r -> precond -> (r,z) as two dependent barriers.
      * the convergence test reuses gamma (the M-norm of r) instead of
        spending an extra (r,r) reduction in the loop condition.
    """
    x = jnp.zeros_like(b)
    r = b
    u = precond(r)
    w = matvec(u)
    gd = jnp.sum(jnp.stack([r, w]) * u[None], axis=(1, 2))
    gamma, delta = gd[0], gd[1]
    alpha = gamma / jnp.maximum(delta, 1e-30)
    g0 = gamma

    def body(carry):
        x, r, u, w, p, s, gamma, alpha, it = carry
        x = x + alpha * p
        r = r - alpha * s
        u_new = precond(r)
        w_new = matvec(u_new)
        gd = jnp.sum(jnp.stack([r, w_new]) * u_new[None], axis=(1, 2))
        gamma_new, delta = gd[0], gd[1]
        beta = gamma_new / jnp.maximum(gamma, 1e-30)
        alpha_new = gamma_new / jnp.maximum(
            delta - beta * gamma_new / jnp.maximum(alpha, 1e-30), 1e-30
        )
        p = u_new + beta * p
        s = w_new + beta * s
        return x, r, u_new, w_new, p, s, gamma_new, alpha_new, it + 1

    def cond(carry):
        _, _, _, _, _, _, gamma, _, it = carry
        return (it < iters) & (gamma > tol * tol * jnp.maximum(g0, 1e-30))

    x, _, _, _, _, _, _, _, n_it = jax.lax.while_loop(
        cond, body, (x, r, u, w, u, w, gamma, alpha, 0)
    )
    return x, n_it


@partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def optimize_pose_graph_pcg(
    graph: PoseGraph,
    max_iters: int = 10,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    lm_lambda0: float = 1e-5,
    lm_step: float = 10.0,
    loop_mask: jnp.ndarray | None = None,
    dcs_phi: float = 10.0,
):
    """LM with a matrix-free block-Jacobi PCG linear solver.

    Numerically equivalent to `optimize_pose_graph` (same residual model,
    same LM schedule) but never materializes the (6N, 6N) normal matrix:
    memory is O(N + E) and the per-CG-iteration cost is two gathers + two
    scatter-adds over the edge list.  Use for maps beyond ~1k keyframes
    where the dense Cholesky becomes the bottleneck.
    """
    n = graph.poses.shape[0]
    prior = _prior_diag(graph, graph.poses.dtype)
    dcs = None if loop_mask is None else (loop_mask, jnp.asarray(dcs_phi))

    def body(carry):
        poses, lam, chi2_prev, it, done = carry
        m_e, b_j, chi2, i, j = _edge_terms(poses, graph, dcs)
        b = jnp.zeros((n, 6), poses.dtype).at[j].add(b_j).at[i].add(-b_j)
        bd0 = _block_diag(m_e, i, j, n, prior, 0.0 * prior)
        lm_diag = lam * bd0 * jnp.eye(6, dtype=poses.dtype)  # damp diagonal
        bd = bd0 + lm_diag
        bd_inv = jnp.linalg.inv(bd + 1e-9 * jnp.eye(6, dtype=poses.dtype))

        delta, _ = _pcg(
            lambda x: _hx(m_e, i, j, prior, lm_diag, x),
            lambda r: jnp.einsum("nil,nl->ni", bd_inv, r),
            -b,
            cg_iters,
            cg_tol,
        )
        new_poses = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(delta, poses)
        chi2_new = _edge_terms(new_poses, graph, dcs)[2]
        improved = chi2_new < chi2
        poses_next = jnp.where(improved, new_poses, poses)
        lam_next = jnp.where(improved, lam / lm_step, lam * lm_step)
        rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        done_next = done | (improved & (rel_impr < 1e-6))
        return (
            poses_next,
            lam_next,
            jnp.where(improved, chi2_new, chi2),
            it + 1,
            done_next,
        )

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & ~done

    init_chi2 = _edge_terms(graph.poses, graph, dcs)[2]
    poses, _, chi2, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (
            graph.poses,
            jnp.array(lm_lambda0),
            init_chi2,
            jnp.array(0),
            jnp.array(False),
        ),
    )
    return poses, chi2, iters
