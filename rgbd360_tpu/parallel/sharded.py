"""Multi-chip sharding of the map-scale SLAM stages.

The reference is a single-process shared-memory program; its only
parallelism is OpenMP (SURVEY.md section 2.5).  The TPU-native scaling axis
is the *map*: keyframes, loop-closure candidate matching and pose-graph BA
shard over a `jax.sharding.Mesh` by keyframe/edge index, with XLA
collectives doing the reductions that the reference's OpenMP `reduction(+)`
pragmas did on one machine:

  * `sharded_plane_scan` — the LoopCloser/Relocalizer batch matcher with the
    keyframe axis sharded: each device matches the query against its KF
    shard; results stay sharded (the host only gathers the few survivors).
  * `sharded_pair_align` — batch dense GN normal-equation assembly for many
    keyframe pairs, data-parallel over pairs.
  * `distributed_pose_graph` — pose-graph LM with the EDGE set sharded:
    every device assembles H/b blocks for its edges, a `psum` over the mesh
    forms the global normal equations, and the (small, dense) solve runs
    replicated.  This is the reduce+replicated-solve pattern; the Schur
    -complement variant for very large maps keeps the same psum structure.

Everything works unchanged on one device (mesh of size 1), and the driver's
`dryrun_multichip` exercises it on N virtual devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rgbd360_tpu.config import MatcherConfig
from rgbd360_tpu.ops import se3
from rgbd360_tpu.registration.planes import (
    PLANAR_3DOF,
    match_planes,
    pose_from_matches,
)
from rgbd360_tpu.slam.graph import PoseGraph, _adjoint, _edge_residuals


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # Not enough devices on the default backend (e.g. one real TPU chip):
        # fall back to the host CPU devices so N-way sharding still compiles
        # and executes (the standard virtual-device testing setup).
        try:
            devs = jax.devices("cpu")
        except RuntimeError:
            pass
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# TPU lowers svd (and other linalg it implements as JAX-level iterations)
# to while_loops carrying unvarying scalar bools; under shard_map's manual
# axes the static varying-manual-axes check rejects those carries even
# though the program is correct (no cross-shard dependence).  The check is
# therefore disabled ONLY for the programs that carry such linalg in their
# bodies (`_shard_map_linalg`, currently the plane scan's SVD pose solve);
# every other sharded program keeps the static check (`_shard_map`).  The
# collective structure of all of them is additionally verified numerically
# against the unsharded reference path in tests/test_parallel.py, and
# tests/test_parallel.py::test_checked_shard_maps_trace_with_vma guards the
# scoping.
_shard_map = shard_map
_shard_map_linalg = partial(shard_map, check_vma=False)


# ------------------------------------------------------------- plane scan


def sharded_plane_scan(
    mesh: Mesh,
    map_planes,
    query,
    gate: jnp.ndarray,
    cfg: MatcherConfig,
    mode: int = PLANAR_3DOF,
):
    """Batch plane matching of one query against all keyframes, sharded over
    the leading keyframe axis.  Returns (n_matches, area, pose, info, obs)
    with the keyframe axis sharded across the mesh."""

    def local(map_shard, gate_shard, query_rep):
        def one(kf_planes, g):
            pairs, n = match_planes(kf_planes, query_rep, cfg, mode)
            pose, info, obs = pose_from_matches(kf_planes, query_rep, pairs, n)
            vm = pairs[:, 0] >= 0
            area = jnp.sum(
                jnp.where(vm, kf_planes.area[jnp.clip(pairs[:, 0], 0, None)], 0.0)
            )
            return jnp.where(g, n, 0), area, pose, info, obs & g

        return jax.vmap(one)(map_shard, gate_shard)

    fn = _shard_map_linalg(  # pose_from_matches carries an SVD
        local,
        mesh=mesh,
        in_specs=(P("kf"), P("kf"), P()),
        out_specs=(P("kf"), P("kf"), P("kf"), P("kf"), P("kf")),
    )
    return jax.jit(fn)(map_planes, gate, query)


# ------------------------------------------------------------ pair align


def sharded_pair_align(mesh: Mesh, src_gray, src_depth, trg_pack, poses, cfg, method):
    """One dense GN sweep for a batch of pairs, sharded over the pair axis.

    Returns per-pair (hessian, gradient, mean_err) sharded over 'kf'.
    """
    from rgbd360_tpu.registration import dense as D

    def local(sg, sd, tp, ps):
        def one(g, d, t, p):
            pts, valid = D._src_points(d, cfg)
            h, gr, stats = D._hess_grad_packed(g, pts, valid, t, p, cfg, method)
            return h, gr, stats["mean_err"]

        return jax.vmap(one)(sg, sd, tp, ps)

    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(P("kf"), P("kf"), P("kf"), P("kf")),
        out_specs=(P("kf"), P("kf"), P("kf")),
    )
    return jax.jit(fn)(src_gray, src_depth, trg_pack, poses)


# ------------------------------------------------------- distributed graph


def _local_normal_contribs(poses, graph: PoseGraph, dcs=None):
    """Per-edge H/b contributions for the edges in this shard (same math as
    slam.graph._graph_normal_equations, minus the global scatter)."""
    from rgbd360_tpu.slam.graph import _dcs_scale

    e, i, j = _edge_residuals(poses, graph)
    w = graph.emask.astype(poses.dtype)
    tj = poses[j]
    a = _adjoint(se3.se3_inverse(tj))
    lam = graph.info * w[:, None, None]
    if dcs is not None:
        s = _dcs_scale(e, lam, dcs, poses.dtype)
        lam = lam * (s * s)[:, None, None]
    aw = jnp.einsum("eki,ekl->eil", a, lam)
    h_jj = jnp.einsum("eil,elm->eim", aw, a)
    b_j = jnp.einsum("eil,el->ei", aw, e)
    chi2 = jnp.sum(jnp.einsum("ei,eil,el->e", e, lam, e))
    return h_jj, b_j, i, j, chi2


@partial(jax.jit, static_argnames=("mesh", "max_iters"))
def distributed_pose_graph(
    mesh: Mesh,
    graph: PoseGraph,
    max_iters: int = 10,
    lm_lambda0: float = 1e-5,
    lm_step: float = 10.0,
):
    """Pose-graph LM with edge-sharded normal-equation assembly.

    Poses are replicated; the edge arrays shard over the mesh; a psum forms
    the global H/b on every device; the dense solve is replicated.  Returns
    (poses, chi2, iters), numerically identical to
    `slam.graph.optimize_pose_graph`.
    """
    n = graph.poses.shape[0]

    def local_assemble(poses, edges_ij, rel, info, emask):
        g_local = PoseGraph(
            poses=poses,
            vmask=jnp.ones((n,), bool),
            edges_ij=edges_ij,
            rel=rel,
            info=info,
            emask=emask,
        )
        h_jj, b_j, i, j, chi2 = _local_normal_contribs(poses, g_local)
        hblocks = jnp.zeros((n, n, 6, 6))
        hblocks = hblocks.at[j, j].add(h_jj)
        hblocks = hblocks.at[i, i].add(h_jj)
        hblocks = hblocks.at[i, j].add(-h_jj)
        hblocks = hblocks.at[j, i].add(-h_jj)
        b = jnp.zeros((n, 6))
        b = b.at[j].add(b_j)
        b = b.at[i].add(-b_j)
        # the BA collective: reduce partial normal equations over the mesh
        hblocks = jax.lax.psum(hblocks, "kf")
        b = jax.lax.psum(b, "kf")
        chi2 = jax.lax.psum(chi2, "kf")
        return hblocks, b, chi2

    assemble = _shard_map(
        local_assemble,
        mesh=mesh,
        in_specs=(P(), P("kf"), P("kf"), P("kf"), P("kf")),
        out_specs=(P(), P(), P()),
    )

    vmask = graph.vmask

    def normal_eq(poses):
        hblocks, b, chi2 = assemble(
            poses, graph.edges_ij, graph.rel, graph.info, graph.emask
        )
        eye6 = jnp.eye(6)
        prior = jnp.where(vmask, 1e-6, 1.0)[:, None, None] * eye6[None]
        prior = prior.at[0].add(1e6 * eye6)
        d_idx = jnp.arange(n)
        hblocks = hblocks.at[d_idx, d_idx].add(prior)
        h = hblocks.transpose(0, 2, 1, 3).reshape(n * 6, n * 6)
        return h, b.reshape(-1), chi2

    def body(carry):
        poses, lam, chi2_prev, it, done = carry
        h, b, chi2 = normal_eq(poses)
        diag = jnp.diag(jnp.diag(h))
        delta = -jnp.linalg.solve(h + lam * diag + 1e-9 * jnp.eye(n * 6), b)
        new_poses = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(
            delta.reshape(n, 6), poses
        )
        _, _, chi2_new = normal_eq(new_poses)
        improved = chi2_new < chi2
        rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        return (
            jnp.where(improved, new_poses, poses),
            jnp.where(improved, lam / lm_step, lam * lm_step),
            jnp.where(improved, chi2_new, chi2),
            it + 1,
            done | (improved & (rel_impr < 1e-6)),
        )

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & ~done

    chi2_0 = normal_eq(graph.poses)[2]
    poses, _, chi2, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (graph.poses, jnp.array(lm_lambda0), chi2_0, jnp.array(0), jnp.array(False)),
    )
    return poses, chi2, iters


def _pcg_sharded(matvec, precond, b, iters, tol, axis):
    """Pipelined (Chronopoulos–Gear) PCG whose state vectors are sharded
    over `axis`.

    The same restructured iteration AND the same M-norm stopping rule as
    `slam.graph._pcg` (gamma = (r, M^-1 r) vs tol^2 * gamma_0), so the
    single-device and sharded solvers terminate on the same criterion at
    the same iteration counts — the dryrun's sharded-vs-single gate is not
    absorbing a solver discrepancy.  Pipelining also pays on the mesh: the
    two scalars the update needs (gamma and delta) come out of ONE fused
    psum, and no separate p.Hp reduction exists, so a CG step costs exactly
    3 collectives (all_gather x, psum_scatter y inside the matvec, psum
    [gamma, delta]) where textbook PCG costs 4; collective latency is what
    bounds PCG on a real pod, so the count matters more than the bytes."""

    def dots2(u1, v1, u2, v2):
        return jax.lax.psum(jnp.stack([jnp.sum(u1 * v1), jnp.sum(u2 * v2)]), axis)

    x = jnp.zeros_like(b)
    r = b
    u = precond(r)
    w = matvec(u)
    gd = dots2(r, u, w, u)
    gamma, delta = gd[0], gd[1]
    alpha = gamma / jnp.maximum(delta, 1e-30)
    g0 = gamma

    def body(carry):
        x, r, u, w, p, s, gamma, alpha, it = carry
        x = x + alpha * p
        r = r - alpha * s
        u_new = precond(r)
        w_new = matvec(u_new)
        gd = dots2(r, u_new, w_new, u_new)
        gamma_new, delta = gd[0], gd[1]
        beta = gamma_new / jnp.maximum(gamma, 1e-30)
        alpha_new = gamma_new / jnp.maximum(
            delta - beta * gamma_new / jnp.maximum(alpha, 1e-30), 1e-30
        )
        p = u_new + beta * p
        s = w_new + beta * s
        return x, r, u_new, w_new, p, s, gamma_new, alpha_new, it + 1

    def cond(carry):
        gamma, it = carry[6], carry[8]
        return (it < iters) & (gamma > tol * tol * jnp.maximum(g0, 1e-30))

    x, _, _, _, _, _, _, _, n_it = jax.lax.while_loop(
        cond, body, (x, r, u, w, u, w, gamma, alpha, 0)
    )
    return x, n_it


@partial(jax.jit, static_argnames=("mesh", "max_iters", "cg_iters"))
def distributed_pose_graph_pcg(
    mesh: Mesh,
    graph: PoseGraph,
    max_iters: int = 10,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    lm_lambda0: float = 1e-5,
    lm_step: float = 10.0,
    loop_mask: jnp.ndarray | None = None,
    dcs_phi: float = 10.0,
):
    """Edge- AND vertex-sharded, matrix-free distributed pose-graph LM.

    The scalable form of `distributed_pose_graph`: the edge arrays shard
    over the mesh, and so do the CG state vectors and the block-Jacobi
    preconditioner (by vertex), so BOTH the O(E) edge sweeps and the O(N)
    vector work split across devices — replicating the CG state caps
    strong scaling at the edge-sweep fraction (measured ~50% on 2 devices).
    Each H-matvec is all_gather(x) -> local edge sweep -> psum_scatter(y):
    the all-gather + reduce-scatter pair moves the same bytes as the psum
    it replaces, riding ICI on a real pod slice.  Per-device memory is
    O(N/devices + E/devices) for the solver state (poses themselves stay
    replicated — they are needed at both endpoints of local edges).
    Numerically matches `slam.graph.optimize_pose_graph_pcg`.

    Requires n_vertices and n_edges divisible by the mesh size (pad the
    fixed-capacity graph arrays, which Map360 already sizes in powers of 2).
    """
    from rgbd360_tpu.slam.graph import _edge_terms, _prior_diag

    n = graph.poses.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev or graph.edges_ij.shape[0] % n_dev:
        raise ValueError(
            f"graph capacity (N={n}, E={graph.edges_ij.shape[0]}) must be "
            f"divisible by the mesh size ({n_dev})"
        )
    prior = _prior_diag(graph, graph.poses.dtype)

    def scatter(full):
        """Sum over devices, keep this device's vertex block."""
        return jax.lax.psum_scatter(full, "kf", scatter_dimension=0, tiled=True)

    def local_lm_step(poses, lam, prior_sh, edges_ij, rel, info, emask, loop_w):
        g_local = PoseGraph(
            poses=poses,
            vmask=jnp.ones((n,), bool),
            edges_ij=edges_ij,
            rel=rel,
            info=info,
            emask=emask,
        )
        # robust loop closures (DCS) on the local edge shard — the switch is
        # a per-edge formula, so it distributes with the edges for free
        dcs = None if loop_mask is None else (loop_w, jnp.asarray(dcs_phi))
        m_e, b_j, chi2_l, i, j = _edge_terms(poses, g_local, dcs)
        # vertex-sharded right-hand side and Jacobi blocks
        b_sh = scatter(jnp.zeros((n, 6)).at[j].add(b_j).at[i].add(-b_j))
        chi2 = jax.lax.psum(chi2_l, "kf")
        bd0_sh = scatter(jnp.zeros((n, 6, 6)).at[j].add(m_e).at[i].add(m_e)) + prior_sh
        lm_diag_sh = lam * bd0_sh * jnp.eye(6)
        bd_inv_sh = jnp.linalg.inv(bd0_sh + lm_diag_sh + 1e-9 * jnp.eye(6))

        def matvec(x_sh):
            x = jax.lax.all_gather(x_sh, "kf", axis=0, tiled=True)  # (N, 6)
            d = jnp.einsum("eil,el->ei", m_e, x[j] - x[i])
            y_sh = scatter(jnp.zeros((n, 6)).at[j].add(d).at[i].add(-d))
            return y_sh + jnp.einsum("nil,nl->ni", prior_sh + lm_diag_sh, x_sh)

        delta_sh, _ = _pcg_sharded(
            matvec,
            lambda r: jnp.einsum("nil,nl->ni", bd_inv_sh, r),
            -b_sh,
            cg_iters,
            cg_tol,
            "kf",
        )
        delta = jax.lax.all_gather(delta_sh, "kf", axis=0, tiled=True)
        new_poses = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(delta, poses)
        chi2_new = jax.lax.psum(_edge_terms(new_poses, g_local, dcs)[2], "kf")
        return new_poses, chi2, chi2_new

    # linalg-exempt: the replicated outputs come out of all_gather/psum, but
    # the static check cannot infer replication through _pcg_sharded's
    # while_loop carries and the 6x6 jnp.linalg.inv
    step = _shard_map_linalg(
        local_lm_step,
        mesh=mesh,
        in_specs=(P(), P(), P("kf"), P("kf"), P("kf"), P("kf"), P("kf"), P("kf")),
        out_specs=(P(), P(), P()),
    )
    lm_arr = (
        jnp.zeros((graph.edges_ij.shape[0],), bool) if loop_mask is None else loop_mask
    )

    def body(carry):
        poses, lam, chi2_prev, it, done = carry
        new_poses, chi2, chi2_new = step(
            poses, lam, prior, graph.edges_ij, graph.rel, graph.info, graph.emask,
            lm_arr,
        )
        improved = chi2_new < chi2
        rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        return (
            jnp.where(improved, new_poses, poses),
            jnp.where(improved, lam / lm_step, lam * lm_step),
            jnp.where(improved, chi2_new, chi2),
            it + 1,
            done | (improved & (rel_impr < 1e-6)),
        )

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & ~done

    poses, _, chi2, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (
            graph.poses,
            jnp.array(lm_lambda0),
            jnp.array(jnp.inf),
            jnp.array(0),
            jnp.array(False),
        ),
    )
    return poses, chi2, iters


# ------------------------------------------------------ distributed plane BA


@partial(jax.jit, static_argnames=("mesh", "max_iters", "cg_iters"))
def distributed_plane_ba(
    mesh: Mesh,
    prob,
    max_iters: int = 10,
    cg_iters: int = 50,
    cg_tol: float = 1e-6,
    lm_lambda0: float = 1e-4,
    lm_step: float = 10.0,
):
    """Observation-sharded planar bundle adjustment (Schur complement over
    plane landmarks, reduce over the mesh).

    The OBSERVATION arrays shard across devices; poses and plane landmarks
    stay replicated (they are tiny next to the observation set).  Every
    matrix-free Schur matvec is: local observation sweep -> psum the (M, 4)
    landmark intermediate -> local sweep -> psum the (N, 6) pose result —
    the BA-over-collectives pattern from SURVEY 5.8/7.  Numerically matches
    `slam.plane_ba.optimize_plane_ba`.  Requires n_obs divisible by the
    mesh size (pad with w=0 observations).
    """
    from rgbd360_tpu.slam import plane_ba as B

    n = prob.poses.shape[0]
    m = prob.planes.shape[0]
    n_dev = mesh.devices.size
    if prob.obs.shape[0] % n_dev:
        raise ValueError(
            f"n_obs ({prob.obs.shape[0]}) must divide by mesh size ({n_dev}); "
            "pad with zero-weight observations"
        )

    def local_lm_step(poses, planes, lam, obs_kf, obs_pl, obs, w):
        lprob = B.PlaneBAProblem(
            poses=poses, planes=planes, obs_kf=obs_kf, obs_pl=obs_pl, obs=obs, w=w
        )
        r, jp, jl, wv, chi2_l = B._obs_terms(poses, planes, lprob)
        chi2 = jax.lax.psum(chi2_l, "kf")
        wj = wv[:, None, None]
        i, k = obs_kf, obs_pl
        hpp = jax.lax.psum(
            jnp.zeros((n, 6, 6)).at[i].add(wj * jnp.einsum("oab,oac->obc", jp, jp)),
            "kf",
        )
        hll = jax.lax.psum(
            jnp.zeros((m, 4, 4)).at[k].add(wj * jnp.einsum("oab,oac->obc", jl, jl)),
            "kf",
        )
        b_p = jax.lax.psum(
            jnp.zeros((n, 6)).at[i].add(wv[:, None] * jnp.einsum("oab,oa->ob", jp, r)),
            "kf",
        )
        b_l = jax.lax.psum(
            jnp.zeros((m, 4)).at[k].add(wv[:, None] * jnp.einsum("oab,oa->ob", jl, r)),
            "kf",
        )
        eye6 = jnp.eye(6)
        hpp = hpp + 1e-6 * eye6[None]
        hpp = hpp.at[0].add(1e8 * eye6)
        hpp = hpp + lam * hpp * eye6[None]
        eye4 = jnp.eye(4)
        hll = hll + 1e-6 * eye4[None]
        hll = hll + lam * hll * eye4[None]
        hll_inv = jnp.linalg.inv(hll)
        t = dict(jp=jp, jl=jl, w=wv, i=i, k=k, hpp=hpp, hll_inv=hll_inv,
                 b_p=b_p, b_l=b_l, chi2=chi2)

        def matvec(x):
            jpx = jnp.einsum("oab,ob->oa", jp, x[i])
            hlp_x = jax.lax.psum(
                jnp.zeros((m, 4)).at[k].add(
                    wv[:, None] * jnp.einsum("oab,oa->ob", jl, jpx)
                ),
                "kf",
            )
            y_l = jnp.einsum("kab,kb->ka", hll_inv, hlp_x)
            jly = jnp.einsum("oab,ob->oa", jl, y_l[k])
            hpl_y = jax.lax.psum(
                jnp.zeros((n, 6)).at[i].add(
                    wv[:, None] * jnp.einsum("oab,oa->ob", jp, jly)
                ),
                "kf",
            )
            return jnp.einsum("nab,nb->na", hpp, x) - hpl_y

        y_l0 = jnp.einsum("kab,kb->ka", hll_inv, b_l)
        jly0 = jnp.einsum("oab,ob->oa", jl, y_l0[k])
        rhs = -b_p + jax.lax.psum(
            jnp.zeros((n, 6)).at[i].add(
                wv[:, None] * jnp.einsum("oab,oa->ob", jp, jly0)
            ),
            "kf",
        )
        hpp_inv = jnp.linalg.inv(hpp)
        dx_p = B._pcg(
            matvec, lambda rr: jnp.einsum("nab,nb->na", hpp_inv, rr), rhs,
            cg_iters, cg_tol,
        )
        jpx = jnp.einsum("oab,ob->oa", jp, dx_p[i])
        hlp_x = jax.lax.psum(
            jnp.zeros((m, 4)).at[k].add(
                wv[:, None] * jnp.einsum("oab,oa->ob", jl, jpx)
            ),
            "kf",
        )
        dx_l = -jnp.einsum("kab,kb->ka", hll_inv, b_l + hlp_x)

        new_poses = jax.vmap(lambda d, p: se3.se3_exp(d) @ p)(dx_p, poses)
        new_planes = planes + dx_l
        norm = jnp.maximum(jnp.linalg.norm(new_planes[:, :3], axis=1, keepdims=True), 1e-9)
        new_planes = jnp.concatenate(
            [new_planes[:, :3] / norm, new_planes[:, 3:] / norm], axis=1
        )
        lprob2 = B.PlaneBAProblem(
            poses=new_poses, planes=new_planes, obs_kf=obs_kf, obs_pl=obs_pl,
            obs=obs, w=w,
        )
        chi2_new = jax.lax.psum(
            B._obs_terms(new_poses, new_planes, lprob2)[4], "kf"
        )
        return new_poses, new_planes, chi2, chi2_new

    step = _shard_map(
        local_lm_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("kf"), P("kf"), P("kf"), P("kf")),
        out_specs=(P(), P(), P(), P()),
    )

    def body(carry):
        poses, planes, lam, chi2_prev, it, done = carry
        new_poses, new_planes, chi2, chi2_new = step(
            poses, planes, lam, prob.obs_kf, prob.obs_pl, prob.obs, prob.w
        )
        improved = chi2_new < chi2
        rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        return (
            jnp.where(improved, new_poses, poses),
            jnp.where(improved, new_planes, planes),
            jnp.where(improved, lam / lm_step, lam * lm_step),
            jnp.where(improved, chi2_new, chi2),
            it + 1,
            done | (improved & (rel_impr < 1e-8)),
        )

    def cond(carry):
        _, _, _, _, it, done = carry
        return (it < max_iters) & ~done

    poses, planes, _, chi2, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (
            prob.poses,
            prob.planes,
            jnp.array(lm_lambda0),
            jnp.array(jnp.inf),
            jnp.array(0),
            jnp.array(False),
        ),
    )
    return poses, planes, chi2, iters
