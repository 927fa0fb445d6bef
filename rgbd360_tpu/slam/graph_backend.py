"""Pluggable incremental pose-graph backend interface.

Mirrors the reference's standalone `GraphOptimization/` subsystem (abstract
`GraphOptimizer` with `addVertex / addEdge / optimizeGraph / getPoses /
saveGraph`, reference `GraphOptimization/GraphOptimizer.h` and its MRPT/G2O
implementations): an incremental builder API over the batched solvers.  Two
backends ship — the single-device LM solver and the mesh-sharded distributed
one — selected by name like the reference selects MRPT vs G2O.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rgbd360_tpu.slam.graph import PoseGraph, optimize_pose_graph


class GraphOptimizerBackend:
    """Incremental vertex/edge builder + optimize, reference-style API."""

    def __init__(
        self,
        max_vertices: int = 512,
        max_edges: int = 4096,
        backend: str = "dense",
        mesh=None,
        max_iters: int = 10,
    ):
        if backend not in ("dense", "sharded"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.mesh = mesh
        self.max_iters = max_iters
        self.graph = PoseGraph.empty(max_vertices, max_edges)
        self.n_vertices = 0
        self.n_edges = 0

    def add_vertex(self, pose: np.ndarray) -> int:
        """First vertex is gauge-fixed, like the reference (`:105`)."""
        i = self.n_vertices
        self.graph = PoseGraph(
            poses=self.graph.poses.at[i].set(jnp.asarray(pose)),
            vmask=self.graph.vmask.at[i].set(True),
            edges_ij=self.graph.edges_ij,
            rel=self.graph.rel,
            info=self.graph.info,
            emask=self.graph.emask,
        )
        self.n_vertices += 1
        return i

    def add_edge(self, i: int, j: int, rel: np.ndarray, info: np.ndarray) -> int:
        e = self.n_edges
        self.graph = PoseGraph(
            poses=self.graph.poses,
            vmask=self.graph.vmask,
            edges_ij=self.graph.edges_ij.at[e].set(
                jnp.asarray([i, j], jnp.int32)
            ),
            rel=self.graph.rel.at[e].set(jnp.asarray(rel)),
            info=self.graph.info.at[e].set(jnp.asarray(info)),
            emask=self.graph.emask.at[e].set(True),
        )
        self.n_edges += 1
        return e

    def optimize(self):
        """Run the configured solver; returns (chi2, iterations)."""
        if self.backend == "sharded":
            from rgbd360_tpu.parallel.sharded import distributed_pose_graph, make_mesh

            mesh = self.mesh or make_mesh()
            poses, chi2, iters = distributed_pose_graph(
                mesh, self.graph, self.max_iters
            )
        else:
            poses, chi2, iters = optimize_pose_graph(self.graph, self.max_iters)
        self.graph = PoseGraph(
            poses=poses,
            vmask=self.graph.vmask,
            edges_ij=self.graph.edges_ij,
            rel=self.graph.rel,
            info=self.graph.info,
            emask=self.graph.emask,
        )
        return float(chi2), int(iters)

    def get_poses(self) -> np.ndarray:
        return np.asarray(self.graph.poses[: self.n_vertices])

    def save_graph(self, path: str) -> None:
        """g2o-style text dump (VERTEX_SE3 rows + EDGE_SE3 rows), the
        reference `GraphOptimizer::saveGraph:273` capability."""
        with open(path, "w") as f:
            poses = np.asarray(self.graph.poses)
            for i in range(self.n_vertices):
                t = poses[i][:3, 3]
                f.write(f"VERTEX_SE3 {i} {t[0]} {t[1]} {t[2]}\n")
            edges = np.asarray(self.graph.edges_ij)
            rels = np.asarray(self.graph.rel)
            for e in range(self.n_edges):
                i, j = edges[e]
                t = rels[e][:3, 3]
                f.write(f"EDGE_SE3 {i} {j} {t[0]} {t[1]} {t[2]}\n")
