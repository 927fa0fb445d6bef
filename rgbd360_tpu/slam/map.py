"""Keyframe map state (Map360 equivalent) as a fixed-capacity pytree.

Mirrors the reference `include/Map360.h`: keyframe spheres + trajectory
poses + optimized poses + the connection (edge) set + SSO co-visibility
matrices + topological areas — but as dense padded device arrays, so every
map-scale operation (loop-closure search, relocalization, pose-graph BA,
partitioning) is one jitted batched program, and the map shards over a
device mesh by keyframe index at scale (SURVEY.md section 5.7/5.8).

There is no mutex: the map is immutable; updates return a new Map360 (the
arrays are donated under jit, so in practice they update in place).  That
removes the reference's `mapMutex` class of races by construction.

Keyframe payload kept on device per KF: the spherical gray/depth images
(bfloat16) — enough to rebuild alignment pyramids for loop-closure dense
verification — plus the PlaneSet.  512 KFs of 320x1920 bf16 gray+depth is
~1.2 GB of HBM.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import MapConfig
from rgbd360_tpu.ops.segmentation import PlaneSet
from rgbd360_tpu.slam.graph import PoseGraph


@jax.jit
def _add_edges_impl(
    edges_ij, rel, info, emask, edge_is_lc, sso, n_edges,
    new_ij, new_rel, new_info, new_sso, new_lc,
):
    """Scatter E new edges into the padded edge arrays in one program."""
    idx = n_edges + jnp.arange(new_ij.shape[0])
    i, j = new_ij[:, 0], new_ij[:, 1]
    return (
        (
            edges_ij.at[idx].set(new_ij),
            rel.at[idx].set(new_rel),
            info.at[idx].set(new_info),
            emask.at[idx].set(True),
        ),
        n_edges + new_ij.shape[0],
        edge_is_lc.at[idx].set(new_lc),
        sso.at[i, j].set(new_sso).at[j, i].set(new_sso),
    )


@jax.tree_util.register_dataclass
@dataclass
class Map360:
    """Fixed-capacity SLAM map.

    n_kf:     () int32 — number of live keyframes
    poses:    (N, 4, 4) trajectory poses (world <- kf)
    opt_poses:(N, 4, 4) optimized poses
    gray:     (N, H, W) bfloat16 spherical gray
    depth:    (N, H, W) bfloat16 spherical radial depth
    planes:   PlaneSet with leading (N,) axis
    graph:    PoseGraph over the keyframes
    n_edges:  () int32
    sso:      (N, N) float32 sensed-space-overlap matrix
    area:     (N,) int32 topological area id per keyframe
    n_areas:  () int32
    """

    n_kf: jnp.ndarray
    poses: jnp.ndarray
    opt_poses: jnp.ndarray
    gray: jnp.ndarray
    depth: jnp.ndarray
    planes: PlaneSet
    graph: PoseGraph
    n_edges: jnp.ndarray
    edge_is_lc: jnp.ndarray
    sso: jnp.ndarray
    area: jnp.ndarray
    n_areas: jnp.ndarray

    # ----------------------------------------------------------- creation

    @staticmethod
    def empty(cfg: MapConfig, sphere_h: int, sphere_w: int, max_planes: int, hull_dirs: int) -> "Map360":
        n = cfg.max_keyframes
        e = cfg.max_edges
        zero_planes = PlaneSet(
            normal=jnp.zeros((n, max_planes, 3)),
            center=jnp.zeros((n, max_planes, 3)),
            d=jnp.zeros((n, max_planes)),
            curvature=jnp.zeros((n, max_planes)),
            area=jnp.zeros((n, max_planes)),
            elongation=jnp.ones((n, max_planes)),
            n_inliers=jnp.zeros((n, max_planes)),
            hull=jnp.zeros((n, max_planes, hull_dirs, 3)),
            hue_hist=jnp.zeros((n, max_planes, 37)),
            main_color=jnp.zeros((n, max_planes, 3)),
            valid=jnp.zeros((n, max_planes), bool),
        )
        return Map360(
            n_kf=jnp.int32(0),
            poses=jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            opt_poses=jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            gray=jnp.zeros((n, sphere_h, sphere_w), jnp.bfloat16),
            depth=jnp.zeros((n, sphere_h, sphere_w), jnp.bfloat16),
            planes=zero_planes,
            graph=PoseGraph.empty(n, e),
            n_edges=jnp.int32(0),
            edge_is_lc=jnp.zeros((e,), bool),
            sso=jnp.zeros((n, n), jnp.float32),
            area=jnp.zeros((n,), jnp.int32),
            n_areas=jnp.int32(1),
        )

    # ------------------------------------------------------------ updates

    def grow(
        self, kf_capacity: int | None = None, edge_capacity: int | None = None
    ) -> "Map360":
        """Copy with enlarged fixed capacities.

        With no arguments both capacities double; passing only one grows
        only that axis (an edge-capacity bump must not double the much
        heavier keyframe payload arrays).  SURVEY section 7's dynamic-map-
        growth mitigation: capacities bump geometrically, so downstream
        jitted programs re-compile once per bump — never per frame.
        Contents are preserved; new slots are the same inert padding
        `empty` produces."""
        n_old = self.poses.shape[0]
        e_old = self.graph.edges_ij.shape[0]
        if kf_capacity is None and edge_capacity is None:
            kf_capacity, edge_capacity = 2 * n_old, 2 * e_old
        n = max(kf_capacity or n_old, n_old)
        e = max(edge_capacity or e_old, e_old)
        if n == n_old and e == e_old:
            return self
        h, w = self.gray.shape[1:]
        fresh = Map360.empty(
            MapConfig(max_keyframes=n, max_edges=e),
            h,
            w,
            self.planes.d.shape[1],
            self.planes.hull.shape[2],
        )
        pre = lambda new, old: new.at[: old.shape[0]].set(old.astype(new.dtype))
        return replace(
            fresh,
            n_kf=self.n_kf,
            poses=pre(fresh.poses, self.poses),
            opt_poses=pre(fresh.opt_poses, self.opt_poses),
            gray=pre(fresh.gray, self.gray),
            depth=pre(fresh.depth, self.depth),
            planes=jax.tree_util.tree_map(pre, fresh.planes, self.planes),
            graph=replace(
                fresh.graph,
                poses=pre(fresh.graph.poses, self.graph.poses),
                vmask=pre(fresh.graph.vmask, self.graph.vmask),
                edges_ij=pre(fresh.graph.edges_ij, self.graph.edges_ij),
                rel=pre(fresh.graph.rel, self.graph.rel),
                info=pre(fresh.graph.info, self.graph.info),
                emask=pre(fresh.graph.emask, self.graph.emask),
            ),
            n_edges=self.n_edges,
            edge_is_lc=pre(fresh.edge_is_lc, self.edge_is_lc),
            sso=fresh.sso.at[: n_old, : n_old].set(self.sso),
            area=pre(fresh.area, self.area),
            n_areas=self.n_areas,
        )

    def add_keyframe(
        self,
        pose: jnp.ndarray,
        gray: jnp.ndarray,
        depth: jnp.ndarray,
        planes: PlaneSet,
        area_id: jnp.ndarray | int = None,
        n_live: int | None = None,
    ) -> "Map360":
        """Append a keyframe (reference `Map360::addKeyframe:90`).

        Auto-grows (doubles) the fixed capacity when exhausted — a silent
        JAX out-of-bounds scatter would otherwise drop the update.
        `n_live`: host-side keyframe count for the capacity check; passing
        it skips the blocking `int(self.n_kf)` device fetch (a full tunnel
        round trip on a remote-attached chip) — the tracker mirrors the
        count host-side anyway."""
        if (int(self.n_kf) if n_live is None else n_live) >= self.poses.shape[0]:
            self = self.grow(kf_capacity=2 * self.poses.shape[0])
        k = self.n_kf
        if area_id is None:
            area_id = jnp.int32(0)
        set_plane = lambda tot, one: jax.tree_util.tree_map(
            lambda a, b: a.at[k].set(b.astype(a.dtype)), tot, one
        )
        return replace(
            self,
            n_kf=k + 1,
            poses=self.poses.at[k].set(pose),
            opt_poses=self.opt_poses.at[k].set(pose),
            gray=self.gray.at[k].set(gray.astype(jnp.bfloat16)),
            depth=self.depth.at[k].set(depth.astype(jnp.bfloat16)),
            planes=set_plane(self.planes, planes),
            graph=replace(
                self.graph,
                poses=self.graph.poses.at[k].set(pose),
                vmask=self.graph.vmask.at[k].set(True),
            ),
            area=self.area.at[k].set(jnp.int32(area_id)),
        )

    def add_edge(
        self,
        i: jnp.ndarray | int,
        j: jnp.ndarray | int,
        rel: jnp.ndarray,
        info: jnp.ndarray,
        sso: jnp.ndarray | float = 0.0,
        is_loop: bool = False,
        n_live: int | None = None,
    ) -> "Map360":
        """Record a connection (reference `mmConnectionKFs`, `Map360.h:60`).

        rel maps x_i = rel @ x_j (pose of KF j expressed in KF i's frame).
        is_loop marks loop-closure edges for robust (DCS) treatment.
        `n_live`: host-side edge count — skips the blocking `int(self.n_edges)`
        fetch for the capacity check (see `add_keyframe`).
        """
        if (int(self.n_edges) if n_live is None else n_live) >= self.graph.edges_ij.shape[0]:
            # auto-grow (double) the edge capacity; one re-jit per bump
            self = self.grow(edge_capacity=2 * self.graph.edges_ij.shape[0])
        e = self.n_edges
        i = jnp.int32(i)
        j = jnp.int32(j)
        return replace(
            self,
            n_edges=e + 1,
            graph=replace(
                self.graph,
                edges_ij=self.graph.edges_ij.at[e].set(jnp.stack([i, j])),
                rel=self.graph.rel.at[e].set(rel),
                info=self.graph.info.at[e].set(info),
                emask=self.graph.emask.at[e].set(True),
            ),
            edge_is_lc=self.edge_is_lc.at[e].set(bool(is_loop)),
            sso=self.sso.at[i, j].set(sso).at[j, i].set(sso),
        )

    def add_edges(
        self,
        ij: jnp.ndarray,
        rels: jnp.ndarray,
        infos: jnp.ndarray,
        ssos: jnp.ndarray,
        is_loop: jnp.ndarray,
        n_live: int,
    ) -> "Map360":
        """Append a BATCH of E edges in ONE jitted update program.

        A keyframe event can add several edges at once (odometry + PbMap +
        connections + loop closures); per-edge eager `.at[].set` updates
        cost ~6 device dispatches EACH, so the event's edge bookkeeping
        alone was tens of dispatches.  One program per batch size E (small
        ints, compile-cached) scatters them all.  `n_live` is the host-side
        edge count (capacity check + scatter base).

        INVARIANT: when the batch contains duplicate (i, j) pairs (the
        dense + PbMap promotion edges share a pair), every duplicate MUST
        carry the same `ssos` value — the sso scatter uses `.at[i,j].set`,
        and JAX scatter-set order over duplicate indices is unspecified, so
        which duplicate lands is arbitrary.  All current callers pass the
        matched-area SSO of the pair, which is pair-unique by construction.
        """
        e_new = int(ij.shape[0])
        if e_new == 0:
            return self
        while n_live + e_new > self.graph.edges_ij.shape[0]:
            self = self.grow(edge_capacity=2 * self.graph.edges_ij.shape[0])
        g = self.graph
        new_g, n_edges, edge_is_lc, sso = _add_edges_impl(
            g.edges_ij, g.rel, g.info, g.emask, self.edge_is_lc, self.sso,
            self.n_edges,
            jnp.asarray(ij, jnp.int32),
            jnp.asarray(rels, g.rel.dtype),
            jnp.asarray(infos, g.info.dtype),
            jnp.asarray(ssos, self.sso.dtype),
            jnp.asarray(is_loop, bool),
        )
        return replace(
            self,
            n_edges=n_edges,
            graph=replace(
                g,
                edges_ij=new_g[0],
                rel=new_g[1],
                info=new_g[2],
                emask=new_g[3],
            ),
            edge_is_lc=edge_is_lc,
            sso=sso,
        )

    def with_optimized(self, poses: jnp.ndarray) -> "Map360":
        return replace(
            self, opt_poses=poses, graph=replace(self.graph, poses=poses)
        )

    # -------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Serialize the map to an .npz archive (the reference saves PCDs +
        gzipped PbMaps + graph text, `Frame360::save:321`,
        `GraphOptimizer::saveGraph:273`; one pytree archive covers all)."""
        import numpy as np

        flat, treedef = jax.tree_util.tree_flatten(self)

        def to_np(x):
            a = np.asarray(x)
            # npz has no bfloat16; widen to float32 (lossless)
            return a.astype(np.float32) if a.dtype.name == "bfloat16" else a

        np.savez_compressed(
            path, **{f"leaf_{i}": to_np(x) for i, x in enumerate(flat)}
        )

    @staticmethod
    def load(path: str, template: "Map360") -> "Map360":
        import numpy as np

        data = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten(template)
        leaves = [
            jnp.asarray(data[f"leaf_{i}"], dtype=flat[i].dtype)
            for i in range(len(flat))
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)
