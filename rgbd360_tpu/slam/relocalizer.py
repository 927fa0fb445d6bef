"""Relocalization: find the current frame in the map after tracking loss.

The reference brute-forces PbMap registration of the current frame against
all map keyframes newest-first, accepting at >=5 matched planes and matched
area > 10 (reference `include/Relocalizer360.h:78-93`).  Here the whole scan
is one vmapped batch over the stacked keyframe plane sets — the newest-first
early exit becomes an argmax over a recency-weighted score."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.config import FrameworkConfig
from rgbd360_tpu.ops.segmentation import PlaneSet
from rgbd360_tpu.registration.planes import (
    PLANAR_3DOF,
    match_planes,
    pose_from_matches,
)


@dataclass
class RelocalizationResult:
    success: bool
    kf: int
    pose: np.ndarray  # x_kf = pose @ x_query
    info: np.ndarray
    n_matches: int
    area_matched: float


class Relocalizer:
    def __init__(self, config: FrameworkConfig, mesh=None):
        """`mesh`: optional ('kf',) device mesh — the brute-force scan over
        all map keyframes shards by keyframe index
        (`parallel/sharded.sharded_plane_scan`)."""
        self.config = config
        self.mesh = mesh
        if mesh is None:
            self._batch = jax.jit(self._batch_impl)
        else:
            from rgbd360_tpu.parallel.sharded import sharded_plane_scan
            from rgbd360_tpu.registration.planes import PLANAR_3DOF as _MODE

            self._batch = lambda map_planes, query, gate: sharded_plane_scan(
                mesh, map_planes, query, gate, config.matcher, _MODE
            )

    def _batch_impl(self, map_planes: PlaneSet, query: PlaneSet, gate):
        cfg = self.config.matcher

        def one(kf_planes, g):
            pairs, n = match_planes(kf_planes, query, cfg, PLANAR_3DOF)
            pose, info, obs = pose_from_matches(kf_planes, query, pairs, n)
            vm = pairs[:, 0] >= 0
            area = jnp.sum(
                jnp.where(vm, kf_planes.area[jnp.clip(pairs[:, 0], 0, None)], 0.0)
            )
            return jnp.where(g, n, 0), area, pose, info, obs & g

        return jax.vmap(one)(map_planes, gate)

    @staticmethod
    @jax.jit
    def _select(n_m, area, obs, pose, info, min_matches, min_area):
        """Device-side winner selection (newest-first among acceptable hits);
        only the single winner's data crosses to host."""
        idx = jnp.arange(n_m.shape[0])
        ok = obs & (n_m >= min_matches) & (area > min_area)
        score = jnp.where(ok, n_m * 1000 + idx, -1)
        k = jnp.argmax(score)
        return jnp.any(ok), k, pose[k], info[k], n_m[k], area[k]

    def relocalize(self, map360, query_planes: PlaneSet) -> RelocalizationResult:
        n_kf = int(map360.n_kf)
        fail = RelocalizationResult(False, -1, np.eye(4), np.zeros((6, 6)), 0, 0.0)
        if n_kf == 0:
            return fail
        idx = np.arange(map360.poses.shape[0])
        gate = jnp.asarray(idx < n_kf)
        n_m, area, pose, info, obs = self._batch(map360.planes, query_planes, gate)
        rc = self.config.reloc
        any_ok, k, pose_k, info_k, n_k, area_k = jax.device_get(
            self._select(
                n_m, area, obs, pose, info,
                jnp.asarray(rc.min_matches), jnp.asarray(rc.min_area),
            )
        )
        if not bool(any_ok):
            return fail
        return RelocalizationResult(
            success=True,
            kf=int(k),
            pose=np.asarray(pose_k),
            info=np.asarray(info_k),
            n_matches=int(n_k),
            area_matched=float(area_k),
        )
