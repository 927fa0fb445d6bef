"""Measure dense-LM vs PCG pose-graph solvers across map capacities on the
attached chip, to place the auto-switch threshold (`config.graph.
pcg_threshold_kf`) at the measured crossover and check solution parity."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import se3
from rgbd360_tpu.slam.graph import (
    PoseGraph,
    optimize_pose_graph,
    optimize_pose_graph_pcg,
)


def ring_graph(n_v, seed=0):
    n_e = n_v * 3
    rng = np.random.default_rng(seed)
    gt = [np.eye(4)]
    step_t = np.asarray(se3.se3_exp(jnp.array([0.5, 0, 0, 0, 2 * np.pi / n_v, 0])))
    for _ in range(n_v - 1):
        gt.append(gt[-1] @ step_t)
    edges = np.full((n_e, 2), -1, np.int32)
    rels = np.tile(np.eye(4), (n_e, 1, 1))
    infos = np.tile(np.eye(6) * 100, (n_e, 1, 1))
    emask = np.zeros(n_e, bool)
    poses = [np.eye(4)]
    e = 0
    for i in range(n_v - 1):
        z = np.linalg.inv(gt[i]) @ gt[i + 1]
        zn = z @ np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6))))
        poses.append(poses[-1] @ zn)
        edges[e], rels[e], emask[e] = (i, i + 1), zn, True
        e += 1
    for _ in range(n_e - e):
        i = int(rng.integers(0, n_v - 8))
        j = i + int(rng.integers(4, 8))
        edges[e] = (i, j)
        rels[e] = np.linalg.inv(gt[i]) @ gt[j]
        emask[e] = True
        e += 1
    g = PoseGraph(
        poses=jnp.asarray(np.stack(poses)),
        vmask=jnp.ones(n_v, bool),
        edges_ij=jnp.asarray(edges),
        rel=jnp.asarray(rels),
        info=jnp.asarray(infos),
        emask=jnp.asarray(emask),
    )
    return g, np.stack(gt)


def ate(poses, gt):
    p = np.asarray(poses)[:, :3, 3]
    g = gt[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum((p - g) ** 2, axis=1))))


def main():
    for n_v in (64, 128, 256, 512, 1024):
        g, gt = ring_graph(n_v)
        row = [f"n={n_v:5d}"]
        for name, fn in (("dense", optimize_pose_graph), ("pcg", optimize_pose_graph_pcg)):
            out = fn(g, 10)
            jax.block_until_ready(out[0])
            ts = []
            n_it = 1
            for _ in range(7):
                t0 = time.time()
                out = fn(g, 10)
                jax.block_until_ready(out[0])
                n_it = max(int(out[2]), 1)
                ts.append((time.time() - t0) * 1e3 / n_it)
            med = float(np.median(ts))
            row.append(
                f"{name}: {med:7.2f} ms/it (chi2 {float(out[1]):9.4f}, "
                f"it {n_it}, ate {ate(out[0], gt)*1000:6.1f} mm)"
            )
        print("  ".join(row))


if __name__ == "__main__":
    main()
