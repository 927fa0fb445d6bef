"""Shared test helpers: synthetic spherical sequence rendering."""

import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import camera, se3


def render_sphere_from(gray, depth, pose, fill_iters=2):
    """Render the scene observed from `pose` (x_world = pose @ x_new) by
    forward-splatting the source spherical frame; small holes are filled by
    neighborhood means.  Good enough to synthesize short test sequences from
    one real frame."""
    h, w = gray.shape
    pts = camera.sphere_backproject(depth).reshape(-1, 3)
    valid = depth.reshape(-1) > 0
    tp = se3.transform_points(se3.se3_inverse(jnp.asarray(pose)), pts)
    rc, rho = camera.sphere_project(tp, h, w)
    r = jnp.clip(jnp.round(rc[:, 0]).astype(int), 0, h - 1)
    c = jnp.round(rc[:, 1]).astype(int) % w
    new_gray = jnp.zeros((h, w)).at[r, c].set(jnp.where(valid, gray.reshape(-1), 0.0))
    new_depth = jnp.zeros((h, w)).at[r, c].set(jnp.where(valid, rho, 0.0))

    def fill(img):
        for _ in range(fill_iters):
            stacked = jnp.stack(
                [
                    jnp.roll(img, (dr, dc), (0, 1))
                    for dr in (-1, 0, 1)
                    for dc in (-1, 0, 1)
                ]
            )
            nz = jnp.where(stacked != 0, stacked, jnp.nan)
            med = jnp.nan_to_num(jnp.nanmean(nz, axis=0))
            img = jnp.where(img != 0, img, med)
        return img

    return fill(new_gray), fill(new_depth)


def synth_trajectory(n, step=0.08, yaw_step=0.02, seed=0):
    """World poses along a gently curving path."""
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for i in range(1, n):
        xi = np.array(
            [
                0.0,
                step + rng.normal(0, 0.005),
                step * 0.5 + rng.normal(0, 0.005),
                rng.normal(0, 0.002),
                yaw_step + rng.normal(0, 0.002),
                rng.normal(0, 0.002),
            ]
        )
        poses.append(poses[-1] @ np.asarray(se3.se3_exp(jnp.asarray(xi))))
    return np.stack(poses)


def ate_rmse(est, gt):
    """Absolute trajectory error (RMSE over positions) after aligning the
    first pose (sequences share the same start)."""
    est = np.asarray(est)
    gt = np.asarray(gt)
    t_align = gt[0] @ np.linalg.inv(est[0])
    est_aligned = np.einsum("ij,njk->nik", t_align, est)
    d = est_aligned[:, :3, 3] - gt[:, :3, 3]
    return float(np.sqrt((d**2).sum(axis=1).mean()))
