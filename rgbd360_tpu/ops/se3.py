"""SE(3) Lie group operations in JAX.

The reference relies on MRPT for the exponential map used in the Gauss-Newton
pose update (`mrpt::poses::CPose3D::exp` at reference
`include/RegisterPhotoICP.h:4697`) and on hand-rolled helpers in
`include/Miscellaneous.h` (`skew:88`, `diffRotation:127`).  Here the group ops
are closed-form, fully differentiable, batched (leading axes broadcast), and
float64-safe under `jax.enable_x64` when needed.

Twist convention: xi = (v, w) with translation first, matching the reference's
update layout (jacobian columns [I | -skew(R p)] at
`include/RegisterPhotoICP.h:2830-2832`), so `exp(xi) @ T` composes an update.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8
_HI = lax.Precision.HIGHEST


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector; batched over leading axes."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, numerically stable near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    wx = skew(w)
    wx2 = wx @ wx
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    # Taylor fallbacks for tiny angles.
    a = jnp.where(theta2 > _EPS, a, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, b, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    return eye + a[..., None, None] * wx + b[..., None, None] * wx2


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3); returns rotation vector."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    # vee of (R - R^T)/2
    v = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    scale = jnp.where(
        jnp.abs(sin_t) > _EPS, theta / (2.0 * sin_t + _EPS), 0.5 + theta * theta / 12.0
    )
    w = scale[..., None] * v
    # Near theta = pi the vee form degenerates; recover axis from diagonal.
    near_pi = theta > 3.0
    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + _EPS), 0, None)
    axis = jnp.sqrt(axis_sq)
    signs = jnp.sign(
        jnp.stack(
            [
                r[..., 2, 1] - r[..., 1, 2],
                r[..., 0, 2] - r[..., 2, 0],
                r[..., 1, 0] - r[..., 0, 1],
            ],
            axis=-1,
        )
        + _EPS
    )
    w_pi = theta[..., None] * axis * signs
    return jnp.where(near_pi[..., None], w_pi, w)


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    wx = skew(w)
    wx2 = wx @ wx
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS * _EPS * _EPS)
    b = jnp.where(theta2 > _EPS, b, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, c, 1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    return eye + b[..., None, None] * wx + c[..., None, None] * wx2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: twist (v, w) -> 4x4 homogeneous transform."""
    v, w = xi[..., :3], xi[..., 3:]
    r = so3_exp(w)
    t = (_so3_left_jacobian(w) @ v[..., None])[..., 0]
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(t4: jnp.ndarray) -> jnp.ndarray:
    """Log map: 4x4 transform -> twist (v, w)."""
    r = t4[..., :3, :3]
    t = t4[..., :3, 3]
    w = so3_log(r)
    jinv = jnp.linalg.inv(_so3_left_jacobian(w))
    v = (jinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(t4: jnp.ndarray) -> jnp.ndarray:
    r = t4[..., :3, :3]
    t = t4[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -(rt @ t[..., None])[..., 0]
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=t4.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def adjoint(t4: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of SE(3) for (v, w)-ordered twists, batched over leading axes.

    Satisfies exp(adjoint(T) @ xi) == T @ exp(xi) @ inv(T).  Used to fold
    per-sensor normal equations into the shared robot frame in the joint
    multi-sensor alignment (the reference accumulates per-sensor Hessians and
    gradients the same way at `include/RegisterRGBD360.h:435-440`).
    """
    r = t4[..., :3, :3]
    t = t4[..., :3, 3]
    top = jnp.concatenate([r, skew(t) @ r], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(r), r], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(t4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., 3) points.

    Pinned to full-f32 matmul: the TPU default feeds bf16 into the MXU,
    which is cm-scale point error at room range — unacceptable for geometry.
    """
    return (
        jnp.matmul(pts, jnp.swapaxes(t4[..., :3, :3], -1, -2), precision=_HI)
        + t4[..., :3, 3]
    )


def rotation_angle(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians (reference `Miscellaneous.h:diffRotation`)."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def pose_distance(t_a: jnp.ndarray, t_b: jnp.ndarray):
    """(translation distance, rotation angle) between two poses."""
    dt = jnp.linalg.norm(t_a[..., :3, 3] - t_b[..., :3, 3], axis=-1)
    dr = rotation_angle(
        jnp.swapaxes(t_a[..., :3, :3], -1, -2) @ t_b[..., :3, :3]
    )
    return dt, dr


def yaw_grid(n: int = 16):
    """(n, 4, 4) float64 numpy grid of rotations about the rig's vertical
    axis (x on the sphere — rays are (sin phi, ...), reference
    `include/Frame360.h:589-593`), evenly covering [0, 2*pi).

    Shared by every heading-hypothesis rescue: tracking seed recovery,
    loop-closure verification, and relocalization (yaw is the dominant
    ambiguity on the spherical rig — geometry repeats under heading error
    while the vertical stays pinned by gravity-aligned structure)."""
    import numpy as _np

    a = (2 * _np.pi / n) * _np.arange(n)
    g = _np.tile(_np.eye(4), (n, 1, 1))
    c, s = _np.cos(a), _np.sin(a)
    g[:, 1, 1] = c
    g[:, 1, 2] = -s
    g[:, 2, 1] = s
    g[:, 2, 2] = c
    return g
