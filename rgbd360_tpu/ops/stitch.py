"""Spherical stitching of the 8 sensor images.

The reference's `Frame360::stitchImage` (reference `include/Frame360.h:1099-1146`)
walks every sphere pixel in a sensor's column span, casts its ray into the
sensor through the inverse extrinsic, pinhole-projects, and copies the nearest
RGB/depth sample — scaling depth by the radial factor so the sphere stores ray
length, not z-depth.

TPU-first design: the pixel->sample mapping depends only on the calibration,
so it is computed once as dense gather maps (sensor id, source pixel, radial
scale, validity) and every subsequent stitch is a single fused gather over the
stacked (S, H, W) sensor tensors — no per-pixel control flow.

The sphere image is W = 8 * sensor_rows columns wide and
H = W * 0.5 * 60/180 rows high (reference `include/Frame360.h:391-394`).
Unlike the reference — which hard-assigns sensor s to the fixed column block
[(7-s)*rows, (8-s)*rows) in a sphere frame rotated 1799.5 px in theta (the
"157.5 deg rotOffset" wart, see `SLAM/KFsphere_SLAM.cpp:290`) — this build
uses ONE canonical sphere frame (theta = col * 2*pi/W) and assigns each pixel
to the sensor that actually sees its ray best (max cosine to the optical
axis among in-bounds projections), so stitching stays correct for any
calibration and no frame-conversion rotation leaks into the SLAM layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from rgbd360_tpu.ops import camera


@jax.tree_util.register_dataclass
@dataclass
class StitchMaps:
    """Precomputed gather maps from sphere pixels to sensor samples.

    sensor: (H, W) int32 — owning sensor per sphere column.
    u, v:   (H, W) int32 — nearest source pixel (truncated, like cv::Mat::at).
    scale:  (H, W) float32 — z-depth -> ray-length factor at the *continuous*
            source coordinates (reference `include/Frame360.h:1142`).
    valid:  (H, W) bool — projection landed inside the source image.
    """

    sensor: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    scale: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def compute_stitch_maps(
    rt_inv: jnp.ndarray,
    k: jnp.ndarray,
    sphere_h: int,
    sphere_w: int,
    sensor_h: int,
    sensor_w: int,
) -> StitchMaps:
    """Build the gather maps for a given calibration.

    rt_inv: (S, 4, 4) rig->sensor transforms; k: (3, 3) pinhole intrinsics.
    """
    rays = camera.sphere_rays(sphere_h, sphere_w)  # (H, W, 3)

    # Project the unit virtual point of every ray into every sensor (the
    # reference also treats the ray as a point at distance 1 and includes the
    # extrinsic translation, `include/Frame360.h:1128`).
    r_inv = rt_inv[:, :3, :3]  # (S, 3, 3)
    t_inv = rt_inv[:, :3, 3]  # (S, 3)
    p = jnp.einsum("sij,hwj->shwi", r_inv, rays) + t_inv[:, None, None, :]

    z = p[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u_f = k[0, 0] * p[..., 0] / zs + k[0, 2]
    v_f = k[1, 1] * p[..., 1] / zs + k[1, 2]

    in_bounds = (
        (z > 1e-6) & (u_f >= 0) & (u_f < sensor_w) & (v_f >= 0) & (v_f < sensor_h)
    )
    # Pick the sensor that sees the ray most head-on.
    score = jnp.where(in_bounds, z / jnp.linalg.norm(p, axis=-1), -jnp.inf)
    sensor = jnp.argmax(score, axis=0).astype(jnp.int32)  # (H, W)

    def pick(a):
        return jnp.take_along_axis(a, sensor[None], axis=0)[0]

    u_sel, v_sel, valid = pick(u_f), pick(v_f), pick(in_bounds)
    u_i = jnp.clip(u_sel.astype(jnp.int32), 0, sensor_w - 1)
    v_i = jnp.clip(v_sel.astype(jnp.int32), 0, sensor_h - 1)

    xn = (u_sel - k[0, 2]) / k[0, 0]
    yn = (v_sel - k[1, 2]) / k[1, 1]
    scale = jnp.sqrt(1.0 + xn * xn + yn * yn)

    return StitchMaps(
        sensor=sensor, u=u_i, v=v_i, scale=scale.astype(jnp.float32), valid=valid
    )


def refine_stitch_maps(
    maps: StitchMaps,
    sphere_depth: jnp.ndarray,
    rt_inv: jnp.ndarray,
    k: jnp.ndarray,
    sensor_h: int,
    sensor_w: int,
) -> StitchMaps:
    """Parallax-corrected gather maps from a first-pass sphere depth.

    The calibration-only maps (like the reference's `Frame360::stitchImage`,
    `include/Frame360.h:1128`) project each sphere ray as a point at
    distance 1 m, so off-center sensors sample the wrong surface point for
    scenes at other depths — a fixed, rig-locked parallax warp of up to a
    few degrees that biases dense registration between different poses.
    This second pass re-projects each ray at its MEASURED radial depth into
    its owning sensor, which collapses that bias (beyond-reference
    accuracy; the reference has no such correction).  Pixels with no depth
    keep the first-pass mapping.
    """
    u_f, v_f, ok, _ = _project_at_depth(
        maps, sphere_depth, rt_inv, k, sensor_h, sensor_w
    )
    u_i = jnp.clip(u_f.astype(jnp.int32), 0, sensor_w - 1)
    v_i = jnp.clip(v_f.astype(jnp.int32), 0, sensor_h - 1)
    xn = (u_f - k[0, 2]) / k[0, 0]
    yn = (v_f - k[1, 2]) / k[1, 1]
    scale = jnp.sqrt(1.0 + xn * xn + yn * yn).astype(jnp.float32)
    return StitchMaps(
        sensor=maps.sensor,
        u=jnp.where(ok, u_i, maps.u),
        v=jnp.where(ok, v_i, maps.v),
        scale=jnp.where(ok, scale, maps.scale),
        valid=maps.valid,
    )


def _project_at_depth(maps, sphere_depth, rt_inv, k, sensor_h, sensor_w):
    """Continuous sensor coordinates of each sphere ray placed at its
    measured radial depth: (u_f, v_f, ok, sphere rays)."""
    rays = camera.sphere_rays(*sphere_depth.shape)  # (H, W, 3)
    p_rig = rays * jnp.maximum(sphere_depth, 1e-3)[..., None]
    # per-pixel owning-sensor transform (S = 8: compute all, select by map)
    r_inv = rt_inv[:, :3, :3]
    t_inv = rt_inv[:, :3, 3]
    p_all = jnp.einsum("sij,hwj->shwi", r_inv, p_rig) + t_inv[:, None, None, :]
    # gather-free sensor selection: one-hot contraction over the 8 sensors
    onehot = (
        maps.sensor[None] == jnp.arange(rt_inv.shape[0])[:, None, None]
    ).astype(p_all.dtype)
    p = jnp.einsum("shw,shwi->hwi", onehot, p_all)  # (H, W, 3)
    z = p[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u_f = k[0, 0] * p[..., 0] / zs + k[0, 2]
    v_f = k[1, 1] * p[..., 1] / zs + k[1, 2]
    ok = (
        (sphere_depth > 0)
        & (z > 1e-6)
        & (u_f >= 0)
        & (u_f < sensor_w)
        & (v_f >= 0)
        & (v_f < sensor_h)
    )
    return u_f, v_f, ok, rays


def stitch_refined(
    maps: StitchMaps,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    rt: jnp.ndarray,
    rt_inv: jnp.ndarray,
    k: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass parallax-corrected stitch (beyond-reference accuracy).

    Pass 1 stitches with the calibration-only maps; pass 2 re-projects each
    sphere ray at its measured radial depth into its owning sensor and
    gathers again, storing the EXACT rig-centered radial distance
    |R q_s + t| of the sampled sensor point (the calibration-only form — and
    the reference at `include/Frame360.h:1142` — stores sensor-centered ray
    length, biased by the sensor's ~6-8 cm offset from the rig center).
    Costs one extra (H*W)-row gather over `stitch`.
    """
    sensor_h, sensor_w = rgb.shape[1], rgb.shape[2]
    _, d0 = stitch(maps, rgb, depth)
    u_f, v_f, ok, _rays = _project_at_depth(maps, d0, rt_inv, k, sensor_h, sensor_w)
    s = maps.sensor.astype(jnp.int32)
    u_i = jnp.where(ok, jnp.clip(u_f.astype(jnp.int32), 0, sensor_w - 1), maps.u)
    v_i = jnp.where(ok, jnp.clip(v_f.astype(jnp.int32), 0, sensor_h - 1), maps.v)
    pack = jnp.concatenate(
        [rgb.astype(jnp.float32), depth[..., None].astype(jnp.float32)], axis=-1
    )
    lin = (s * sensor_h + v_i) * sensor_w + u_i
    vals = jnp.take(pack.reshape(-1, 4), lin, axis=0)  # (H', W', 4)
    rgb_out = jnp.where(maps.valid[..., None], vals[..., :3], 0.0)
    d = vals[..., 3]
    # exact rig-centered radial depth of the sampled point q = d*[xn, yn, 1]
    xn = (jnp.where(ok, u_f, maps.u.astype(jnp.float32)) - k[0, 2]) / k[0, 0]
    yn = (jnp.where(ok, v_f, maps.v.astype(jnp.float32)) - k[1, 2]) / k[1, 1]
    n_s = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)  # (H, W, 3)
    # gather-free per-pixel extrinsic: one-hot contraction over the sensors
    onehot = (s[None] == jnp.arange(rt.shape[0])[:, None, None]).astype(jnp.float32)
    n_rig_all = jnp.einsum("sij,hwj->shwi", rt[:, :3, :3], n_s)
    n_rig = jnp.einsum("shw,shwi->hwi", onehot, n_rig_all)
    t_sel = jnp.einsum("shw,si->hwi", onehot, rt[:, :3, 3])
    radial = jnp.sqrt(
        d * d * jnp.sum(n_s * n_s, axis=-1)
        + 2.0 * d * jnp.sum(n_rig * t_sel, axis=-1)
        + jnp.sum(t_sel * t_sel, axis=-1)
    )
    depth_out = jnp.where(maps.valid & (d > 0), radial, 0.0)
    return rgb_out, depth_out


def seam_mask_from_maps(maps: StitchMaps, half_width: int = 1) -> jnp.ndarray:
    """(H, W) bool mask, True where gradients are trustworthy — i.e. away
    from sensor hand-off seams, where per-camera auto-shutter creates fake
    gradients (the reason the reference zeroes 2 columns per seam at
    `include/RegisterPhotoICP.h:4537-4549`)."""
    s = maps.sensor
    seam = jnp.zeros(s.shape, dtype=bool)
    for d in range(1, half_width + 1):
        seam |= s != jnp.roll(s, d, axis=1)
        seam |= s != jnp.roll(s, -d, axis=1)
    return ~seam


def stitch(
    maps: StitchMaps, rgb: jnp.ndarray, depth: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the spherical RGB and radial-depth images.

    rgb:   (S, H, W, 3) any dtype; depth: (S, H, W) float32 meters.
    Returns (sphere_rgb (H', W', 3) same dtype as float32, sphere_depth (H', W')).

    RGB and depth are packed into one (S, H, W, 4) tensor first so the warp
    is a single contiguous 4-vector gather per sphere pixel (a gather per
    channel is several times slower on TPU).
    """
    s, v, u = maps.sensor, maps.v, maps.u
    pack = jnp.concatenate(
        [rgb.astype(jnp.float32), depth[..., None].astype(jnp.float32)], axis=-1
    )
    sh, sw = rgb.shape[1], rgb.shape[2]
    lin = (s.astype(jnp.int32) * sh + v.astype(jnp.int32)) * sw + u.astype(
        jnp.int32
    )
    # flat (N, 4) row take: ~1.5x faster than the 3-index gather on TPU
    vals = jnp.take(pack.reshape(-1, 4), lin, axis=0)  # (H', W', 4)
    rgb_out = jnp.where(maps.valid[..., None], vals[..., :3], 0.0)
    d = vals[..., 3]
    depth_out = jnp.where(maps.valid & (d > 0), d * maps.scale, 0.0)
    return rgb_out, depth_out


def stitch_batch(
    maps: StitchMaps, rgb: jnp.ndarray, depth: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stitch a BATCH of rig captures with ONE row gather.

    rgb: (B, S, H, W, 3); depth: (B, S, H, W) float32 meters.
    Returns (sphere_rgb (B, H', W', 3) float32, sphere_depth (B, H', W')).

    The gather indices depend only on the calibration, so the B frames pack
    as extra row channels (rows of 4*B floats).  TPU gathers are per-ROW
    latency-bound — (N, 4) and (N, 8) takes cost the same — so the per-frame
    stitch cost is ~1/B of the single-frame form.  This is the throughput
    path for sequence registration / batch loop-closure verification.
    """
    b = rgb.shape[0]
    s, v, u = maps.sensor, maps.v, maps.u
    pack = jnp.concatenate(
        [
            jnp.concatenate(
                [rgb[f].astype(jnp.float32), depth[f][..., None].astype(jnp.float32)],
                axis=-1,
            )
            for f in range(b)
        ],
        axis=-1,
    )  # (S, H, W, 4*B)
    sh, sw = rgb.shape[2], rgb.shape[3]
    lin = (s.astype(jnp.int32) * sh + v.astype(jnp.int32)) * sw + u.astype(jnp.int32)
    vals = jnp.take(pack.reshape(-1, 4 * b), lin, axis=0)  # (H', W', 4*B)
    rgbs, depths = [], []
    for f in range(b):
        vf = vals[..., 4 * f : 4 * f + 4]
        rgbs.append(jnp.where(maps.valid[..., None], vf[..., :3], 0.0))
        d = vf[..., 3]
        depths.append(jnp.where(maps.valid & (d > 0), d * maps.scale, 0.0))
    return jnp.stack(rgbs), jnp.stack(depths)


def stitch_gray_depth_batch(
    maps: StitchMaps, gray: jnp.ndarray, depth: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stitch a batch of per-sensor GRAY + depth images with ONE row gather.

    gray: (B, S, H, W) float32 in [0, 1]; depth: (B, S, H, W) float32 meters.
    Returns (sphere_gray (B, H', W'), sphere_depth (B, H', W')).

    The registration/odometry pipelines never consume sphere RGB — only the
    intensity and depth feed the pyramids — so converting to gray BEFORE the
    stitch halves the gathered row width vs `stitch_batch` and skips the
    (S, H, W, 3) float32 RGB tensor entirely (~0.15 ms/frame at batch 4).
    """
    b = gray.shape[0]
    s, v, u = maps.sensor, maps.v, maps.u
    pack = jnp.concatenate(
        [
            jnp.concatenate([gray[f][..., None], depth[f][..., None]], axis=-1)
            for f in range(b)
        ],
        axis=-1,
    )  # (S, H, W, 2*B)
    sh, sw = gray.shape[2], gray.shape[3]
    lin = (s.astype(jnp.int32) * sh + v.astype(jnp.int32)) * sw + u.astype(jnp.int32)
    vals = jnp.take(pack.reshape(-1, 2 * b), lin, axis=0)  # (H', W', 2*B)
    grays, depths = [], []
    for f in range(b):
        grays.append(jnp.where(maps.valid, vals[..., 2 * f], 0.0))
        d = vals[..., 2 * f + 1]
        depths.append(jnp.where(maps.valid & (d > 0), d * maps.scale, 0.0))
    return jnp.stack(grays), jnp.stack(depths)


stitch_jit = jax.jit(stitch)


def fast_stitch(rgb: jnp.ndarray) -> jnp.ndarray:
    """Concatenation-only stitch (reference `Frame360::fastStitchImage360`,
    `include/Frame360.h:348-383`): rotate each sensor image 90 deg CCW
    (transpose + vertical flip) and place sensor (7-s) at column block s."""
    num_sensors = rgb.shape[0]
    blocks = []
    for s in range(num_sensors):
        img = rgb[num_sensors - 1 - s]
        rot = jnp.flip(jnp.swapaxes(img, 0, 1), axis=0)
        blocks.append(rot)
    return jnp.concatenate(blocks, axis=1)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """BGR (capture order) -> normalized gray in [0, 1], float32.

    Uses OpenCV's BGR2GRAY weights so intensities match the reference's
    `FrameRGBD::getIntensityImage` conversion.
    """
    b = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    r = rgb[..., 2].astype(jnp.float32)
    return (0.114 * b + 0.587 * g + 0.299 * r) * (1.0 / 255.0)
