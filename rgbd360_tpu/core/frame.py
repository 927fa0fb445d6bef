"""The central spherical frame data structure and its build pipeline.

TPU-native equivalent of the reference `Frame360` (reference
`include/Frame360.h`): a raw rig capture (8 RGB-D images) becomes

  * undistorted per-sensor depth          (Frame360::undistort,        :293)
  * stitched spherical RGB / gray / depth (Frame360::stitchSphericalImage, :386)
  * per-sensor organized point clouds in the rig frame and the concatenated
    spherical cloud                        (Frame360::buildSphereCloud, :467)

Everything is a pytree of fixed-shape arrays; `FrameBuilder.build` is one
jitted function whose per-sensor fan-out (OpenMP `num_threads(8)` in the
reference) is expressed as a leading sensor axis that XLA vectorizes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import FrameworkConfig, default_config
from rgbd360_tpu.io.calib import Calibration
from rgbd360_tpu.ops import camera, stitch as stitch_ops, undistort as undistort_ops
from rgbd360_tpu.ops import segmentation as seg_ops


@jax.tree_util.register_dataclass
@dataclass
class RigFrame:
    """Raw rig capture on device.

    rgb:   (S, H, W, 3) uint8 BGR as captured (cast to float on device —
           transferring u8 is 4x cheaper than f32 over the host link).
    depth: (S, H, W) uint16 millimeters, 0 = invalid.
    """

    rgb: jnp.ndarray
    depth: jnp.ndarray

    @staticmethod
    def from_raw(raw) -> "RigFrame":
        return RigFrame(
            rgb=jnp.asarray(raw.rgb),
            depth=jnp.asarray(raw.depth_mm),
        )


@jax.tree_util.register_dataclass
@dataclass
class SphereFrame:
    """Built spherical frame.

    sphere_rgb:   (Hs, Ws, 3) float32 BGR 0..255.
    sphere_gray:  (Hs, Ws) float32 in [0, 1].
    sphere_depth: (Hs, Ws) float32 radial meters, 0 = invalid.
    cloud_xyz:    (S, Hc, Wc, 3) float32 — per-sensor organized clouds in the
                  rig frame (2x downsampled when cfg dictates).
    cloud_rgb:    (S, Hc, Wc, 3) float32.
    cloud_valid:  (S, Hc, Wc) bool.
    local_xyz:    (S, Hc, Wc, 3) float32 — same clouds in each sensor frame
                  (used by plane segmentation before transforming to rig).
    """

    sphere_rgb: jnp.ndarray
    sphere_gray: jnp.ndarray
    sphere_depth: jnp.ndarray
    cloud_xyz: jnp.ndarray
    cloud_rgb: jnp.ndarray
    cloud_valid: jnp.ndarray
    local_xyz: jnp.ndarray


def downsample2_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """2x nearest downsample of depth, keeping valid-aware averaging.

    The reference's `DownsampleRGBD::downsamplePointCloud` picks every other
    pixel; valid-mean preserves more data on TPU at no cost.  The 2x2 block
    sums run as 0/1 matmul sandwiches on the MXU (exact, <= 4 addends) —
    the minor-axis split reshape + reduce costs ~0.7 ms/frame in relayouts.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    valid = depth > 0
    if h % 2 == 0 and w % 2 == 0:
        from rgbd360_tpu.ops.pyramid import _HI, _box_sum_mats

        a, b = _box_sum_mats(h, w)
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        masked = jnp.where(valid, depth, 0.0)
        s = jnp.matmul(jnp.matmul(a, masked, precision=_HI), b, precision=_HI)
        n = jnp.matmul(
            jnp.matmul(a, valid.astype(depth.dtype), precision=_HI), b, precision=_HI
        )
        return jnp.where(n > 0.5, s / jnp.maximum(n, 1.0), 0.0)
    h2, w2 = h // 2, w // 2
    d = depth[..., : h2 * 2, : w2 * 2].reshape(*depth.shape[:-2], h2, 2, w2, 2)
    v = d > 0
    s = jnp.sum(jnp.where(v, d, 0.0), axis=(-3, -1))
    n = jnp.sum(v, axis=(-3, -1))
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def downsample2_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    h2, w2 = rgb.shape[-3] // 2, rgb.shape[-2] // 2
    r = rgb[..., : h2 * 2, : w2 * 2, :]
    r = r.reshape(*rgb.shape[:-3], h2, 2, w2, 2, 3)
    return jnp.mean(r, axis=(-4, -2))


class FrameBuilder:
    """Builds SphereFrames from raw rig captures for a fixed calibration.

    Precomputes the stitch gather maps once (they depend only on calibration),
    then `build` is a single jitted program.
    """

    def __init__(
        self,
        calib: Calibration,
        config: FrameworkConfig | None = None,
        downsample_cloud: bool = True,
    ):
        self.config = config or default_config()
        self.downsample_cloud = downsample_cloud
        rig = self.config.rig
        sph = self.config.sphere
        self.rt = jnp.asarray(calib.rt)
        self.k = jnp.asarray(calib.k)
        self.maps = stitch_ops.compute_stitch_maps(
            jnp.asarray(calib.rt_inv), self.k, sph.height, sph.width, rig.height, rig.width
        )
        if calib.clams_multipliers is not None:
            self.clams = (
                jnp.asarray(calib.clams_multipliers),
                jnp.asarray(calib.clams_counts),
                calib.clams_bin_width,
                calib.clams_bin_height,
                calib.clams_bin_depth,
            )
            # per-pixel tables: one-time expansion -> gather-free undistort
            self._clams_pixeltabs = undistort_ops.precompute_pixel_tables(
                self.clams[0], self.clams[1], calib.clams_bin_width,
                calib.clams_bin_height, rig.height, rig.width,
            )
        else:
            self.clams = None
            self._clams_pixeltabs = None
        # Calibration tensors are passed as jit *arguments* (not closure
        # constants) so XLA does not constant-fold the big gather maps.
        self._params = dict(
            sensor=self.maps.sensor,
            u=self.maps.u,
            v=self.maps.v,
            scale=self.maps.scale,
            valid=self.maps.valid,
            rt=self.rt,
            rt_inv=jnp.asarray(calib.rt_inv),
            k=self.k,
        )
        if self.clams is not None:
            self._params["clams_m_img"] = self._clams_pixeltabs[0]
            self._params["clams_c_img"] = self._clams_pixeltabs[1]
        self._build = jax.jit(self._build_impl)

    # -------------------------------------------------------------- stages

    def undistort(self, frame: RigFrame) -> RigFrame:
        """Apply CLAMS depth undistortion (reference `Frame360::undistort:293`).

        Accepts raw u16 millimeter or float32 meter depth; returns meters."""
        depth = frame.depth
        if depth.dtype != jnp.float32:
            depth = depth.astype(jnp.float32) * 0.001
        if self.clams is None:
            return RigFrame(rgb=frame.rgb, depth=depth)
        mult, counts, bw, bh, bd = self.clams
        depth = undistort_ops.undistort_depth(depth, mult, counts, bw, bh, bd)
        return RigFrame(rgb=frame.rgb, depth=depth)

    def _undistort_stage(self, params, rgb, depth_raw):
        """dtype normalization + CLAMS depth undistortion (stages 0-1)."""
        if rgb.dtype != jnp.float32:
            rgb = rgb.astype(jnp.float32)
        if depth_raw.dtype != jnp.float32:
            depth_raw = depth_raw.astype(jnp.float32) * 0.001
        if self.clams is not None:
            bd = self.clams[4]
            depth = undistort_ops.undistort_depth_pixeltab(
                depth_raw, params["clams_m_img"], params["clams_c_img"], bd
            )
        else:
            depth = depth_raw
        return rgb, depth

    def _maps_from(self, params):
        return stitch_ops.StitchMaps(
            sensor=params["sensor"],
            u=params["u"],
            v=params["v"],
            scale=params["scale"],
            valid=params["valid"],
        )

    def _build_impl(self, params, rgb: jnp.ndarray, depth_raw: jnp.ndarray) -> SphereFrame:
        # 0-1. dtype normalization + undistort (gather-free pixel tables)
        rgb, depth = self._undistort_stage(params, rgb, depth_raw)

        # 2. stitch spherical images
        if self.config.sphere.parallax_refine:
            sphere_rgb, sphere_depth = stitch_ops.stitch_refined(
                self._maps_from(params), rgb, depth,
                params["rt"], params["rt_inv"], params["k"],
            )
        else:
            sphere_rgb, sphere_depth = stitch_ops.stitch(
                self._maps_from(params), rgb, depth
            )
        sphere_gray = stitch_ops.rgb_to_gray(sphere_rgb)
        return self._cloud_stage(params, rgb, depth, sphere_rgb, sphere_gray, sphere_depth)

    def _cloud_stage(self, params, rgb, depth, sphere_rgb, sphere_gray, sphere_depth) -> SphereFrame:
        # 3. per-sensor clouds (2x downsampled like DOWNSAMPLE_160) in the
        #    sensor frame, then rig frame.
        if self.downsample_cloud:
            d_small = downsample2_depth(depth)
            rgb_small = downsample2_rgb(rgb)
            k_small = params["k"].at[:2, :].multiply(0.5)
            # principal point shifts under 2x decimation: (c - 0.25) ~ c/2
        else:
            d_small, rgb_small, k_small = depth, rgb, params["k"]

        rig = self.config.rig
        if rig.bilateral:
            # reference USE_BILATERAL_FILTER (default on): edge-preserving
            # smoothing of the per-sensor depth feeding clouds/segmentation
            # (`include/Frame360.h:40,492-499`, sigmaS=10 px, sigmaR=0.05 m)
            from rgbd360_tpu.ops.bilateral import bilateral_depth

            d_small = bilateral_depth(
                d_small,
                sigma_s=rig.bilateral_sigma_s,
                sigma_r=rig.bilateral_sigma_r,
                max_depth=rig.max_depth,
            )
        valid = (d_small > rig.min_depth) & (d_small < rig.max_depth)
        d_gated = jnp.where(valid, d_small, 0.0)
        local_xyz = camera.pinhole_backproject(d_gated, k_small)  # (S, h, w, 3)
        r = params["rt"][:, :3, :3]
        t = params["rt"][:, :3, 3]
        cloud_xyz = jnp.einsum("sij,shwj->shwi", r, local_xyz) + t[:, None, None, :]
        cloud_xyz = jnp.where(valid[..., None], cloud_xyz, jnp.nan)

        return SphereFrame(
            sphere_rgb=sphere_rgb,
            sphere_gray=sphere_gray,
            sphere_depth=sphere_depth,
            cloud_xyz=cloud_xyz,
            cloud_rgb=rgb_small,
            cloud_valid=valid,
            local_xyz=local_xyz,
        )

    def _build_batch_impl(self, params, rgbs, depths_raw) -> SphereFrame:
        """Batched build: the stitch gather indices depend only on the
        calibration, so B frames stitch with ONE row gather (the gather is
        per-row latency-bound — the dominant frame-build cost, ~2.7 ms —
        so per-frame stitch cost is ~1/B).  Everything else vmaps."""
        rgbs, depths = jax.vmap(lambda r, d: self._undistort_stage(params, r, d))(
            rgbs, depths_raw
        )
        sphere_rgb, sphere_depth = stitch_ops.stitch_batch(
            self._maps_from(params), rgbs, depths
        )
        sphere_gray = stitch_ops.rgb_to_gray(sphere_rgb)
        return jax.vmap(
            lambda r, d, srgb, sg, sd: self._cloud_stage(params, r, d, srgb, sg, sd)
        )(rgbs, depths, sphere_rgb, sphere_gray, sphere_depth)

    def build(self, frame: RigFrame) -> SphereFrame:
        return self._build(self._params, frame.rgb, frame.depth)

    def build_batch(self, rgbs: jnp.ndarray, depths_raw: jnp.ndarray) -> SphereFrame:
        """Build B frames at once (stacked SphereFrame with leading batch
        axis); rgbs (B, S, H, W, 3) u8, depths_raw (B, S, H, W) u16 mm."""
        if not hasattr(self, "_build_batch"):
            self._build_batch = jax.jit(self._build_batch_impl)
        return self._build_batch(self._params, rgbs, depths_raw)

    def build_from_raw(self, raw) -> SphereFrame:
        return self.build(RigFrame.from_raw(raw))

    def _build_gray_depth_batch_impl(self, params, rgbs, depths_raw):
        """Batched gray+depth-only frame build for the tracking hot path.

        The registration pipelines consume only sphere intensity and depth;
        converting to gray per sensor BEFORE the stitch halves the gathered
        row width and skips the float32 RGB tensor (see
        `stitch.stitch_gray_depth_batch`)."""
        b = rgbs.shape[0]
        grays, depths = [], []
        for f in range(b):
            _, d = self._undistort_stage(params, rgbs[f], depths_raw[f])
            grays.append(stitch_ops.rgb_to_gray(rgbs[f]))
            depths.append(d)
        return stitch_ops.stitch_gray_depth_batch(
            self._maps_from(params), jnp.stack(grays), jnp.stack(depths)
        )

    def build_gray_depth_batch(
        self, rgbs: jnp.ndarray, depths_raw: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(sphere_gray (B, H', W'), sphere_depth (B, H', W')) for B raw
        captures; rgbs (B, S, H, W, 3) u8, depths_raw (B, S, H, W) u16 mm."""
        if not hasattr(self, "_build_gd_batch"):
            self._build_gd_batch = jax.jit(self._build_gray_depth_batch_impl)
        return self._build_gd_batch(self._params, rgbs, depths_raw)

    def build_with_pyramid(self, frame: RigFrame):
        """Fused frame build + alignment pyramid in ONE jitted program —
        one device dispatch per frame instead of two (dispatch latency on a
        remote-attached TPU is several ms and would otherwise dominate)."""
        if not hasattr(self, "_build_pyr"):
            from rgbd360_tpu.ops import stitch as _st
            from rgbd360_tpu.registration import dense as _D

            seam = _st.seam_mask_from_maps(self.maps, 1)
            dense_cfg = self.config.dense
            # per-level masks are calibration constants: close over them so
            # they fold into the program instead of being sliced per frame
            seam_levels = _D.seam_masks_per_level(seam, dense_cfg.pyramid_levels)

            def impl(params, rgb, depth_raw):
                sphere = self._build_impl(params, rgb, depth_raw)
                pyr = _D.build_frame_pyramid(
                    sphere.sphere_gray, sphere.sphere_depth, dense_cfg, seam_levels
                )
                return sphere, pyr

            self._seam_valid = seam
            self._build_pyr = jax.jit(impl)
        return self._build_pyr(self._params, frame.rgb, frame.depth)

    def frontend_impl(self):
        """(params, rgb, depth_raw) -> (sphere, pyramid, planes), UNJITTED —
        the single shared composition of the per-frame frontend (build +
        alignment pyramid + plane segmentation, the reference's
        load/undistort/stitch/cloud/getPlanes sequence,
        `Frame360.h:231-615`).  `build_full` jits it directly; the
        tracker's fused tracking dispatch embeds it ahead of the PbMap
        register + dense solve (one composition, two consumers — they
        cannot drift)."""
        if not hasattr(self, "_frontend_fn"):
            from rgbd360_tpu.ops import stitch as _st
            from rgbd360_tpu.registration import dense as _D

            seam = _st.seam_mask_from_maps(self.maps, 1)
            dense_cfg = self.config.dense
            seam_levels = _D.seam_masks_per_level(seam, dense_cfg.pyramid_levels)

            def impl(params, rgb, depth_raw):
                sphere = self._build_impl(params, rgb, depth_raw)
                pyr = _D.build_frame_pyramid(
                    sphere.sphere_gray, sphere.sphere_depth, dense_cfg,
                    seam_levels,
                )
                planes = self._segment_impl(
                    params["rt"], sphere.local_xyz, sphere.cloud_rgb,
                    sphere.cloud_valid,
                )
                return sphere, pyr, planes

            self._frontend_fn = impl
        return self._frontend_fn

    def build_full(self, frame: RigFrame):
        """Fused frame build + alignment pyramid + plane segmentation in ONE
        jitted program — one device dispatch covers the whole per-frame
        SLAM-frontend state.  On a remote-attached chip each dispatch costs
        a tunnel round trip, so the 3-dispatch make_state (build, pyramid,
        segment) paid ~3x the fixed latency."""
        if not hasattr(self, "_build_full"):
            self._build_full = jax.jit(self.frontend_impl())
        return self._build_full(self._params, frame.rgb, frame.depth)

    # ------------------------------------------------------------- planes

    def _segment_impl(self, rt, local_xyz, cloud_rgb, cloud_valid):
        """Per-sensor plane segmentation + cross-sensor grouping (the
        reference `Frame360::getPlanes:615` -> `getPlanesSensor:942` ->
        `groupPlanes:742`/`mergePlanes:657` pipeline).

        Sensors segment independently (vmap = the OpenMP fan-out), each
        PlaneSet is transformed into the rig frame, then all are merged.
        """
        seg_cfg = self.config.seg
        per_sensor = jax.vmap(
            lambda x, c, v: seg_ops.segment_planes_sensor(x, c, v, seg_cfg)
        )(local_xyz, cloud_rgb, cloud_valid)
        num_sensors = local_xyz.shape[0]
        sets = []
        for s in range(num_sensors):
            one = jax.tree_util.tree_map(lambda a: a[s], per_sensor)
            sets.append(seg_ops.transform_planes(one, rt[s]))
        return seg_ops.merge_plane_sets(sets, seg_cfg)

    def segment_planes(self, frame: SphereFrame) -> seg_ops.PlaneSet:
        """Extract the frame's PbMap-equivalent plane set (rig frame)."""
        if not hasattr(self, "_segment"):
            self._segment = jax.jit(self._segment_impl)
        return self._segment(
            self._params["rt"], frame.local_xyz, frame.cloud_rgb, frame.cloud_valid
        )

    def segment_planes_batch(self, frames: SphereFrame) -> seg_ops.PlaneSet:
        """Segment a STACKED batch of SphereFrames (leading batch axis).

        The segmentation kernels (Hillis-Steele min-scans, one-hot moment
        matmuls) are zero-gather elementwise/MXU programs whose per-frame
        arrays are small (8x120x160); batching over frames amortizes the
        per-kernel dispatch overhead that dominates at B=1 — the same
        lever the batch-4 stitch uses for the gather stage."""
        if not hasattr(self, "_segment_batch"):
            self._segment_batch = jax.jit(
                lambda rt, lx, cr, cv: jax.vmap(
                    lambda a, b, c: self._segment_impl(rt, a, b, c)
                )(lx, cr, cv)
            )
        return self._segment_batch(
            self._params["rt"], frames.local_xyz, frames.cloud_rgb,
            frames.cloud_valid,
        )

    def segment_planes_from_sphere(
        self, sphere_depth: jnp.ndarray, sphere_rgb: jnp.ndarray | None = None,
        downsample: int = 4,
    ) -> seg_ops.PlaneSet:
        """Plane segmentation directly from the spherical image (no per-sensor
        clouds needed — covers sources like the reference's stereo variant
        `Frame360_stereo` that only provide a stitched sphere)."""
        if not hasattr(self, "_segment_sphere"):

            def impl(depth, rgb):
                d = depth[::downsample, ::downsample]
                r = rgb[::downsample, ::downsample]
                xyz = camera.sphere_backproject(d)
                valid = d > 0
                cfg = self.config.seg
                ps = seg_ops.segment_planes_sensor(xyz, r, valid, cfg)
                return seg_ops.merge_plane_sets([ps], cfg)

            self._segment_sphere = jax.jit(impl)
        if sphere_rgb is None:
            sphere_rgb = jnp.zeros(sphere_depth.shape + (3,))
        return self._segment_sphere(sphere_depth, sphere_rgb)
