"""Dense direct spherical RGB-D alignment (photo + depth consistency).

TPU-native re-design of the reference's `RegisterPhotoICP` spherical path
(reference `include/RegisterPhotoICP.h`): coarse-to-fine Gauss-Newton over a
pyramid of spherical gray/depth images, minimizing Huber-weighted photometric
and depth residuals.  Semantics kept for parity (so results are comparable):

* residuals:  photo  r_p = I_trg(warp(p)) - I_src(p)                (`:2700`)
              depth  r_d = D_trg(warp(p)) - |T p|                   (`:2727`)
* weights:    w_p = huber(r_p, s_photo)/s_photo                     (`:2705`)
              w_d = huber(r_d, s_depth*D_trg)/(s_depth*D_trg)       (`:2731`)
* jacobians:  J_T = [I | -skew(T p)] (3x6), J_proj (2x3) of the
              (col, row) spherical projection, chained with the target's
              occlusion-aware image gradients; depth adds -p^T/|p| J_T
              (`:2995-3084`)
* driver:     5 levels, <=10 GN iterations each, accept a step only if the
              mean residual drops by tol; ill-posed Hessian aborts
              (`alignFrames360:4519-4780`)
* outputs:    relative pose, 6x6 Hessian (information matrix), SSO
              co-visibility ratio = visible/total (`:3226`), av. photo/depth
              residuals (`:759-762`), per-level iteration counts.

TPU mapping: every per-pixel OpenMP loop becomes whole-image array code; the
6x6 Hessian accumulation is a (6, N) x (N, 6) matmul that XLA tiles onto the
MXU; the per-level iteration is a `lax.while_loop` so one jit covers the whole
alignment.  The warp is a dynamic gather, which TPU handles natively.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import camera, pyramid as pyr_ops, se3

PHOTO_CONSISTENCY = 0
DEPTH_CONSISTENCY = 1
PHOTO_DEPTH = 2

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclass
class FramePyramid:
    """Multi-scale spherical frame: tuples (level 0 = full res) of
    gray (H, W), depth (H, W), and the four gradient images used by the
    residual model.  Gradients are pre-masked at sensor seams."""

    gray: tuple
    depth: tuple
    gray_gx: tuple
    gray_gy: tuple
    depth_gx: tuple
    depth_gy: tuple


def pyramid_tail(pyr: "FramePyramid", start: int) -> "FramePyramid":
    """The same pyramid without its `start` finest levels — lets a caller
    run an aligner configured for fewer levels on coarser data (e.g. the
    keyframe event's connection aligns at 1/4 the rows)."""
    return FramePyramid(
        gray=pyr.gray[start:],
        depth=pyr.depth[start:],
        gray_gx=pyr.gray_gx[start:],
        gray_gy=pyr.gray_gy[start:],
        depth_gx=pyr.depth_gx[start:],
        depth_gy=pyr.depth_gy[start:],
    )


@jax.tree_util.register_dataclass
@dataclass
class AlignResult:
    pose: jnp.ndarray  # (4, 4) relative pose source -> target frame
    hessian: jnp.ndarray  # (6, 6) information matrix at the solution
    error: jnp.ndarray  # final mean residual at level 0
    av_photo_residual: jnp.ndarray
    av_depth_residual: jnp.ndarray
    sso: jnp.ndarray  # co-visibility ratio
    iters: jnp.ndarray  # (levels,) iterations used per level
    ill_posed: jnp.ndarray  # bool


def seam_masks_per_level(seam_valid, levels: int) -> tuple:
    """Precompute the per-pyramid-level seam masks on the host (numpy).

    The masks depend only on the calibration, so computing them once turns
    the per-frame `[::2**lvl, ::2**lvl]` strided slices — which lower to
    bit-packed bool gathers on TPU — into jit constants."""
    import numpy as np

    base = np.asarray(seam_valid)
    return tuple(
        jnp.asarray(base[:: 2**lvl, :: 2**lvl]) for lvl in range(levels)
    )


def build_frame_pyramid(
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    cfg: DenseRegConfig = DenseRegConfig(),
    seam_valid: jnp.ndarray | None = None,
    num_sensors: int = 8,
    spherical: bool = True,
    allow_pallas: bool = True,
) -> FramePyramid:
    """Build the alignment pyramid for one frame.

    seam_valid: optional (H, W) bool mask of trustworthy pixels (False at
    sensor seams), or a per-level tuple of such masks; if None and
    `spherical`, uniform seam columns are masked like the reference
    (`RegisterPhotoICP.h:4537-4549`).  Pinhole frames (`spherical=False`)
    have no stitch seams and skip the masking.

    Pass the PER-LEVEL tuple (see `seam_masks_per_level`) in hot paths: the
    masks are calibration-static, and slicing the full-resolution mask here
    lowers to a bit-packed bool gather per level per frame (~0.5 ms/frame).
    """
    if seam_valid is not None and not isinstance(seam_valid, (tuple, list)):
        seam_valid = seam_masks_per_level(seam_valid, cfg.pyramid_levels)
    # Level transitions: gray + depth advance together in ONE batched
    # matmul sandwich per level (bit-identical to the split pyr_down /
    # pyr_down_depth pair; the stage is kernel-chain-bound — round-5
    # pyramid fusion, docs/PERFORMANCE.md).  Odd shapes fall back.
    grays = [gray]
    depths = [depth]
    for _ in range(cfg.pyramid_levels - 1):
        g_c, d_c = grays[-1], depths[-1]
        h, w = g_c.shape
        if h % 2 == 0 and w % 2 == 0 and h >= 6 and w >= 6:
            g2, d2 = pyr_ops.fused_level_down(
                g_c, d_c, cfg.min_depth, cfg.max_depth
            )
        else:
            g2 = pyr_ops.pyr_down(g_c)
            d2 = pyr_ops.pyr_down_depth(d_c, cfg.min_depth, cfg.max_depth)
        grays.append(g2)
        depths.append(d2)
    ggx, ggy, dgx, dgy = [], [], [], []
    for lvl in range(cfg.pyramid_levels):
        from rgbd360_tpu.ops import pallas_kernels as K

        g_l, d_l = grays[lvl], depths[lvl]
        if (
            allow_pallas
            and K.use_pallas()
            and g_l.shape[0] % 16 == 0
            and g_l.shape[1] % 128 == 0
        ):
            # the halo-DMA Pallas kernel (level 0 shapes) is already one
            # fused pass per image
            gx, gy = K.fused_gradients(g_l, 16)
            hx, hy = K.fused_gradients(d_l, 16)
        else:
            # gray + depth gradients in one stacked elementwise pass per
            # axis (2 kernels/level instead of 4 — chain-bound stage)
            sx, sy = pyr_ops.gradient_xy_multi(jnp.stack([g_l, d_l]))
            gx, hx = sx[0], sx[1]
            gy, hy = sy[0], sy[1]
        if seam_valid is not None:
            m = seam_valid[lvl].astype(gx.dtype)
            m = m[: gx.shape[0], : gx.shape[1]]
            gx, gy, hx, hy = gx * m, gy * m, hx * m, hy * m
        elif spherical:
            gx = pyr_ops.mask_seams(gx, num_sensors, max(1, cfg.seam_mask_px // 2))
            gy = pyr_ops.mask_seams(gy, num_sensors, max(1, cfg.seam_mask_px // 2))
            hx = pyr_ops.mask_seams(hx, num_sensors, max(1, cfg.seam_mask_px // 2))
            hy = pyr_ops.mask_seams(hy, num_sensors, max(1, cfg.seam_mask_px // 2))
        ggx.append(gx)
        ggy.append(gy)
        dgx.append(hx)
        dgy.append(hy)
    return FramePyramid(
        gray=tuple(grays),
        depth=tuple(depths),
        gray_gx=tuple(ggx),
        gray_gy=tuple(ggy),
        depth_gx=tuple(dgx),
        depth_gy=tuple(dgy),
    )


def build_frame_pyramid_batch(
    grays: jnp.ndarray,
    depths: jnp.ndarray,
    cfg: DenseRegConfig = DenseRegConfig(),
    seam_valid=None,
    num_sensors: int = 8,
) -> FramePyramid:
    """Batched pyramid build (leading frame axis), Pallas-gradient capable.

    The fused gradient kernel has no vmap batching rule (halo DMA), so the
    batched pipelines previously fell back to the XLA roll-chain gradients
    (allow_pallas=False).  Here the per-frame builder is vmapped WITHOUT
    Pallas and the level-0 gradients — the expensive full-resolution ones —
    are then recomputed by the fused kernel over the whole batch as ONE
    row-stacked (B*H, W) image and swapped in; XLA dead-code-eliminates
    the vmapped level-0 gradients they replace.  Frame-boundary halo rows
    only influence each frame's first/last gy rows, which the gradient
    border convention zeroes anyway (gx is row-local) — bit-equal to the
    vmapped form (tested)."""
    import dataclasses as _dc

    from rgbd360_tpu.ops import pallas_kernels as K

    if seam_valid is not None and not isinstance(seam_valid, (tuple, list)):
        seam_valid = seam_masks_per_level(seam_valid, cfg.pyramid_levels)
    pyr = jax.vmap(
        lambda g, d: build_frame_pyramid(
            g, d, cfg, seam_valid, num_sensors, True, allow_pallas=False
        )
    )(grays, depths)
    b, h, w = grays.shape
    if not (K.use_pallas() and h % 16 == 0 and w % 128 == 0):
        return pyr

    row = jnp.arange(h)
    rmask = ((row > 0) & (row < h - 1))[None, :, None]

    def batch_grad(imgs):
        gx, gy = K.fused_gradients(imgs.reshape(b * h, w), 16)
        return gx.reshape(b, h, w), gy.reshape(b, h, w) * rmask

    gx, gy = batch_grad(pyr.gray[0])
    hx, hy = batch_grad(pyr.depth[0])
    if seam_valid is not None:
        m = seam_valid[0].astype(gx.dtype)
        gx, gy, hx, hy = gx * m, gy * m, hx * m, hy * m
    else:
        # mask_seams' (1, W) mask broadcasts over the (B, H, W) batch
        gx = pyr_ops.mask_seams(gx, num_sensors, max(1, cfg.seam_mask_px // 2))
        gy = pyr_ops.mask_seams(gy, num_sensors, max(1, cfg.seam_mask_px // 2))
        hx = pyr_ops.mask_seams(hx, num_sensors, max(1, cfg.seam_mask_px // 2))
        hy = pyr_ops.mask_seams(hy, num_sensors, max(1, cfg.seam_mask_px // 2))
    return _dc.replace(
        pyr,
        gray_gx=(gx,) + tuple(pyr.gray_gx[1:]),
        gray_gy=(gy,) + tuple(pyr.gray_gy[1:]),
        depth_gx=(hx,) + tuple(pyr.depth_gx[1:]),
        depth_gy=(hy,) + tuple(pyr.depth_gy[1:]),
    )


# ------------------------------------------------------------------ kernels


def _pack_target(level_trg, bilinear=False, wrap=True):
    """Stack the six target channels so each GN sweep does ONE row gather of
    a contiguous 6-vector per pixel (fastest measured form on TPU: a flat
    (N, 6) row gather; per-channel planar gathers from tiled 2D images are
    ~4x slower inside the GN while-loop).

    bilinear=True widens each row to 24 channels holding the pixel's 2x2
    bilinear tap neighborhood [self | right | down | down-right], so a
    validity-weighted bilinear sweep still costs ONE row gather (TPU gathers
    are per-row latency-bound — width is nearly free, see
    docs/PERFORMANCE.md).  `wrap` selects column wraparound (spherical
    equirect target) vs edge clamp (pinhole); rows always edge-clamp.
    Requires a 2D (H, W) level."""
    p = jnp.stack(
        [
            level_trg["gray"],
            level_trg["depth"],
            level_trg["gray_gx"],
            level_trg["gray_gy"],
            level_trg["depth_gx"],
            level_trg["depth_gy"],
        ],
        axis=-1,
    )
    if not bilinear:
        return p
    if wrap:
        right = jnp.roll(p, -1, axis=1)
    else:
        right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    down = jnp.concatenate([p[1:], p[-1:]], axis=0)
    down_right = (
        jnp.roll(down, -1, axis=1)
        if wrap
        else jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    )
    return jnp.concatenate([p, right, down, down_right], axis=-1)


def _src_points(src_depth, cfg, intr=None):
    """Pose-invariant source terms, hoisted out of the GN loop (the
    reference's LUT_xyz_sphere, `RegisterPhotoICP.h:4553-4587`; pinhole
    LUT_xyz at `:4280-4297` when `intr` is given)."""
    if intr is None:
        pts = camera.sphere_backproject(src_depth)
    else:
        pts = camera.pinhole_backproject(src_depth, intr)
    valid_src = (src_depth > cfg.min_depth) & (src_depth < cfg.max_depth)
    return pts, valid_src


def _warp_terms(pose, pts, valid_src, h, w, intr=None):
    """Transform all source points and project to the target pixel grid.

    intr=None: spherical equirect projection; `rho` is the radial range.
    intr=(3, 3) K: pinhole projection (reference `errorPhotoICP:560`);
    `rho` then carries the z-depth, which is the pinhole depth measure.
    """
    r3 = pose[:3, :3]
    t3 = pose[:3, 3]
    # Full-f32 point transform: the TPU's default bf16 matmul inputs would
    # put ~1 px of error into the warp addresses (cm-scale point error at
    # room range); the (N, 3) x (3, 3) FLOPs are negligible either way.
    tp = jnp.matmul(pts, r3.T, precision=_HI) + t3
    if intr is None:
        rc, rho = camera.sphere_project(tp, h, w)
        rf, cf = rc[..., 0], rc[..., 1] % w
        r_i = jnp.round(rc[..., 0]).astype(jnp.int32)
        c_i = jnp.round(rc[..., 1]).astype(jnp.int32) % w
        inb = (r_i >= 0) & (r_i < h) & valid_src
    else:
        uv, rho = camera.pinhole_project(tp, intr)
        rf, cf = uv[..., 1], uv[..., 0]
        r_i = jnp.round(uv[..., 1]).astype(jnp.int32)
        c_i = jnp.round(uv[..., 0]).astype(jnp.int32)
        inb = (
            (r_i >= 0) & (r_i < h) & (c_i >= 0) & (c_i < w) & (rho > 1e-6) & valid_src
        )
        c_i = jnp.clip(c_i, 0, w - 1)
    r_s = jnp.clip(r_i, 0, h - 1)
    # Bilinear tap addressing (used only when the target pack is 24-wide):
    # floor cell + in-cell fractions; the pack's right/down taps handle the
    # column wrap / row clamp, so r0/c0 alone address all four taps.
    r0f = jnp.floor(rf)
    c0f = jnp.floor(cf)
    frac_r = jnp.clip(rf - r0f, 0.0, 1.0)
    frac_c = jnp.clip(cf - c0f, 0.0, 1.0)
    # Where the floor coordinate was clipped into the grid (continuous
    # coordinate in [-0.5, 0): top image row; top/left edge pinhole), the
    # fraction must collapse to 0 so the blend does not shift the sample a
    # pixel inward of the nearest sampler's round() position.  Spherical
    # columns wrap (cf already in [0, w)), so the column fix only bites on
    # the pinhole path.
    frac_r = jnp.where(r0f < 0, 0.0, frac_r)
    frac_c = jnp.where(c0f < 0, 0.0, frac_c)
    r0 = jnp.clip(r0f, 0, h - 1).astype(jnp.int32)
    c0 = jnp.clip(c0f, 0, w - 1).astype(jnp.int32)
    return dict(
        tp=tp, rho=rho, r=r_s, c=c_i, visible=inb, valid_src=valid_src,
        r0=r0, c0=c0, frac_r=frac_r, frac_c=frac_c,
    )


def _huber(err, scale):
    """Huber weight (reference `RegisterPhotoICP.h:weightHuber:545`)."""
    a = jnp.abs(err)
    w = jnp.sqrt(jnp.clip(2.0 * scale * a - scale * scale, 0.0, None)) / jnp.maximum(
        a, 1e-12
    )
    return jnp.where(a < scale, 1.0, w)


def _residual_terms(
    src_gray, pts, valid_src, trg_pack, pose, cfg, method, occlusion=0, intr=None
):
    """Per-pixel weighted residuals + masks for one pyramid level.

    Works on (H, W) dense source arrays or flat (K,) salient-pixel subsets
    (the target grid dimensions come from trg_pack).

    occlusion=1 adds a z-buffer test: where several source points project to
    the same target pixel only the nearest stays valid (the reference's
    `_sphereOcc1` variants, `RegisterPhotoICP.h:3232-3718`).
    occlusion=2 additionally drops residuals exceeding the depth-outlier
    threshold — moving-object rejection (`_sphereOcc2` + the
    `mask_dynamic_occlusion` machinery, `:3720-4250`; the pinhole occlusion
    variants `_Occ1:1107` / `_Occ2:1547` are the same tests under the pinhole
    projection selected by `intr`)."""
    h, w = trg_pack.shape[0], trg_pack.shape[1]
    wt = _warp_terms(pose, pts, valid_src, h, w, intr)
    r, c = wt["r"], wt["c"]
    nch = trg_pack.shape[-1]
    if nch == 24:
        # Validity-weighted bilinear target sampling (opt-in via
        # DenseRegConfig.bilinear).  Still ONE row gather per sweep: the
        # 24-wide pack rows carry the full 2x2 tap neighborhood (see
        # _pack_target).  All six channels share ONE weight set derived
        # from tap depth validity — a per-channel mix (photo bilinear,
        # depth nearest) was measured WORSE than nearest from channel
        # inconsistency (docs/PERFORMANCE.md).  Taps are dropped when
        # depth-invalid; blending falls back to the nearest tap jointly
        # when the weighted validity mass is low or the taps straddle a
        # depth discontinuity (never interpolate across surfaces — the
        # failure mode that inflated the depth-residual statistic in the
        # rejected full-lerp experiment).
        lin = wt["r0"] * w + wt["c0"]
        tv24 = jnp.take(trg_pack.reshape(-1, 24), lin, axis=0)
        taps = [tv24[..., 6 * i : 6 * i + 6] for i in range(4)]
        fr, fc = wt["frac_r"], wt["frac_c"]
        bw = [(1 - fr) * (1 - fc), (1 - fr) * fc, fr * (1 - fc), fr * fc]
        dtap = [t[..., 1] for t in taps]
        ew = [b * (d > 0) for b, d in zip(bw, dtap)]
        s = ew[0] + ew[1] + ew[2] + ew[3]
        # depth spread over taps that actually contribute weight
        live = [e > 1e-6 for e in ew]
        dmax = jnp.maximum(
            jnp.maximum(jnp.where(live[0], dtap[0], -jnp.inf),
                        jnp.where(live[1], dtap[1], -jnp.inf)),
            jnp.maximum(jnp.where(live[2], dtap[2], -jnp.inf),
                        jnp.where(live[3], dtap[3], -jnp.inf)),
        )
        dmin = jnp.minimum(
            jnp.minimum(jnp.where(live[0], dtap[0], jnp.inf),
                        jnp.where(live[1], dtap[1], jnp.inf)),
            jnp.minimum(jnp.where(live[2], dtap[2], jnp.inf),
                        jnp.where(live[3], dtap[3], jnp.inf)),
        )
        spread_ok = (dmax - dmin) <= jnp.maximum(
            cfg.bilerp_depth_spread * dmax, 0.05
        )
        blend_ok = (s > 0.5) & spread_ok
        blended = (
            ew[0][..., None] * taps[0]
            + ew[1][..., None] * taps[1]
            + ew[2][..., None] * taps[2]
            + ew[3][..., None] * taps[3]
        ) / jnp.maximum(s, 1e-6)[..., None]
        near = jnp.where(
            (fr < 0.5)[..., None],
            jnp.where((fc < 0.5)[..., None], taps[0], taps[1]),
            jnp.where((fc < 0.5)[..., None], taps[2], taps[3]),
        )
        tvp = jnp.where(blend_ok[..., None], blended, near)
    else:
        # One gather for all six target channels, addressed by flat linear
        # index: TPU executes a row-gather from an (N, 6) operand ~4x faster
        # than a 2D (r, c) gather from (H, W, 6), which forces a
        # layout-change copy of the whole pack before every sweep.
        lin = r * w + c
        tvp = jnp.take(trg_pack.reshape(-1, 6), lin, axis=0)
    tv = [tvp[..., k] for k in range(6)]

    if occlusion >= 1:
        # scatter-min z-buffer on the target grid; a projecting point that
        # is farther than the winner at its pixel is occluded.  Binned by
        # the NEAREST pixel index in both sampling modes so occlusion
        # semantics stay identical and only target sampling differs (the
        # bilinear gather's floor-cell index can sit ~1.4 px away).
        lin_near = r * w + c
        rho_w = jnp.where(wt["visible"], wt["rho"], jnp.inf)
        zbuf = jnp.full((h * w,), jnp.inf).at[lin_near].min(rho_w)
        occluded = wt["rho"] > zbuf[lin_near] + 0.05
        wt["visible"] = wt["visible"] & ~occluded

    out = dict(visible=wt["visible"], tp=wt["tp"], rho=wt["rho"])
    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        gx, gy = tv[2], tv[3]
        salient = (jnp.abs(gx) >= cfg.sal_intensity) | (jnp.abs(gy) >= cfg.sal_intensity)
        diff = tv[0] - src_gray
        w_p = _huber(diff, cfg.std_photo) / cfg.std_photo
        m = wt["visible"] & salient
        out.update(
            photo_res=jnp.where(m, w_p * diff, 0.0),
            photo_w=jnp.where(m, w_p, 0.0),
            photo_mask=m,
            photo_gx=gx,
            photo_gy=gy,
        )
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        d2, dgx, dgy = tv[1], tv[4], tv[5]
        salient = (jnp.abs(dgx) >= cfg.sal_depth) | (jnp.abs(dgy) >= cfg.sal_depth)
        has_d = d2 > 0
        diff = d2 - wt["rho"]
        s = cfg.std_depth * jnp.maximum(d2, 1e-3)
        w_d = _huber(diff, s) / s
        m = wt["visible"] & salient & has_d
        if occlusion >= 2:
            # dynamic-object / outlier rejection (thresDepthOutliers = 0.3,
            # reference `alignFrames360:4525`)
            dynamic = jnp.abs(diff) > 0.3
            m = m & ~dynamic
            out["dynamic_mask"] = dynamic & wt["visible"] & has_d
        out.update(
            depth_res=jnp.where(m, w_d * diff, 0.0),
            depth_w=jnp.where(m, w_d, 0.0),
            depth_mask=m,
            depth_gx=dgx,
            depth_gy=dgy,
        )
    return out


def _proj_jacobian(tp, w):
    """J of (col, row) wrt the 3D point (reference `:3001-3020`).

    Returns (..., 2, 3): row 0 = d(col)/dp, row 1 = d(row)/dp.
    """
    res_inv = w / (2.0 * jnp.pi)
    x, y, z = tp[..., 0], tp[..., 1], tp[..., 2]
    rho2 = x * x + y * y + z * z
    rho = jnp.sqrt(jnp.maximum(rho2, 1e-12))
    rho_inv = 1.0 / rho
    z_s = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    z_inv = 1.0 / z_s
    d_atan = res_inv / (1.0 + (y * z_inv) ** 2)
    j00 = jnp.zeros_like(x)
    j01 = d_atan * z_inv
    j02 = -y * z_inv * z_inv * d_atan
    x_r2 = x / jnp.maximum(rho2, 1e-12)
    d_asin = res_inv / jnp.sqrt(jnp.clip(1.0 - x * x_r2, 1e-9, None))
    j10 = -d_asin * rho_inv * (1.0 - x * x_r2)
    j11 = d_asin * x_r2 * y * rho_inv
    j12 = d_asin * x_r2 * z * rho_inv
    return jnp.stack(
        [jnp.stack([j00, j01, j02], -1), jnp.stack([j10, j11, j12], -1)], axis=-2
    )


def _proj_jacobian_pinhole(tp, intr):
    """J of (col=u, row=v) wrt the 3D point for a pinhole camera (reference
    `calcHessGrad:776`: du/dp = (fx/z, 0, -fx x/z^2), dv/dp analogous).

    Returns (..., 2, 3): row 0 = d(u)/dp, row 1 = d(v)/dp.
    """
    x, y, z = tp[..., 0], tp[..., 1], tp[..., 2]
    z_s = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    z_inv = 1.0 / z_s
    fx, fy = intr[0, 0], intr[1, 1]
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1)
    row_v = jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def _hess_grad(level_src, level_trg, pose, cfg, method, occlusion=0, intr=None):
    """Assemble the 6x6 normal equations (wrapper building hoistable terms)."""
    pts, valid_src = _src_points(level_src["depth"], cfg, intr)
    return _hess_grad_packed(
        level_src["gray"], pts, valid_src,
        _pack_target(level_trg, cfg.bilinear, wrap=intr is None), pose, cfg,
        method, occlusion, intr,
    )


def _hess_grad_packed(
    src_gray, pts, valid_src, trg_pack, pose, cfg, method, occlusion=0, intr=None
):
    """Assemble the 6x6 normal equations for one GN iteration."""
    t = _residual_terms(
        src_gray, pts, valid_src, trg_pack, pose, cfg, method, occlusion, intr
    )
    tp = t["tp"]
    w = trg_pack.shape[1]

    if intr is None:
        jproj = _proj_jacobian(tp, w)  # (H, W, 2, 3)
    else:
        jproj = _proj_jacobian_pinhole(tp, intr)
    # J_T = [I | -skew(tp)]; chain directly instead of materializing (3, 6):
    # for a row vector a (1x3): a @ J_T = [a | -a x tp ... ] — cross products.
    def chain(a):  # a: (H, W, 3) -> (H, W, 6)
        lin = a
        ang = -jnp.cross(a, tp)  # a @ (-skew(tp)) = -(a x tp)... see below
        return jnp.concatenate([lin, ang], axis=-1)

    # a @ (-skew(p)) = -(a^T skew(p))^T = (p x a) — verify: (skew(p) v = p x v);
    # row-vector times matrix: a_j (-skew(p))_{jk} = -(a x p)_k = (p x a)_k.
    def chain_row(a):
        return jnp.concatenate([a, jnp.cross(tp, a)], axis=-1)

    del chain

    hess = jnp.zeros((6, 6))
    grad = jnp.zeros((6,))
    stats = {}

    if "photo_res" in t:
        g2 = jnp.stack([t["photo_gx"], t["photo_gy"]], axis=-1)  # (H, W, 2)
        a = jnp.einsum("...k,...kj->...j", g2, jproj)
        jac = chain_row(a) * t["photo_w"][..., None]  # (H, W, 6)
        jac = jnp.where(t["photo_mask"][..., None], jac, 0.0)
        jf = jac.reshape(-1, 6)
        rf = t["photo_res"].reshape(-1)
        hess = hess + jnp.matmul(jf.T, jf, precision=_HI)
        grad = grad + jnp.matmul(jf.T, rf, precision=_HI)
        stats["photo_sq"] = jnp.sum(rf * rf)
        stats["photo_n"] = jnp.sum(t["photo_mask"])
    if "depth_res" in t:
        g2 = jnp.stack([t["depth_gx"], t["depth_gy"]], axis=-1)
        a = jnp.einsum("...k,...kj->...j", g2, jproj)
        if intr is None:
            rho_inv = 1.0 / jnp.maximum(t["rho"], 1e-9)
            a = a - tp * rho_inv[..., None]  # -d|p|/dp term (reference `:3082`)
        else:
            # pinhole depth measure is z: -dz/dp = -e_z (reference `:991`)
            a = a.at[..., 2].add(-1.0)
        jac = chain_row(a) * t["depth_w"][..., None]
        jac = jnp.where(t["depth_mask"][..., None], jac, 0.0)
        jf = jac.reshape(-1, 6)
        rf = t["depth_res"].reshape(-1)
        hess = hess + jnp.matmul(jf.T, jf, precision=_HI)
        grad = grad + jnp.matmul(jf.T, rf, precision=_HI)
        stats["depth_sq"] = jnp.sum(rf * rf)
        stats["depth_n"] = jnp.sum(t["depth_mask"])

    stats["visible"] = jnp.sum(t["visible"])
    # Mean weighted residual sqrt(sum(w r)^2 / n) (reference
    # errorPhotoICP_sphere:2545) — the H/g/error triple from ONE pixel sweep.
    err2 = stats.get("photo_sq", 0.0) + stats.get("depth_sq", 0.0)
    n = stats.get("photo_n", 0) + stats.get("depth_n", 0)
    stats["mean_err"] = jnp.sqrt(err2 / jnp.maximum(n, 1))
    return hess, grad, stats


def _gn_level(
    src_gray, pts, valid_src, trg_pack, pose, ill, cfg, method, occlusion,
    intr, max_iters,
):
    """One pyramid level of Gauss-Newton: fused (H, g, err) sweeps with
    accept-if-improved stepping (reference semantics: a rejected step sets
    diff_error <= tol which exits the loop, `RegisterPhotoICP.h:4715-4722`).
    Returns (pose, err, iters, ill, hessian, stats) where hessian/stats come
    from the last ACCEPTED evaluation — at exit they ARE the final pose's
    information matrix / SSO / residuals, so no separate statistics sweep is
    needed (reference `:759-762`, `:3226`)."""

    def cond(carry):
        cand, best, err_best, it, upd, diff, ill_l = carry[:7]
        return (
            (it < max_iters)
            & (upd > cfg.tol_update)
            & (diff > cfg.tol_residual)
            & ~ill_l
        )

    def body(carry):
        cand, best, err_best, it, upd, diff, ill_l, h_best, st_best = carry
        hess, grad, stats = _hess_grad_packed(
            src_gray, pts, valid_src, trg_pack, cand, cfg, method,
            occlusion, intr,
        )
        err = stats["mean_err"]
        # Observability guard (reference `:4682-4690`).
        bad = (jnp.linalg.det(hess) < 1e-12) | ~jnp.all(jnp.isfinite(hess))
        hsafe = jnp.where(bad, jnp.eye(6), hess)
        update = -jnp.linalg.solve(hsafe, grad)
        improved = (err_best - err) > cfg.tol_residual
        accept = improved & ~bad
        best_next = jnp.where(accept, cand, best)
        err_next = jnp.where(accept, err, err_best)
        h_next = jnp.where(accept, hess, h_best)
        st_next = {k: jnp.where(accept, stats[k], st_best[k]) for k in st_best}
        next_cand = se3.se3_exp(update) @ cand
        cand_next = jnp.where(accept, next_cand, best_next)
        it = it + jnp.where(accept, 1, 0)
        diff_next = jnp.where(bad, 0.0, err_best - err)
        return (
            cand_next,
            best_next,
            err_next,
            it,
            jnp.linalg.norm(update),
            diff_next,
            ill_l | bad,
            h_next,
            st_next,
        )

    stats0 = {"mean_err": jnp.array(0.0), "visible": jnp.array(0)}
    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        stats0.update(photo_sq=jnp.array(0.0), photo_n=jnp.array(0))
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        stats0.update(depth_sq=jnp.array(0.0), depth_n=jnp.array(0))
    carry = (
        pose,
        pose,
        jnp.array(jnp.inf),
        jnp.array(-1),
        jnp.array(1.0),
        jnp.array(1.0),
        ill,
        jnp.zeros((6, 6)),
        stats0,
    )
    out = jax.lax.while_loop(cond, body, carry)
    cand_f, pose_f, err, n_it, _, _, ill_f, hess_f, stats_f = out
    return pose_f, err, n_it, ill_f, hess_f, stats_f


# ------------------------------------------------------------------ driver


def scale_intrinsics(k: jnp.ndarray, lvl: int) -> jnp.ndarray:
    """Pinhole K at pyramid level `lvl` (reference `scaleCameraParams`:
    fx, fy, cx, cy all halve per level, `RegisterPhotoICP.h:487-495`)."""
    s = 0.5**lvl
    return jnp.array(
        [
            [k[0, 0] * s, 0.0, k[0, 2] * s],
            [0.0, k[1, 1] * s, k[1, 2] * s],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )


class DenseAligner:
    """Coarse-to-fine dense alignment engine.

    Equivalent of one `RegisterPhotoICP` instance driving `alignFrames360`
    (spherical, the default) or `alignFrames` (`RegisterPhotoICP.h:4254`,
    pinhole — pass `intrinsics=K` for a single RGB-D camera pair).  The whole
    multi-level optimization is one jitted function per (shape, method) pair.
    """

    def __init__(
        self,
        cfg: DenseRegConfig = DenseRegConfig(),
        intrinsics: jnp.ndarray | None = None,
    ):
        self.cfg = cfg
        self.intrinsics = None if intrinsics is None else jnp.asarray(intrinsics)
        self._align = jax.jit(
            self._align_impl, static_argnames=("method", "occlusion")
        )

    def align(
        self,
        src: FramePyramid,
        trg: FramePyramid,
        init_pose: jnp.ndarray | None = None,
        method: int = PHOTO_DEPTH,
        occlusion: int = 0,
    ) -> AlignResult:
        """occlusion: 0 = plain, 1 = z-buffer occlusion test,
        2 = occlusion + dynamic-object rejection (reference
        `alignFrames360(..., occlusion)` modes)."""
        if init_pose is None:
            init_pose = jnp.eye(4)
        return self._align(src, trg, init_pose, method=method, occlusion=occlusion)

    def coarse_errors(
        self,
        src: FramePyramid,
        trg: FramePyramid,
        poses: jnp.ndarray,
        method: int = PHOTO_DEPTH,
    ) -> jnp.ndarray:
        """(N,) mean residual at the COARSEST pyramid level for a batch of
        candidate poses — one cheap vmapped sweep (the coarse sphere is
        ~120x20 px), used to rank rotation hypotheses before committing to a
        full coarse-to-fine solve (tracker rescue after seed failure)."""
        if not hasattr(self, "_coarse"):
            self._coarse = jax.jit(
                self._coarse_errors_impl, static_argnames=("method",)
            )
        return self._coarse(src, trg, poses, method=method)

    def _coarse_errors_impl(self, src, trg, poses, method):
        cfg = self.cfg
        lvl = cfg.pyramid_levels - 1
        lsrc = self._level_dicts(src, lvl)
        ltrg = self._level_dicts(trg, lvl)
        intr = (
            None
            if self.intrinsics is None
            else scale_intrinsics(self.intrinsics, lvl)
        )
        trg_pack = _pack_target(ltrg, cfg.bilinear, wrap=intr is None)
        pts, valid_src = _src_points(lsrc["depth"], cfg, intr)

        def one(pose):
            _, _, stats = _hess_grad_packed(
                lsrc["gray"], pts, valid_src, trg_pack, pose, cfg, method, 0, intr
            )
            return stats["mean_err"]

        return jax.vmap(one)(poses)

    def coarse_align(
        self,
        src: FramePyramid,
        trg: FramePyramid,
        poses: jnp.ndarray,
        method: int = PHOTO_DEPTH,
        iters: int = 10,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """GN-refine a BATCH of candidate poses at the coarsest pyramid
        level (vmapped — the coarse sphere is tiny) and return
        (refined poses (N,4,4), post-alignment errors (N,)).

        Multi-hypothesis search ranks candidates by the error AFTER coarse
        refinement, not at the static candidate pose — a hypothesis with
        the right heading but a metre of translation error scores terribly
        statically yet converges cleanly (wide coarse translation basin),
        while a heading-aliased hypothesis stays bad.  Used by the tracker
        rescue and verified relocalization."""
        if not hasattr(self, "_coarse_align"):
            self._coarse_align = jax.jit(
                self._coarse_align_impl, static_argnames=("method", "iters")
            )
        return self._coarse_align(src, trg, poses, method=method, iters=iters)

    def _coarse_align_impl(self, src, trg, poses, method, iters):
        cfg = self.cfg
        lvl = cfg.pyramid_levels - 1
        lsrc = self._level_dicts(src, lvl)
        ltrg = self._level_dicts(trg, lvl)
        intr = (
            None
            if self.intrinsics is None
            else scale_intrinsics(self.intrinsics, lvl)
        )
        trg_pack = _pack_target(ltrg, cfg.bilinear, wrap=intr is None)
        pts, valid_src = _src_points(lsrc["depth"], cfg, intr)

        def sweep(pose):
            return _hess_grad_packed(
                lsrc["gray"], pts, valid_src, trg_pack, pose, cfg, method, 0, intr
            )

        def one(pose0):
            def body(_, pose):
                hess, grad, _ = sweep(pose)
                bad = (jnp.linalg.det(hess) < 1e-12) | ~jnp.all(
                    jnp.isfinite(hess)
                )
                upd = -jnp.linalg.solve(
                    jnp.where(bad, jnp.eye(6), hess), grad
                )
                upd = jnp.where(bad, jnp.zeros(6), upd)
                return se3.se3_exp(upd) @ pose

            pose = jax.lax.fori_loop(0, iters, body, pose0)
            _, _, stats = sweep(pose)
            return pose, stats["mean_err"]

        return jax.vmap(one)(poses)

    # implementation

    def _level_dicts(self, pyr: FramePyramid, lvl: int):
        return dict(
            gray=pyr.gray[lvl],
            depth=pyr.depth[lvl],
            gray_gx=pyr.gray_gx[lvl],
            gray_gy=pyr.gray_gy[lvl],
            depth_gx=pyr.depth_gx[lvl],
            depth_gy=pyr.depth_gy[lvl],
        )

    def _align_impl(self, src, trg, init_pose, method, occlusion=0):
        cfg = self.cfg
        pose = init_pose
        iters = []
        ill = jnp.array(False)
        err = jnp.array(0.0)
        hess_out = jnp.zeros((6, 6))
        sso = jnp.array(0.0)

        for lvl in reversed(range(cfg.pyramid_levels)):
            lsrc = self._level_dicts(src, lvl)
            ltrg = self._level_dicts(trg, lvl)
            src_gray = lsrc["gray"]
            intr = (
                None
                if self.intrinsics is None
                else scale_intrinsics(self.intrinsics, lvl)
            )
            trg_pack = _pack_target(ltrg, cfg.bilinear, wrap=intr is None)

            # Salient-pixel sweeps (reference bUseSalientPixels, which gates
            # every pyramid level): at each level whose pixel count exceeds
            # twice its budget, sweep only the k most salient source pixels.
            # The per-level budget halves the fraction kept per level the
            # same way the reference's fixed thresholds thin coarser levels.
            k_lvl = cfg.salient_pixels >> (2 * lvl)
            if lvl == 2:
                # moderate stratified thinning at level 2: a 1/4 density
                # budget reproduces the dense pose to ~4 mm on the samples
                # and saves ~0.6 ms/frame of per-row gather latency (the
                # aggressive >>2lvl budget — 8% — stalls convergence here,
                # and levels 3-4 are too cheap and too load-bearing to thin)
                k_lvl = src_gray.size // 4
            if (
                cfg.salient_pixels > 0
                and lvl <= 2
                and src_gray.size > 2 * k_lvl
                and k_lvl > 0
            ):
                d_full = lsrc["depth"]
                h_l, w_l = d_full.shape
                valid_full = (d_full > cfg.min_depth) & (d_full < cfg.max_depth)
                score = (
                    jnp.abs(src.gray_gx[lvl])
                    + jnp.abs(src.gray_gy[lvl])
                    + jnp.abs(src.depth_gx[lvl])
                    + jnp.abs(src.depth_gy[lvl])
                )
                score = jnp.where(valid_full, score, -1.0).reshape(-1)
                # Stratified selection: one most-salient pixel per tile of
                # N/K consecutive pixels.  Unlike a global top-k this needs
                # no 614k-element sort (0.8 ms on chip) and spreads the
                # constraints over the whole sphere, which keeps the normal
                # equations well conditioned even on low-texture scenes.
                total = score.shape[0]
                k = min(k_lvl, total)
                tile = total // k
                tiles = score[: k * tile].reshape(k, tile)
                sal_idx = jnp.arange(k) * tile + jnp.argmax(tiles, axis=1)
                # ONE packed row gather for the subset; everything else is
                # recomputed from the gathered depth (TPU gathers are per-row
                # latency-bound: three separate takes — and especially a
                # bit-packed bool take — cost ~6x this single (k, 2) take,
                # and the full-image backproject they fed from is skipped
                # entirely).
                gd = jnp.stack([src_gray.reshape(-1), d_full.reshape(-1)], axis=-1)
                gd = jnp.take(gd, sal_idx, axis=0)  # (k, 2)
                src_gray = gd[:, 0]
                d_s = gd[:, 1]
                valid_src = (d_s > cfg.min_depth) & (d_s < cfg.max_depth)
                r_s = sal_idx // w_l
                c_s = sal_idx % w_l
                if intr is None:
                    pts = camera.sphere_rays_at(r_s, c_s, h_l, w_l) * d_s[:, None]
                else:
                    xn = (c_s.astype(jnp.float32) - intr[0, 2]) / intr[0, 0]
                    yn = (r_s.astype(jnp.float32) - intr[1, 2]) / intr[1, 1]
                    pts = jnp.stack([xn * d_s, yn * d_s, d_s], axis=-1)
            else:
                pts, valid_src = _src_points(lsrc["depth"], cfg, intr)

            pose, err, n_it, ill, hess_lvl, stats_lvl = _gn_level(
                src_gray, pts, valid_src, trg_pack, pose, ill, cfg, method,
                occlusion, intr, cfg.max_iters_per_level,
            )
            iters.append(jnp.maximum(n_it, 0))
            if lvl == 0:
                hess_out, stats = hess_lvl, stats_lvl
                size = src_gray.size

        if cfg.salient_pixels > 0 and cfg.polish_iters > 0:
            # Dense polish (beyond reference): a couple of FULL-sweep GN
            # iterations at the finest level after the thinned solve — the
            # salient subset converges near the optimum, the dense sweeps
            # remove its selection bias, so throughput configurations keep
            # dense-level accuracy at a fraction of the dense iteration
            # budget.  The polish Hessian/statistics replace the thinned
            # ones (they describe the FULL image).
            lsrc = self._level_dicts(src, 0)
            ltrg = self._level_dicts(trg, 0)
            intr0 = (
                None if self.intrinsics is None else scale_intrinsics(self.intrinsics, 0)
            )
            pts, valid_src = _src_points(lsrc["depth"], cfg, intr0)
            pose, err, _, ill, hess_out, stats = _gn_level(
                lsrc["gray"], pts, valid_src,
                _pack_target(ltrg, cfg.bilinear, wrap=intr0 is None), pose,
                ill, cfg, method, occlusion, intr0, cfg.polish_iters,
            )
            size = lsrc["gray"].size

        # Final statistics come from the level-0 loop's last ACCEPTED
        # evaluation (Hessian = information matrix, SSO, average residuals).
        sso = stats["visible"] / size
        av_photo = jnp.sqrt(
            stats.get("photo_sq", jnp.array(0.0))
            / jnp.maximum(stats.get("photo_n", jnp.array(1)), 1)
        )
        av_depth = jnp.sqrt(
            stats.get("depth_sq", jnp.array(0.0))
            / jnp.maximum(stats.get("depth_n", jnp.array(1)), 1)
        )

        return AlignResult(
            pose=pose,
            hessian=hess_out,
            error=err,
            av_photo_residual=av_photo,
            av_depth_residual=av_depth,
            sso=sso,
            iters=jnp.stack(iters[::-1]),
            ill_posed=ill,
        )


def entropy_from_hessian(hess: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy of the pose estimate (Kerl IROS'13; reference
    `RegisterPhotoICP::calcEntropy` / `RegisterRGBD360.h:230`)."""
    from rgbd360_tpu.utils.metrics import entropy

    return entropy(hess)


def batch_align_targets(aligner, src_pyr, trg_pyrs: list, seeds: list):
    """Dense-align ONE source pyramid against SEVERAL target pyramids in
    one vmapped dispatch — the per-keyframe-event pattern (connection
    candidates, loop-closure verifications), where a sequential loop pays
    one dispatch + fetch round trip per candidate.

    `trg_pyrs`/`seeds` are python lists; the batch is padded to the next
    power of two by repeating the first entry, so ONE compiled program per
    power-of-two size serves every event (padding entries are computed and
    discarded — one wider dispatch still beats per-candidate round trips).
    Returns the FETCHED result pytree with a leading axis of
    len(trg_pyrs); `batch_align_targets_dispatch` is the un-fetched half
    for callers overlapping the solve with other work (the deferred
    keyframe event)."""
    res = jax.device_get(
        batch_align_targets_dispatch(aligner, src_pyr, trg_pyrs, seeds)
    )
    return jax.tree_util.tree_map(lambda a: a[: len(trg_pyrs)], res)


def batch_align_targets_dispatch(aligner, src_pyr, trg_pyrs: list, seeds: list):
    """Dispatch-only half of `batch_align_targets`: returns the DEVICE
    result pytree, padded to the compiled power-of-two batch — slice
    `[:len(trg_pyrs)]` after fetching."""
    import numpy as _np

    n = len(trg_pyrs)
    if n == 0:
        raise ValueError("batch_align_targets needs at least one target")
    # even batch sizes, exact above 4 (one compiled program per size seen;
    # sizes are small ints bounded by max_connections / max_dense_checks
    # and the warmup lap covers them) — power-of-two padding computed 8
    # aligns for a 6-candidate slate, wasted device time on the serial
    # stream.  NOTE: exact ODD sizes measured a reproducible TPU runtime
    # crash in the vmapped align at batch 3 (kernel fault, round 4); even
    # padding avoids the faulting shapes at ≤17% waste.
    cap = n + (n & 1)
    trg_pyrs = list(trg_pyrs) + [trg_pyrs[0]] * (cap - n)
    seeds = [_np.asarray(s) for s in seeds] + [_np.eye(4)] * (cap - n)
    # the pytree stack happens INSIDE the jitted program: eager jnp.stack
    # over the ~30 pyramid leaves costs one dispatch round trip EACH on a
    # remote-attached chip (measured: it more than undid the batching win)
    caches = getattr(aligner, "_batch_targets_jit", None)
    if caches is None:
        caches = aligner._batch_targets_jit = {}
    if cap not in caches:

        def impl(src, sds, *trgs):
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *trgs
            )
            return jax.vmap(
                lambda t, s: aligner._align_impl(src, t, s, PHOTO_DEPTH)
            )(stacked, sds)

        caches[cap] = jax.jit(impl)
    return caches[cap](src_pyr, jnp.asarray(_np.stack(seeds)), *trg_pyrs)
