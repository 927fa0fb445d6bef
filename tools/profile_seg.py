"""Profile segmentation sub-stages on the attached chip.

Uses bench.py's `_scan_time_ms` methodology (k chained steps inside one jit
with a carry dependency + a real host readback; the axon tunnel's
`block_until_ready` does not synchronize, so naive timing under-reads).
"""
import math
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _scan_time_ms
from rgbd360_tpu.core.frame import FrameBuilder, RigFrame
from rgbd360_tpu.io.bin_format import read_rig_frame
from rgbd360_tpu.io.calib import load_calibration
from rgbd360_tpu.ops import segmentation as S


def main():
    calib = load_calibration(
        "/root/reference/Calibration/Extrinsics",
        "/root/reference/Calibration/Intrinsics",
    )
    builder = FrameBuilder(calib)
    raw = read_rig_frame("/root/reference/samples/sphere_images_1.bin")
    sphere = builder.build(RigFrame.from_raw(raw))
    xyz, rgb, valid = sphere.local_xyz, sphere.cloud_rgb, sphere.cloud_valid
    seg_cfg = builder.config.seg
    rt_p = builder._params["rt"]
    h, w = valid.shape[-2:]
    print("cloud shapes:", xyz.shape, rgb.shape, valid.shape)

    def report(name, step, init, k=32):
        med, sp, mn = _scan_time_ms(step, init, k, lambda o: np.asarray(o))
        print(f"{name:32s}: {med:7.3f} ms (min {mn:.3f}, spread {sp:.3f})")

    # full production _segment_impl (8 sensors + merge)
    def full_step(carry):
        ps = builder._segment_impl(rt_p, carry, rgb, valid)
        return carry + ps.area[0] * 0

    report("full _segment_impl", full_step, xyz)

    # normals only
    def norm_step(carry):
        n = jax.vmap(
            lambda x, v: S.estimate_normals(x, v, seg_cfg.normal_smoothing_size)
        )(carry, valid)
        return carry + n[0, 0, 0, 0] * 0

    report("normals", norm_step, xyz)

    cos_gate = math.cos(seg_cfg.angular_threshold)

    def compat(x, v):
        n = S.estimate_normals(x, v, seg_cfg.normal_smoothing_size)
        p = jnp.where(v[..., None], x, 0.0)

        def edge_compat(pa, na, va, pb, nb, vb):
            cos = jnp.sum(na * nb, axis=-1)
            dp = pb - pa
            da = jnp.abs(jnp.sum(na * dp, axis=-1))
            db = jnp.abs(jnp.sum(nb * dp, axis=-1))
            return (
                va & vb & (cos > cos_gate)
                & (da < seg_cfg.distance_threshold)
                & (db < seg_cfg.distance_threshold)
            )

        cr = edge_compat(p[:-1], n[:-1], v[:-1], p[1:], n[1:], v[1:])
        cc = edge_compat(
            p[:, :-1], n[:, :-1], v[:, :-1], p[:, 1:], n[:, 1:], v[:, 1:]
        )
        return cr, cc

    # normals + compat + CC chain
    def lab_step(carry):
        def one(x, v):
            cr, cc = compat(x, v)
            return S._connected_labels(cr, cc, v, seg_cfg.cc_iters)

        lab = jax.vmap(one)(carry, valid)
        return carry + lab[0, 0, 0].astype(carry.dtype) * 0

    report("normals+compat+CC", lab_step, xyz)

    # histogram + top_k (labels recomputed lightly as input via carry trick:
    # feed labels as carry)
    lab0 = jax.jit(
        jax.vmap(
            lambda x, v: S._connected_labels(*compat(x, v), v, seg_cfg.cc_iters)
        )
    )(xyz, valid)
    lab0 = jnp.asarray(np.asarray(lab0))

    def hist_step(carry):
        def one(labels, v):
            flat_lab = jnp.where(v, labels, h * w).reshape(-1)
            nbins = h * w + 1
            n_hi = (nbins + 127) // 128
            oh_hi = (
                flat_lab[None, :] // 128 == jnp.arange(n_hi)[:, None]
            ).astype(jnp.bfloat16)
            oh_lo = (
                flat_lab[:, None] % 128 == jnp.arange(128)[None, :]
            ).astype(jnp.bfloat16)
            counts = jnp.matmul(oh_hi, oh_lo, preferred_element_type=jnp.float32)
            counts = counts.reshape(-1)[:nbins]
            k_counts, k_labels = jax.lax.top_k(
                counts[:-1], seg_cfg.max_planes_sensor
            )
            return k_counts, k_labels

        kc, kl = jax.vmap(one)(carry, valid)
        return carry + kc[0, 0].astype(carry.dtype) * 0

    report("count hist + top_k", hist_step, lab0)

    # B=4 production batched segmentation (the bench's seg4 form)
    lx4 = jnp.stack([xyz] * 4)
    cr4 = jnp.stack([rgb] * 4)
    cv4 = jnp.stack([valid] * 4)

    def seg4_step(carry):
        ps = jax.vmap(lambda a: builder._segment_impl(rt_p, a, rgb, valid))(carry)
        return carry + ps.area[0, 0] * 0

    report("seg batch4 (broadcast rgb/ok)", seg4_step, lx4, k=16)

    def seg4b_step(carry):
        ps = jax.vmap(
            lambda a, b, c: builder._segment_impl(rt_p, a, b, c)
        )(carry, cr4, cv4)
        return carry + ps.area[0, 0] * 0

    report("seg batch4 (vmapped rgb/ok)", seg4b_step, lx4, k=16)


if __name__ == "__main__":
    main()
