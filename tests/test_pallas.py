"""Pallas kernel parity tests (interpreter mode on CPU; the same checks ran
bit-exact on the real chip — see BASELINE.md notes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rgbd360_tpu.ops import pallas_kernels as K
from rgbd360_tpu.ops import pyramid as P


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(0, 1, (320, 1920)).astype(np.float32))


def test_fused_pyr_down_parity(img):
    a = np.asarray(P._sep_filter5(img)[::2, ::2])
    b = np.asarray(K.fused_pyr_down(img))
    # interior exact; border rows differ by edge-vs-circular padding only
    np.testing.assert_allclose(a[2:-2], b[2:-2], atol=2e-7)


def test_fused_gradients_parity(img):
    gx0, gy0 = P.gradient_xy(img)
    gx1, gy1 = K.fused_gradients(img)
    np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))
    np.testing.assert_array_equal(np.asarray(gy0), np.asarray(gy1))


def test_fused_gradients_small_blocks(rng):
    im = jnp.asarray(rng.uniform(0, 1, (32, 256)).astype(np.float32))
    gx0, gy0 = P.gradient_xy(im)
    gx1, gy1 = K.fused_gradients(im, block_rows=16)
    np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))


def test_dispatch_gate_defaults_off(monkeypatch):
    monkeypatch.delenv("RGBD360_USE_PALLAS", raising=False)
    assert not K.use_pallas()
    monkeypatch.setenv("RGBD360_USE_PALLAS", "1")
    # on CPU _on_tpu() is False, so still off — the gate composes both
    assert K.use_pallas() == K._on_tpu()


def test_build_frame_pyramid_batch_matches_vmap(rng):
    """The batched builder (Pallas level-0 gradients via row-stacking) must
    equal the vmapped per-frame builder.  On CPU the kernel runs in
    interpreter mode, exercising the same code path."""
    import os

    import jax

    from rgbd360_tpu.config import DenseRegConfig
    from rgbd360_tpu.registration import dense as D

    os.environ.pop("RGBD360_USE_PALLAS", None)
    cfg = DenseRegConfig(pyramid_levels=3)
    b, h, w = 3, 32, 256
    grays = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    depths = jnp.asarray((2 + rng.uniform(0, 2, (b, h, w))).astype(np.float32))
    seam = jnp.asarray(rng.uniform(size=(h, w)) > 0.05)
    seam_levels = D.seam_masks_per_level(seam, cfg.pyramid_levels)

    ref = jax.vmap(
        lambda g, d: D.build_frame_pyramid(g, d, cfg, seam_levels,
                                           allow_pallas=False)
    )(grays, depths)

    # force the pallas path even on CPU (interpret mode)
    import rgbd360_tpu.ops.pallas_kernels as K

    orig = K.use_pallas
    K.use_pallas = lambda: True
    try:
        got = D.build_frame_pyramid_batch(grays, depths, cfg, seam_levels)
    finally:
        K.use_pallas = orig

    for field in ("gray", "depth", "gray_gx", "gray_gy", "depth_gx", "depth_gy"):
        for lvl, (a, c) in enumerate(zip(getattr(got, field), getattr(ref, field))):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=1e-6,
                err_msg=f"{field} level {lvl}",
            )


def test_fused_level_down_bit_parity():
    """Round-5 pyramid fusion: the channel-stacked level transition and the
    stacked gradient pass must be BIT-identical to the split forms they
    replace (same per-channel contraction order on the MXU)."""
    rng = np.random.default_rng(11)
    g = jnp.asarray(rng.uniform(0, 1, (320, 1920)).astype(np.float32))
    d = jnp.asarray(
        np.where(
            rng.uniform(0, 1, (320, 1920)) > 0.2,
            rng.uniform(0.5, 8, (320, 1920)),
            0.0,
        ).astype(np.float32)
    )
    g2a = P.pyr_down(g)
    d2a = P.pyr_down_depth(d, 0.3, 20.0)
    g2b, d2b = P.fused_level_down(g, d, 0.3, 20.0)
    np.testing.assert_array_equal(np.asarray(g2a), np.asarray(g2b))
    np.testing.assert_array_equal(np.asarray(d2a), np.asarray(d2b))
    gx, gy = P.gradient_xy(g, allow_pallas=False)
    hx, hy = P.gradient_xy(d, allow_pallas=False)
    sx, sy = P.gradient_xy_multi(jnp.stack([g, d]))
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(sx[0]))
    np.testing.assert_array_equal(np.asarray(hx), np.asarray(sx[1]))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(sy[0]))
    np.testing.assert_array_equal(np.asarray(hy), np.asarray(sy[1]))
