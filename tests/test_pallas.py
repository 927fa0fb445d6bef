"""Pallas kernel parity tests (interpreter mode on CPU; the same checks ran
bit-exact on the real chip — see BASELINE.md notes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rgbd360_tpu.ops import pallas_kernels as K
from rgbd360_tpu.ops import pyramid as P


@pytest.fixture(scope="module")
def img(rng):
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
