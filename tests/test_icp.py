"""Projective ICP tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import se3
from rgbd360_tpu.ops.pyramid import build_depth_pyramid
from rgbd360_tpu.registration.icp import (
    GICP,
    ICPAligner,
    POINT_TO_PLANE,
    POINT_TO_POINT,
)


@pytest.fixture(scope="module")
def real_depths(calibration, sample_paths):
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    b = FrameBuilder(calibration)
    ds = []
    for p in sample_paths[:2]:
        f = b.build_from_raw(read_rig_frame(p))
        ds.append(f.sphere_depth)
    return ds


def _pyr(d, levels=4):
    return tuple(build_depth_pyramid(d, levels))


def test_identity(real_depths):
    p = _pyr(real_depths[0])
    pose, hess, err, n = ICPAligner().align(p, p)
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=2e-3)
    assert float(n) > 1e5


@pytest.mark.parametrize("variant", [POINT_TO_PLANE, POINT_TO_POINT, GICP])
def test_recover_perturbation(real_depths, variant):
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from helpers import render_sphere_from

    d0 = real_depths[0]
    true_pose = np.asarray(se3.se3_exp(jnp.array([0.0, 0.08, -0.06, 0.01, -0.02, 0.015])))
    _, d1 = render_sphere_from(jnp.zeros_like(d0), d0, true_pose)
    al = ICPAligner(variant=variant)
    pose, hess, err, n = al.align(_pyr(jnp.asarray(d1)), _pyr(d0))
    # align(new, old) returns T_old<-new which should equal true_pose
    e = np.asarray(se3.se3_log(se3.se3_inverse(pose) @ jnp.asarray(true_pose)))
    tol = 0.05 if variant == POINT_TO_POINT else 0.02
    assert np.linalg.norm(e) < tol, (variant, e)


def test_gicp_matches_point_to_plane_on_real_pair(real_depths):
    """GICP (plane-to-plane, the reference's RegisterPairRGBD360 metric)
    should land within a few cm of point-to-plane on the real sample pair —
    they optimize different weightings of the same geometry."""
    p10, p0 = _pyr(real_depths[1]), _pyr(real_depths[0])
    pose_g, _, err_g, n_g = ICPAligner(variant=GICP).align(p10, p0)
    pose_p, _, _, _ = ICPAligner(variant=POINT_TO_PLANE).align(p10, p0)
    dt = np.linalg.norm(np.asarray(pose_g)[:3, 3] - np.asarray(pose_p)[:3, 3])
    assert dt < 0.06, (np.asarray(pose_g)[:3, 3], np.asarray(pose_p)[:3, 3])
    assert int(n_g) > 1e5


def test_real_pair(real_depths):
    pose, hess, err, n = ICPAligner().align(_pyr(real_depths[1]), _pyr(real_depths[0]))
    t = np.asarray(pose)
    dt = np.linalg.norm(t[:3, 3])
    # dense result: |t| = 0.319; ICP alone should land in the neighborhood
    assert 0.15 < dt < 0.6, t[:3, 3]
    assert float(err) < 0.1  # point-to-plane rms < 10 cm
