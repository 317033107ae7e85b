"""Tests: Plücker lines, pose from line correspondences, vanishing
points — synthetic scenes with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.slam.se3 import se3_exp, se3_apply
from vpp_tpu.slam.ba import project
from vpp_tpu.slam.sfm import (image_line_normals, plucker_from_points,
                              plucker_point_distance, plucker_transform,
                              pose_from_line_correspondences,
                              vanishing_points)

INTR = jnp.array([300.0, 300.0, 160.0, 120.0])


def test_plucker_roundtrip():
    rng = np.random.RandomState(0)
    p1 = jnp.asarray(rng.randn(8, 3), jnp.float32)
    p2 = jnp.asarray(rng.randn(8, 3), jnp.float32)
    L = plucker_from_points(p1, p2)
    # points on the line have zero distance
    mid = 0.3 * p1 + 0.7 * p2
    assert float(plucker_point_distance(L, mid).max()) < 1e-4
    # transform consistency: transform line == line of transformed points
    T = se3_exp(jnp.asarray(rng.randn(6) * 0.3, jnp.float32))
    Lt = plucker_transform(L, T)
    p1t = se3_apply(T, p1)
    p2t = se3_apply(T, p2)
    Lt2 = plucker_from_points(p1t, p2t)
    # allow sign flip of (d, m) jointly
    s = jnp.sign(jnp.sum(Lt[:, :3] * Lt2[:, :3], axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(Lt2 * s), np.asarray(Lt),
                               atol=1e-4)


def _line_scene(m=8, seed=0):
    rng = np.random.RandomState(seed)
    # 3-D segments in front of the camera
    p1 = rng.rand(m, 3) * [2, 1.5, 1] + [-1, -0.75, 3]
    d = rng.randn(m, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p2 = p1 + d * 0.8
    return jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32)


def test_pose_from_lines_recovers_pose():
    p1, p2 = _line_scene()
    xi_gt = jnp.asarray([0.1, -0.15, 0.05, 0.2, -0.1, 0.15], jnp.float32)
    T_gt = se3_exp(xi_gt)
    uv1 = project(T_gt, p1, INTR)
    uv2 = project(T_gt, p2, INTR)
    R, t, cost = pose_from_line_correspondences(p1, p2, uv1, uv2, INTR)
    assert float(cost) < 1e-6
    np.testing.assert_allclose(np.asarray(R), np.asarray(T_gt[:3, :3]),
                               atol=2e-2)
    # translation along the lines' interpretation planes is what the
    # constraint pins down; compare directions of projected endpoints
    uv1b = project(jnp.concatenate(
        [jnp.concatenate([R, t[:, None]], axis=1),
         jnp.array([[0., 0., 0., 1.]])], axis=0), p1, INTR)
    assert float(jnp.abs(uv1b - uv1).max()) < 2.0


def test_image_line_normals_orthogonal():
    p1, p2 = _line_scene()
    T = se3_exp(jnp.zeros(6))
    uv1 = project(T, p1, INTR)
    uv2 = project(T, p2, INTR)
    n = image_line_normals(uv1, uv2, INTR)
    # camera-frame endpoints must be orthogonal to their plane normal
    c1 = p1 / jnp.linalg.norm(p1, axis=-1, keepdims=True)
    dots = jnp.abs(jnp.sum(c1 * n, axis=-1))
    assert float(dots.max()) < 1e-4


def test_vanishing_points_parallel_lines():
    # lines through a common vanishing point in the image: family of
    # (θ, ρ) passing through pixel (x0, y0)
    x0, y0 = 260.0, 160.0
    thetas = jnp.asarray(np.linspace(0.3, 1.2, 10), jnp.float32)
    rhos = x0 * jnp.cos(thetas) + y0 * jnp.sin(thetas)
    valid = jnp.ones((10,), bool)
    dirs, votes = vanishing_points(thetas, rhos, valid, INTR, top=1)
    d = np.asarray(dirs[0])
    # expected direction: back-projection of (x0, y0)
    exp = np.array([(x0 - 160.0) / 300.0, (y0 - 120.0) / 300.0, 1.0])
    exp /= np.linalg.norm(exp)
    assert abs(float(np.dot(d, exp))) > 0.99, (d, exp)
