"""Tests: SE(3) maps, bundle adjustment (single + sharded), pose graph,
checkpointing — synthetic scenes with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.slam import (BAProblem, PoseGraph, ba_solve, pose_graph_solve,
                          project, restore_state, save_state, se3_exp,
                          se3_inverse, se3_log)
from vpp_tpu.slam.pose_graph import pose_graph_residuals


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    xi = jnp.asarray(rng.randn(16, 6) * 0.5, jnp.float32)
    T = se3_exp(xi)
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)
    # inverse really inverts
    I = np.asarray(T @ se3_inverse(T))
    np.testing.assert_allclose(I, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def _synthetic_ba(m=4, n=60, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    intr = jnp.array([300.0, 300.0, 160.0, 120.0])
    # poses looking down +z, spread in x
    poses_gt = []
    for i in range(m):
        xi = np.zeros(6)
        xi[3] = -0.3 * i          # translate camera
        xi[:3] = rng.randn(3) * 0.02
        poses_gt.append(np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))))
    poses_gt = jnp.asarray(np.stack(poses_gt), jnp.float32)
    lms_gt = jnp.asarray(
        rng.rand(n, 3) * [2.0, 1.5, 1.0] + [-1.0, -0.75, 3.0], jnp.float32)
    # every pose observes every landmark
    op = jnp.repeat(jnp.arange(m), n).astype(jnp.int32)
    ol = jnp.tile(jnp.arange(n), m).astype(jnp.int32)
    uv = project(poses_gt[op], lms_gt[ol], intr)
    uv = uv + jnp.asarray(rng.randn(m * n, 2) * noise, jnp.float32)
    # fix two poses: one pins the frame, the second pins monocular scale
    fixed = jnp.zeros((m,), bool).at[0].set(True).at[1].set(True)
    return poses_gt, lms_gt, BAProblem(
        poses=poses_gt, landmarks=lms_gt, obs_pose=op, obs_lm=ol,
        obs_uv=uv, obs_valid=jnp.ones((m * n,), bool), intrinsics=intr,
        fixed_poses=fixed)


def test_ba_recovers_from_perturbation():
    rng = np.random.RandomState(1)
    poses_gt, lms_gt, prob = _synthetic_ba()
    # perturb everything except the two gauge poses
    dpose = jnp.asarray(np.concatenate(
        [np.zeros((2, 6)), rng.randn(prob.poses.shape[0] - 2, 6) * 0.02]),
        jnp.float32)
    poses0 = jax.vmap(lambda d, T: se3_exp(d) @ T)(dpose, prob.poses)
    lms0 = prob.landmarks + jnp.asarray(
        rng.randn(*prob.landmarks.shape) * 0.05, jnp.float32)
    noisy = prob._replace(poses=poses0, landmarks=lms0)

    solved, costs = jax.jit(lambda p: ba_solve(p, iters=12))(noisy)
    costs = np.asarray(costs)
    assert costs[-1] < costs[0] * 1e-4, costs
    np.testing.assert_allclose(np.asarray(solved.landmarks),
                               np.asarray(lms_gt), atol=2e-2)
    np.testing.assert_allclose(np.asarray(solved.poses),
                               np.asarray(poses_gt), atol=2e-2)


def test_ba_masked_observations_ignored():
    _, _, prob = _synthetic_ba()
    # corrupt half the measurements but mark them invalid
    bad_uv = prob.obs_uv.at[::2].add(500.0)
    valid = jnp.ones_like(prob.obs_valid).at[::2].set(False)
    prob2 = prob._replace(obs_uv=bad_uv, obs_valid=valid)
    solved, costs = ba_solve(prob2, iters=3)
    assert float(costs[-1]) < 1e-3   # invalid residuals contribute nothing


def test_ba_sharded_matches_single_device():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("obs",))
    rng = np.random.RandomState(2)
    poses_gt, lms_gt, prob = _synthetic_ba(m=4, n=64)
    lms0 = prob.landmarks + jnp.asarray(
        rng.randn(*prob.landmarks.shape) * 0.05, jnp.float32)
    noisy = prob._replace(landmarks=lms0)
    s1, c1 = ba_solve(noisy, iters=4)
    s2, c2 = ba_solve(noisy, iters=4, mesh=mesh, axis="obs")
    # rtol alone is meaningless once costs hit float32 noise (~1e-8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.landmarks),
                               np.asarray(s2.landmarks), atol=1e-3)


def _ring_graph(m=8, seed=0, drift=0.05):
    rng = np.random.RandomState(seed)
    # ground truth poses around a line
    xs = [np.zeros(6)]
    for i in range(1, m):
        xi = np.zeros(6)
        xi[3] = 0.5
        xs.append(xi)
    Ts = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        Ts.append(np.asarray(
            Ts[-1] @ np.asarray(se3_exp(jnp.asarray(xs[i], jnp.float32)))))
    Ts = jnp.asarray(np.stack(Ts), jnp.float32)
    # odometry edges + one loop closure 0 -> m-1
    ei = list(range(m - 1)) + [0]
    ej = list(range(1, m)) + [m - 1]
    Z = jnp.asarray(np.stack([
        np.asarray(se3_inverse(Ts[i]) @ Ts[j])
        for i, j in zip(ei, ej)]), jnp.float32)
    return Ts, PoseGraph(
        poses=Ts, edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32), edge_T=Z,
        edge_w=jnp.ones((len(ei),), jnp.float32),
        edge_valid=jnp.ones((len(ei),), bool),
        fixed=jnp.zeros((m,), bool).at[0].set(True))


def test_pose_graph_corrects_drift():
    rng = np.random.RandomState(3)
    Ts_gt, g = _ring_graph()
    m = g.poses.shape[0]
    d = jnp.asarray(np.concatenate(
        [np.zeros((1, 6)), rng.randn(m - 1, 6) * 0.05]), jnp.float32)
    noisy_poses = jax.vmap(lambda dd, T: se3_exp(dd) @ T)(d, g.poses)
    g_noisy = g._replace(poses=noisy_poses)
    r0 = np.abs(np.asarray(pose_graph_residuals(g_noisy))).max()
    solved, costs = jax.jit(lambda x: pose_graph_solve(x, iters=10))(g_noisy)
    r1 = np.abs(np.asarray(pose_graph_residuals(solved))).max()
    assert r1 < r0 * 1e-2, (r0, r1)
    np.testing.assert_allclose(np.asarray(solved.poses),
                               np.asarray(Ts_gt), atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    _, _, prob = _synthetic_ba(m=2, n=8)
    path = str(tmp_path / "ckpt")
    save_state(path, prob)
    restored = restore_state(path, jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x), prob))
    np.testing.assert_allclose(np.asarray(restored.obs_uv),
                               np.asarray(prob.obs_uv))
    np.testing.assert_allclose(np.asarray(restored.poses),
                               np.asarray(prob.poses))


def test_analytic_jacobians_match_ad_oracle():
    """proj_jacobians (the analytic keyframe hot path) must equal the
    jacfwd-through-se3_exp formulation it replaced, and triangulate_ls
    must agree with the SVD DLT on finite-depth points."""
    from vpp_tpu.slam.ba import (BATracks, _track_jacobians,
                                 _track_jacobians_ad)
    from vpp_tpu.algorithms.geometry import (_triangulate_one,
                                             triangulate_ls)
    rng = np.random.RandomState(7)
    n, k, m = 24, 4, 5
    poses = jax.vmap(se3_exp)(jnp.asarray(rng.randn(m, 6) * 0.1,
                                          jnp.float32))
    p = BATracks(
        poses=poses,
        landmarks=jnp.asarray(rng.rand(n, 3) * 4 + [-2, -2, 4],
                              jnp.float32),
        obs_pose=jnp.asarray(rng.randint(0, m, (n, k)), jnp.int32),
        obs_uv=jnp.asarray(rng.rand(n, k, 2) * 300, jnp.float32),
        obs_valid=jnp.asarray(rng.rand(n, k) > 0.3),
        intrinsics=jnp.asarray([300.0, 300.0, 160.0, 120.0]),
        fixed_poses=jnp.zeros((m,), bool))
    r_a, Jp_a, Jl_a = _track_jacobians(p)
    r_o, Jp_o, Jl_o = _track_jacobians_ad(p)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_o),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Jp_a), np.asarray(Jp_o),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Jl_a), np.asarray(Jl_o),
                               rtol=1e-3, atol=1e-2)

    P1 = jnp.asarray(rng.rand(3, 4), jnp.float32)
    P2 = jnp.asarray(rng.rand(3, 4), jnp.float32)
    X_gt = jnp.asarray(rng.rand(16, 3) * 2 + [0, 0, 4], jnp.float32)
    Xh = jnp.concatenate([X_gt, jnp.ones((16, 1))], 1)
    x1 = (Xh @ P1.T)
    x1 = x1[:, :2] / x1[:, 2:3]
    x2 = (Xh @ P2.T)
    x2 = x2[:, :2] / x2[:, 2:3]
    X_svd = jax.vmap(lambda a, b: _triangulate_one(P1, P2, a, b))(x1, x2)
    X_ls = triangulate_ls(P1, P2, x1, x2)
    np.testing.assert_allclose(np.asarray(X_ls), np.asarray(X_svd),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(X_ls), np.asarray(X_gt),
                               rtol=1e-3, atol=1e-3)
