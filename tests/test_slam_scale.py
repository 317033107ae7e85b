"""Scalable landmark-major BA: correctness vs the flat solver, production
scale (N >= 10k landmarks, M >= 128 poses) on one device, and sharded ==
single-device equivalence with landmarks distributed over the mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.slam import (BAProblem, ba_solve, project, se3_exp)
from vpp_tpu.slam.ba import BATracks, ba_solve_tracks, tracks_from_flat


def _synthetic_tracks(m, n, k, seed=0, noise=0.0):
    """Each landmark observed by k consecutive poses (a track)."""
    rng = np.random.RandomState(seed)
    intr = jnp.array([300.0, 300.0, 160.0, 120.0])
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        xi = np.zeros(6, np.float32)
        xi[3] = -0.1
        xi[:3] = rng.randn(3) * 0.01
        poses.append(np.asarray(
            se3_exp(jnp.asarray(xi)) @ jnp.asarray(poses[-1])))
    poses_gt = jnp.asarray(np.stack(poses))
    # each landmark sits in front of the cameras that observe it (the
    # rig translates ~0.1/frame in +x; off-track landmarks would project
    # hundreds of px off-axis and make the scene ill-conditioned)
    start = rng.randint(0, m - k + 1, size=n)
    lms = rng.rand(n, 3) * [2.0, 1.5, 1.0] + [-1.0, -0.75, 3.0]
    lms[:, 0] += 0.1 * start
    lms_gt = jnp.asarray(lms, jnp.float32)
    obs_pose = jnp.asarray(start[:, None] + np.arange(k)[None], jnp.int32)
    uv = project(poses_gt[obs_pose], lms_gt[:, None], intr)
    uv = uv + jnp.asarray(rng.randn(n, k, 2) * noise, jnp.float32)
    fixed = jnp.zeros((m,), bool).at[0].set(True).at[1].set(True)
    return poses_gt, lms_gt, BATracks(
        poses=poses_gt, landmarks=lms_gt, obs_pose=obs_pose, obs_uv=uv,
        obs_valid=jnp.ones((n, k), bool), intrinsics=intr,
        fixed_poses=fixed)


def test_tracks_matches_flat_solver():
    """ba_solve_tracks on the converted problem == flat ba_solve."""
    rng = np.random.RandomState(1)
    m, n = 4, 48
    intr = jnp.array([300.0, 300.0, 160.0, 120.0])
    # real baseline between cameras: identical poses would leave landmark
    # depth unobservable (singular Hll, float-noise-amplifying inverses)
    steps = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        xi = np.zeros(6, np.float32)
        xi[3] = -0.3
        steps.append(np.asarray(
            se3_exp(jnp.asarray(xi)) @ jnp.asarray(steps[-1])))
    poses_gt = jnp.asarray(np.stack(steps))
    lms_gt = jnp.asarray(rng.rand(n, 3) + [-0.5, -0.5, 3.0], jnp.float32)
    op = jnp.repeat(jnp.arange(m), n).astype(jnp.int32)
    ol = jnp.tile(jnp.arange(n), m).astype(jnp.int32)
    uv = project(poses_gt[op], lms_gt[ol], intr)
    flat = BAProblem(poses=poses_gt,
                     landmarks=lms_gt + jnp.asarray(
                         rng.randn(n, 3) * 0.03, jnp.float32),
                     obs_pose=op, obs_lm=ol, obs_uv=uv,
                     obs_valid=jnp.ones((m * n,), bool), intrinsics=intr,
                     fixed_poses=jnp.zeros((m,), bool).at[0].set(True)
                     .at[1].set(True))
    tracks = tracks_from_flat(flat)
    s1, c1 = ba_solve(flat, iters=5)
    s2, c2 = ba_solve_tracks(tracks, iters=5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.landmarks),
                               np.asarray(s2.landmarks), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1.poses),
                               np.asarray(s2.poses), atol=1e-3)


def test_tracks_recovers_at_scale():
    """N=10k landmarks, M=128 poses on one device — the flat solver's
    dense (N, M, 6, 3) coupling tensors (~94 MB each, twice, plus the
    matching scatter temporaries) grow linearly in N*M and die around
    N~1M; the track layout assembles K x K block pairs instead and
    runs this in O(N K^2) memory."""
    rng = np.random.RandomState(2)
    m, n, k = 128, 10240, 4
    poses_gt, lms_gt, prob = _synthetic_tracks(m, n, k)
    noisy = prob._replace(
        landmarks=prob.landmarks + jnp.asarray(
            rng.randn(n, 3) * 0.03, jnp.float32))
    solved, costs = jax.jit(
        lambda p: ba_solve_tracks(p, iters=5, lam0=1e-4))(noisy)
    costs = np.asarray(costs)
    assert costs[-1] < costs[0] * 1e-4, costs
    # median: landmarks with near-zero triangulation angle keep a residual
    # offset along the depth direction at zero reprojection cost
    err = np.abs(np.asarray(solved.landmarks) - np.asarray(lms_gt))
    assert np.median(err) < 1e-2, np.median(err)  # f32 uv quantisation ~2e-3 px -> ~4e-3 depth


def test_tracks_sharded_matches_single_device():
    """Landmark (map-block) sharding over an 8-device mesh: pose-sized
    psum aggregates only; results match the single-device solve."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("lm",))
    rng = np.random.RandomState(3)
    m, n, k = 16, 1024, 4
    poses_gt, lms_gt, prob = _synthetic_tracks(m, n, k, seed=4)
    noisy = prob._replace(
        landmarks=prob.landmarks + jnp.asarray(
            rng.randn(n, 3) * 0.03, jnp.float32))
    s1, c1 = ba_solve_tracks(noisy, iters=4)
    s2, c2 = ba_solve_tracks(noisy, iters=4, mesh=mesh, axis="lm")
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.landmarks),
                               np.asarray(s2.landmarks), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1.poses),
                               np.asarray(s2.poses), atol=1e-3)


def test_tracks_masked_slots_ignored():
    _, _, prob = _synthetic_tracks(8, 64, 3, seed=5)
    bad_uv = prob.obs_uv.at[:, 1].add(500.0)
    valid = prob.obs_valid.at[:, 1].set(False)
    prob2 = prob._replace(obs_uv=bad_uv, obs_valid=valid)
    solved, costs = ba_solve_tracks(prob2, iters=3)
    assert float(costs[-1]) < 1e-3


def test_ring_layout_matches_generic():
    """ba_solve_tracks(ring_layout=True) — the scatter-free sliding
    window fast path — must equal the generic scatter-add assembly on a
    ring problem (obs_pose[n, j] == j)."""
    rng = np.random.RandomState(4)
    m = 6
    n = 64
    intr = jnp.array([300.0, 300.0, 160.0, 120.0])
    steps = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        xi = np.zeros(6, np.float32)
        xi[3] = -0.2
        steps.append(np.asarray(
            se3_exp(jnp.asarray(xi)) @ jnp.asarray(steps[-1])))
    poses_gt = jnp.asarray(np.stack(steps))
    lms_gt = jnp.asarray(rng.rand(n, 3) * 2 + [-1.0, -1.0, 3.0],
                         jnp.float32)
    obs_pose = jnp.broadcast_to(jnp.arange(m)[None], (n, m)).astype(
        jnp.int32)
    uv = project(poses_gt[obs_pose], lms_gt[:, None], intr)
    prob = BATracks(
        poses=poses_gt,
        landmarks=lms_gt + jnp.asarray(rng.randn(n, 3) * 0.02,
                                       jnp.float32),
        obs_pose=obs_pose, obs_uv=uv,
        obs_valid=jnp.asarray(rng.rand(n, m) > 0.3),
        intrinsics=intr,
        fixed_poses=jnp.zeros((m,), bool).at[0].set(True).at[1].set(True))
    s1, c1 = ba_solve_tracks(prob, iters=4, lam0=1e-4)
    s2, c2 = ba_solve_tracks(prob, iters=4, lam0=1e-4, ring_layout=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.poses), np.asarray(s2.poses),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.landmarks),
                               np.asarray(s2.landmarks), atol=1e-5)


def test_chol_fast_path_matches_lu_on_window():
    """linalg="chol" (closed-form landmark inverses + Cholesky pose
    solve — the pipeline's sliding-window fast path, SlamConfig.ba_linalg)
    must track the pivoted-LU reference solver on a well-conditioned
    window problem: same converged cost and poses to f32 tolerance."""
    rng = np.random.RandomState(7)
    m, n = 6, 256
    intr = jnp.array([640.0, 640.0, 320.0, 240.0])
    steps = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        xi = np.zeros(6, np.float32)
        xi[3] = -0.15
        xi[1] = 0.01
        steps.append(np.asarray(
            se3_exp(jnp.asarray(xi)) @ jnp.asarray(steps[-1])))
    poses_gt = jnp.asarray(np.stack(steps))
    lms_gt = jnp.asarray(rng.rand(n, 3) * np.array([4, 2, 2])
                         + [-2.0, -1.0, 5.0], jnp.float32)
    obs_pose = jnp.broadcast_to(jnp.arange(m)[None], (n, m)).astype(
        jnp.int32)
    uv = project(poses_gt[obs_pose], lms_gt[:, None], intr)
    uv = uv + jnp.asarray(rng.randn(n, m, 2) * 0.2, jnp.float32)
    prob = BATracks(
        poses=poses_gt,
        landmarks=lms_gt + jnp.asarray(rng.randn(n, 3) * 0.03,
                                       jnp.float32),
        obs_pose=obs_pose, obs_uv=uv,
        obs_valid=jnp.asarray(rng.rand(n, m) > 0.3),
        intrinsics=intr,
        fixed_poses=jnp.zeros((m,), bool).at[0].set(True).at[1].set(True))
    s1, c1 = ba_solve_tracks(prob, iters=4, lam0=1e-4, ring_layout=True)
    s2, c2 = ba_solve_tracks(prob, iters=4, lam0=1e-4, ring_layout=True,
                             linalg="chol")
    # the two paths take slightly different LM accept/reject
    # trajectories (f32 solve rounding at the accept boundary); they must
    # land on the same optimum, not the same iterate sequence
    np.testing.assert_allclose(np.asarray(c1)[-1], np.asarray(c2)[-1],
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(s1.poses), np.asarray(s2.poses),
                               atol=2e-3)
    # landmark depth along a low-parallax ray is weakly constrained —
    # the two optima can differ there at near-zero cost difference
    np.testing.assert_allclose(np.asarray(s1.landmarks),
                               np.asarray(s2.landmarks), atol=5e-2)
