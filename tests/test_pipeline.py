"""End-to-end SLAM pipeline on a synthetic 3-D scene: the tracker feeds
keyframes, landmarks triangulate, the sliding window bundle-adjusts, and
the recovered keyframe trajectory must match ground truth (ATE bound).
BASELINE configs 4-5; the reference stubs this entire capability
(structure_from_motion.hh:55-56)."""

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.algorithms.video_extruder import VideoExtruderConfig
from vpp_tpu.core.image import from_array
from vpp_tpu.slam.pipeline import (SlamConfig, ate_rmse,
                                   keyframe_trajectory, pnp_gn,
                                   relocalize, slam_run)
from vpp_tpu.slam import project, se3_exp
from vpp_tpu.utils.synth import camera_path, make_cloud, render_frames

H, W = 120, 160
INTR = (160.0, 160.0, 80.0, 60.0)


def _scene(n_frames=25, n_points=220, step=(0.06, 0.0, 0.0), seed=0):
    pts = make_cloud(n_points, seed=seed, extent=(6.0, 4.0, 3.0),
                     center=(0.8, 0.0, 5.0))
    poses = camera_path(n_frames, step=step)
    frames = render_frames(pts, poses, INTR, (H, W), seed=seed)
    return pts, poses, frames


def _cfg():
    return SlamConfig(
        intrinsics=INTR, keyframe_period=4, ring=6, ba_iters=3,
        min_parallax=2.0, max_reproj=2.0, history=16,
        tracker=VideoExtruderConfig(capacity=256, detect_k=128, nscales=3,
                                    winsize=9, keypoint_spacing=8,
                                    detector_period=1, detector_th=8))


def test_pnp_gn_recovers_pose():
    rng = np.random.RandomState(0)
    intr = jnp.asarray(INTR)
    X = jnp.asarray(rng.rand(64, 3) * [2, 2, 1] + [-1, -1, 4], jnp.float32)
    xi = jnp.asarray([0.02, -0.03, 0.01, 0.1, -0.05, 0.02], jnp.float32)
    T_gt = se3_exp(xi)
    uv = project(T_gt[None], X, intr)
    T, err = pnp_gn(jnp.eye(4), X, uv, jnp.ones((64,), bool), intr,
                    iters=8)
    assert float(err) < 1e-3
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)


def test_slam_recovers_trajectory():
    pts, poses_gt, frames = _scene()
    cfg = _cfg()
    boot = jnp.asarray(poses_gt[[0, cfg.keyframe_period]])
    state = jax.jit(lambda f: slam_run(f, cfg, bootstrap_poses=boot))(
        jnp.asarray(frames))
    est, fids = keyframe_trajectory(state)
    fids = np.asarray(fids)
    n_kf = est.shape[0]
    assert n_kf >= 5, n_kf
    assert int(np.asarray(state.lm_valid).sum()) > 30
    gt = jnp.asarray(poses_gt[fids[:n_kf]])
    ate = float(ate_rmse(est, gt))
    # trajectory length ~ 24*0.06 = 1.44: demand < 4.5% drift (monocular
    # sliding-window VO without loop closure on integer-quantised obs)
    assert ate < 0.065, f"ATE {ate}"


def test_slam_relocalizes():
    pts, poses_gt, frames = _scene()
    cfg = _cfg()
    boot = jnp.asarray(poses_gt[[0, cfg.keyframe_period]])
    state = jax.jit(lambda f: slam_run(f, cfg, bootstrap_poses=boot))(
        jnp.asarray(frames))
    # "wake up" at the last keyframe (briefly-lost scenario: the map
    # carries its latest appearance) and recover the pose cold, from
    # detection + descriptor matching + PnP alone. NOTE the scene is
    # adversarial for appearance matching (all blobs are near-identical
    # Gaussians), so this exercises the mechanism in the exact-appearance
    # regime; cross-view invariant descriptors are future work.
    b = max(3, cfg.tracker.winsize)
    k = 24
    frame = from_array(jnp.asarray(frames[k]), border=b,
                       border_mode="mirror")
    T, err, n = jax.jit(lambda s, f: relocalize(s, f, cfg))(state, frame)
    # err is the UNTRIMMED mean |residual| over the consensus pairs — a
    # handful of aliased pairs (identical-blob scene) dominate it; the
    # pose gate below is the meaningful acceptance criterion
    assert float(err) < 2.5, float(err)
    assert int(n) >= cfg.lc_min_inliers, int(n)
    c_est = -np.asarray(T)[:3, :3].T @ np.asarray(T)[:3, 3]
    T_gt = poses_gt[k]
    c_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
    # bounded by the run's own ATE (~0.04) plus PnP noise
    assert np.linalg.norm(c_est - c_gt) < 0.1, (c_est, c_gt)


def test_slam_checkpoint_roundtrip(tmp_path):
    from vpp_tpu.slam import restore_state, save_state
    pts, poses_gt, frames = _scene(n_frames=9)
    cfg = _cfg()
    boot = jnp.asarray(poses_gt[[0, cfg.keyframe_period]])
    state = slam_run(jnp.asarray(frames), cfg, bootstrap_poses=boot)
    path = str(tmp_path / "slam_ckpt")
    save_state(path, state)
    empty = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), state)
    restored = restore_state(path, empty)
    np.testing.assert_allclose(np.asarray(restored.lm_X),
                               np.asarray(state.lm_X))
    assert int(restored.n_keyframes) == int(state.n_keyframes)


def test_subpix_refine_accuracy():
    """The opt-in KLT observation refiner recovers sub-pixel positions
    against stored first-observation templates (isolated check — see
    SlamConfig.subpix_refine for when to enable it in the pipeline)."""
    from vpp_tpu.core.interp import extract_patches
    from vpp_tpu.slam.pipeline import _refine_obs_subpix
    from vpp_tpu.utils.synth import camera_path, make_cloud, render_frames

    pts = make_cloud(60, seed=3, extent=(6.0, 4.0, 3.0),
                     center=(0.8, 0.0, 5.0))
    poses = camera_path(2, step=(0.04, 0.0, 0.0))
    frames = render_frames(pts, poses, INTR, (H, W), seed=3)
    b, P = 9, 7
    f0 = from_array(jnp.asarray(frames[0]), border=b, border_mode="mirror")
    f1 = from_array(jnp.asarray(frames[1]), border=b, border_mode="mirror")
    intr = np.asarray(INTR)

    def proj(T, X):
        pc = (np.c_[X, np.ones(len(X))] @ T.T)[:, :3]
        u = intr[0] * pc[:, 0] / pc[:, 2] + intr[2]
        v = intr[1] * pc[:, 1] / pc[:, 2] + intr[3]
        return np.stack([v, u], 1)

    uv0, uv1 = proj(poses[0], pts), proj(poses[1], pts)
    ok = ((uv0 > 10) & (uv0 < [H - 10, W - 10])).all(1) & (
        (uv1 > 10) & (uv1 < [H - 10, W - 10])).all(1)
    uv0, uv1 = uv0[ok], uv1[ok]
    ctr = jnp.asarray(np.round(uv0).astype(np.int32)) + b
    templ = extract_patches(f0.data, ctr, P).reshape(len(uv0), -1)
    start = jnp.asarray(np.round(uv1).astype(np.float32))
    refined, rok = _refine_obs_subpix(
        f1, start, templ, jnp.ones((len(uv0),), bool), P)
    expected = uv1 + (np.round(uv0) - uv0)   # constant template offset
    err_before = np.abs(np.asarray(start) - expected).mean()
    err_after = np.abs(np.asarray(refined) - expected).mean()
    assert float(np.asarray(rok).mean()) > 0.8
    assert err_after < err_before * 0.7, (err_before, err_after)


def test_slam_run_streams_matches_single():
    """slam_run_streams (the chunked, cond-free serving runner) must
    reproduce slam_run per stream: bit-identical tracker state, and
    back-end poses within fp tolerance (vmap's BATCHED cholesky/solve
    kernels round differently than the unbatched ones, which can flip a
    borderline triangulation gate — decision noise, not drift)."""
    from vpp_tpu.slam.pipeline import slam_run_streams

    cfg = SlamConfig(
        intrinsics=INTR, keyframe_period=4, ring=6, ba_iters=3,
        min_parallax=2.0, max_reproj=2.0, history=16,
        enable_recovery=False,
        tracker=VideoExtruderConfig(capacity=256, detect_k=128, nscales=3,
                                    winsize=9, keypoint_spacing=8,
                                    detector_period=1, detector_th=8))
    clips, boots, gts = [], [], []
    for s in range(2):
        _, poses_gt, frames = _scene(n_frames=24, seed=s)
        clips.append(np.asarray(frames))
        boots.append(np.asarray(poses_gt[[0, 4]]))
        gts.append(poses_gt)
    frames = jnp.asarray(np.stack(clips))
    boot = jnp.asarray(np.stack(boots))
    batched = jax.jit(
        lambda f, b: slam_run_streams(f, cfg, b))(frames, boot)
    for s in range(2):
        single = jax.jit(
            lambda f, b: slam_run(f, cfg, bootstrap_poses=b))(
            frames[s], boot[s])
        # front-end: bit-identical particle state
        np.testing.assert_array_equal(
            np.asarray(single.tracker.keypoints.alive),
            np.asarray(batched.tracker.keypoints.alive[s]))
        np.testing.assert_array_equal(
            np.asarray(single.tracker.keypoints.position),
            np.asarray(batched.tracker.keypoints.position[s]))
        # back-end: same keyframe count, poses to fp-gate tolerance
        n = int(single.n_keyframes)
        assert n == int(batched.n_keyframes[s]) == 6
        np.testing.assert_allclose(
            np.asarray(single.hist_pose[:n]),
            np.asarray(batched.hist_pose[s, :n]), atol=0.05)
        # both land within the single-stream test's ATE bound
        gt = jnp.asarray(gts[s][np.asarray(single.hist_frame[:n])])
        assert float(ate_rmse(batched.hist_pose[s, :n], gt)) < 0.08


def test_slam_run_streams_guards():
    from vpp_tpu.slam.pipeline import slam_run_streams
    cfg = _cfg()                               # enable_recovery=True
    f = jnp.zeros((1, 8, H, W), jnp.float32)
    b = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    try:
        slam_run_streams(f, cfg, b)
        assert False, "expected ValueError (recovery enabled)"
    except ValueError:
        pass
    import dataclasses
    cfg2 = dataclasses.replace(cfg, enable_recovery=False)
    try:
        slam_run_streams(jnp.zeros((1, 7, H, W), jnp.float32), cfg2, b)
        assert False, "expected ValueError (T % period)"
    except ValueError:
        pass
