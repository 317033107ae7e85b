"""End-to-end SLAM demo: tracker -> keyframes -> triangulation -> window
BA -> pose graph, on a synthetic scene with known ground truth.

The reference only stubs this capability
(structure_from_motion.hh:55-56); this drives the TPU-native engine
(vpp_tpu/slam/pipeline.py) over a rendered 3-D blob cloud, prints the
estimated keyframe trajectory against ground truth, and reports ATE.

Run:  python examples/slam_demo.py [--frames N] [--blackout]
      --blackout kills 3 frames mid-run to demonstrate archive recovery.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--blackout", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vpp_tpu.algorithms.video_extruder import VideoExtruderConfig
    from vpp_tpu.slam.pipeline import (SlamConfig, ate_rmse,
                                       keyframe_trajectory, slam_run)
    from vpp_tpu.utils.synth import camera_path, make_cloud, render_frames

    h, w = 144, 192
    intr = (192.0, 192.0, 96.0, 72.0)
    cfg = SlamConfig(
        intrinsics=intr, keyframe_period=4, ring=8, ba_iters=3,
        min_parallax=2.0, max_reproj=2.0, history=32,
        tracker=VideoExtruderConfig(capacity=512, detect_k=256, nscales=3,
                                    winsize=9, keypoint_spacing=10,
                                    detector_period=1))

    pts = make_cloud(300, seed=0, extent=(7.0, 5.0, 3.5),
                     center=(0.8, 0.0, 5.0))
    poses_gt = camera_path(args.frames, step=(0.05, 0.0, 0.0))
    frames = render_frames(pts, poses_gt, intr, (h, w), seed=0,
                           sigma=(1.0, 1.8)).copy()
    if args.blackout:
        k = args.frames // 2
        frames[k:k + 3] = 0.0
        print(f"blackout: frames {k}..{k + 2} are dark")

    boot = jnp.asarray(poses_gt[[0, cfg.keyframe_period]])
    run = jax.jit(lambda f: slam_run(f, cfg, bootstrap_poses=boot))
    t0 = time.perf_counter()
    state = jax.block_until_ready(run(jnp.asarray(frames)))
    dt = time.perf_counter() - t0

    est, fids = keyframe_trajectory(state)
    fids = np.asarray(fids)
    gt = jnp.asarray(poses_gt[fids])
    ate = float(ate_rmse(est, gt))

    print(f"{args.frames} frames in {dt:.2f}s "
          f"({args.frames / dt:.1f} fps incl. compile on first call)")
    print(f"keyframes: {len(fids)}  landmarks: "
          f"{int(np.asarray(state.lm_valid).sum())}  "
          f"archive: {int((np.asarray(state.arch_frame) >= 0).sum())}")
    print(f"{'kf':>3} {'frame':>5} {'est x':>8} {'gt x':>8} {'|err|':>7}")
    for k in range(len(fids)):
        T = np.asarray(est[k])
        c_est = -T[:3, :3].T @ T[:3, 3]
        Tg = poses_gt[fids[k]]
        c_gt = -Tg[:3, :3].T @ Tg[:3, 3]
        err = np.linalg.norm(c_est - c_gt)
        print(f"{k:3d} {fids[k]:5d} {c_est[0]:8.3f} {c_gt[0]:8.3f} "
              f"{err:7.3f}")
    print(f"ATE (camera-centre RMSE): {ate:.4f}")


if __name__ == "__main__":
    main()
