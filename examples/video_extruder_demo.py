"""Flagship demo: the video-extruder point tracker on a clip.

Parity with /root/reference/examples/video_extruder.cc:44-73: frame pump →
grayscale → tracker update → trajectory rendering → per-frame ms printout.
Here the whole clip runs as one compiled ``lax.scan`` program
(``video_extruder_run``); pass ``--stream`` for the frame-at-a-time loop
(webcam-style) instead.

Usage:
    python examples/video_extruder_demo.py [clip.npy] [--frames N]
        [--stream] [--out traj.npy]
With no clip argument a synthetic moving texture is tracked.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clip", nargs="?", default=None,
                    help=".npy/.npz clip or video file (needs cv2)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--stream", action="store_true",
                    help="frame-at-a-time loop instead of one lax.scan")
    ap.add_argument("--out", default=None,
                    help="write (T, K, 2) tracked positions to this .npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vpp_tpu.algorithms.video_extruder import (
        VideoExtruderConfig, video_extruder_init, video_extruder_run,
        video_extruder_update)
    from vpp_tpu.core.image import Image2d, from_array
    from vpp_tpu.io import open_clip, synthetic_clip

    if args.clip is None:
        frames = synthetic_clip(640, 480, args.frames + 1)
    else:
        frames = np.stack(list(open_clip(args.clip,
                                         max_frames=args.frames + 1)))

    cfg = VideoExtruderConfig(capacity=4096, detect_k=2048, nscales=3,
                              winsize=9, keypoint_spacing=10,
                              detector_period=5, detector_th=10)
    b = max(3, cfg.winsize)

    if args.stream:
        step = jax.jit(lambda st, f1, f2: video_extruder_update(
            st, Image2d(data=f1, border=b), Image2d(data=f2, border=b),
            cfg))
        pad = jax.jit(lambda f: from_array(f, border=b,
                                           border_mode="mirror").data)
        st = video_extruder_init(cfg)
        prev = pad(jnp.asarray(frames[0]))
        hist = []
        for t in range(1, len(frames)):
            t0 = time.perf_counter()
            cur = pad(jnp.asarray(frames[t]))
            st = jax.block_until_ready(step(st, prev, cur))
            prev = cur
            hist.append(np.asarray(st.keypoints.position))
            n = int(np.asarray(st.keypoints.alive).sum())
            print(f"frame {t}: {1e3 * (time.perf_counter() - t0):.2f} ms, "
                  f"{n} keypoints")
        pos_hist = np.stack(hist)
    else:
        run = jax.jit(lambda f: video_extruder_run(f, cfg))
        clip = jnp.asarray(frames)
        state, (pos_hist, alive_hist) = jax.block_until_ready(run(clip))
        t0 = time.perf_counter()
        state, (pos_hist, alive_hist) = jax.block_until_ready(run(clip))
        dt = time.perf_counter() - t0
        n = int(np.asarray(state.keypoints.alive).sum())
        print(f"{len(frames)} frames in {dt * 1e3:.1f} ms "
              f"({len(frames) / dt:.1f} fps), {n} live keypoints")
        pos_hist = np.asarray(pos_hist)

    if args.out:
        np.save(args.out, pos_hist)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
