"""Paint demo — trajectories painted persistently onto a fading canvas.

Parity with /root/reference/examples/video_extruder_paint.cc: per frame,
the paint buffer's alpha decays (*0.97), then every live trajectory
paints its last segment with a direction-coded HSV colour whose alpha
scales with speed. The canvas accumulates strokes; old paint fades.

TPU-native: the canvas is an (H, W, 4) RGBA array; the decay is one
multiply, and all K strokes render in one vectorised scatter (no
per-trajectory loop). The whole per-frame step (track + paint) jits.

Usage:
    python examples/video_extruder_paint.py [clip.npy] [--frames N]
        [--out canvas.npy]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clip", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--out", default=None,
                    help="write final (H, W, 4) RGBA canvas to .npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vpp_tpu.algorithms.video_extruder import (VideoExtruderConfig,
                                                   video_extruder_init,
                                                   video_extruder_update)
    from vpp_tpu.core.image import Image2d, from_array
    from vpp_tpu.io import open_clip, synthetic_clip
    from vpp_tpu.ops.color import hsv_to_rgb

    if args.clip is None:
        frames = synthetic_clip(320, 240, args.frames + 1)
    else:
        frames = np.stack(list(open_clip(args.clip,
                                         max_frames=args.frames + 1)))
    h, w = frames.shape[1:3]

    cfg = VideoExtruderConfig(capacity=1024, detect_k=512, nscales=3,
                              winsize=9, keypoint_spacing=10,
                              detector_period=5, detector_th=10)
    b = max(3, cfg.winsize)

    def paint(canvas, state):
        """Decay + stroke the newest trajectory segment of every live
        keypoint (video_extruder_paint.cc ``paint``)."""
        canvas = canvas.at[..., 3].multiply(0.97)        # fade old paint
        traj = state.traj
        alive = state.keypoints.alive & (state.traj_len > 1)
        p1 = traj[:, 0]                                  # newest
        p2 = traj[:, 1]
        back = jnp.minimum(state.traj_len - 1, 10)
        p3 = traj[jnp.arange(traj.shape[0]), back]
        speed = jnp.linalg.norm(p3 - p1, axis=1)
        hue = (jnp.pi + jnp.arctan2(p3[:, 0] - p1[:, 0],
                                    p3[:, 1] - p1[:, 1])) * 180 / jnp.pi
        ones = jnp.ones_like(hue)
        rgb = hsv_to_rgb(hue, ones, ones).astype(jnp.float32)
        alpha = jnp.minimum(1.0, speed / 10.0) * alive

        # sample along the newest segment, one scatter for all strokes
        t = jnp.linspace(0.0, 1.0, 8)
        pts = jnp.round(p1[:, None] * (1 - t[None, :, None])
                        + p2[:, None] * t[None, :, None]).astype(jnp.int32)
        pts = pts.reshape(-1, 2)
        a = jnp.repeat(alpha, 8)
        col = jnp.repeat(rgb, 8, axis=0)
        inb = ((pts[:, 0] >= 0) & (pts[:, 0] < h)
               & (pts[:, 1] >= 0) & (pts[:, 1] < w) & (a > 0))
        r = jnp.where(inb, pts[:, 0], 0)
        c = jnp.where(inb, pts[:, 1], 0)
        rgba = jnp.concatenate([col, 255 * jnp.ones_like(a)[:, None]], -1)
        aw = jnp.where(inb, a, 0.0)[:, None]
        old = canvas[r, c]
        return canvas.at[r, c].set(old * (1 - aw) + rgba * aw)

    @jax.jit
    def step(state, canvas, f1, f2):
        state = video_extruder_update(state,
                                      Image2d(data=f1, border=b),
                                      Image2d(data=f2, border=b), cfg)
        return state, paint(canvas, state)

    pad = jax.jit(lambda f: from_array(f, border=b,
                                       border_mode="mirror").data)
    state = video_extruder_init(cfg)
    canvas = jnp.zeros((h, w, 4), jnp.float32)
    prev = pad(jnp.asarray(frames[0]))
    for t_i in range(1, len(frames)):
        cur = pad(jnp.asarray(frames[t_i]))
        t0 = time.perf_counter()
        state, canvas = jax.block_until_ready(
            step(state, canvas, prev, cur))
        prev = cur
        dt = (time.perf_counter() - t0) * 1e3
        painted = float((np.asarray(canvas[..., 3]) > 8).mean() * 100)
        print(f"frame {t_i:3d}: {int(np.asarray(state.keypoints.alive).sum()):4d} kps, "
              f"canvas {painted:5.1f}% painted, {dt:7.2f} ms")

    if args.out:
        np.save(args.out, np.asarray(canvas))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
