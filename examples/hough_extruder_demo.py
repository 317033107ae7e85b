"""Hough line tracker demo — the hough_extruder.

Parity with /root/reference/examples/hough_extruder_main.cc +
hough_extruder_example.hh: frame pump → dense one-to-one Hough transform →
track ↔ peak association (hough_tracker_update) → line rendering per
frame, with per-frame ms printed.

Usage:
    python examples/hough_extruder_demo.py [clip.npy] [--frames N]
        [--out lines.npy]
With no clip a synthetic scene of two moving lines is tracked; ``--out``
writes the per-frame (T, M, 2) (theta, rho) track states.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def synthetic_line_clip(w, h, nframes):
    """Two bright lines: one translating, one rotating slowly."""
    frames = np.zeros((nframes, h, w), np.float32)
    for t in range(nframes):
        row = 30 + t                                    # translating
        frames[t, row:row + 2, :] = 200.0
        th = 0.3 + 0.01 * t                             # rotating
        for c in range(w):
            r = int(h / 2 + (c - w / 2) * np.tan(th))
            if 0 <= r < h:
                frames[t, r, c] = 220.0
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clip", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--m-lines", type=int, default=8)
    ap.add_argument("--out", default=None)

    ap.add_argument("--render", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vpp_tpu.algorithms.hough_tracker import (HoughTrackerConfig,
                                                  hough_tracker_init,
                                                  hough_tracker_update)
    from vpp_tpu.core.image import from_array
    from vpp_tpu.io import open_clip

    if args.clip is None:
        frames = synthetic_line_clip(128, 96, args.frames)
    else:
        frames = np.stack(list(open_clip(args.clip,
                                         max_frames=args.frames)))

    cfg = HoughTrackerConfig(m_first_lines=args.m_lines,
                             acc_threshold=10.0)
    state = hough_tracker_init(cfg)
    step = jax.jit(lambda st, f: hough_tracker_update(
        st, from_array(f, border=3, border_mode="mirror"), cfg))

    outs = []
    for t, f in enumerate(frames):
        fj = jnp.asarray(f)
        t0 = time.perf_counter()
        state, peaks = jax.block_until_ready(step(state, fj))
        dt = (time.perf_counter() - t0) * 1e3
        alive = np.asarray(state.age) > 0
        th = np.asarray(state.theta)[alive]
        rho = np.asarray(state.rho)[alive]
        outs.append(np.stack([np.asarray(state.theta),
                              np.asarray(state.rho)], -1))
        print(f"frame {t:3d}: {alive.sum():2d} tracks, {dt:7.2f} ms  "
              + "  ".join(f"(θ_idx={a:.1f}, ρ_idx={b:.0f})"
                          for a, b in zip(th[:4], rho[:4])))

    if args.out:
        np.save(args.out, np.stack(outs))
        print("wrote", args.out)

    if args.render:
        # image-space rendering (paint.hh / draw_trajectories_hough_V1
        # capability): trail paint buffer + per-track coloured segments
        from vpp_tpu.draw.hough_paint import (draw_line_tracks,
                                              paint_hough_video)
        h, w = frames[0].shape
        acc_shape = (cfg.t_theta, int(np.ceil(np.hypot(h, w))))
        paint = jnp.zeros((h, w, 4), jnp.float32)
        paint = paint_hough_video(paint, state, acc_shape)
        rgb = np.repeat(np.asarray(frames[-1])[..., None], 3, -1)
        overlay = draw_line_tracks(jnp.asarray(rgb, jnp.uint8), state,
                                   acc_shape)
        np.save(args.render, {"paint": np.asarray(paint),
                              "overlay": np.asarray(overlay)})
        print("wrote", args.render)


if __name__ == "__main__":
    main()
