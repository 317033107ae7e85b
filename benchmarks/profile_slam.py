"""Decompose slam_run's on-chip per-frame cost at the bench_slam VGA
config: which stage (tracker / detection cadence / PnP / triangulation /
BA / pose-graph) owns the 2 ms per frame?

Method: same clip + config as bench_slam, one lax.scan dispatch per
variant, each variant disabling one stage (keyframe_period never fires,
ba_iters=0, detector_period=5, ...). Differences between variants give
per-stage cost without per-dispatch tunnel overhead.

Run: python benchmarks/profile_slam.py [--geom vga_640x480]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from bench_slam import GEOMS, FRAMES, KF_PERIOD, RING, BA_ITERS, \
    PNP_ITERS, MIN_PARALLAX, MAX_REPROJ, PRUNE_REPROJ, make_scene
from vpp_tpu.algorithms.video_extruder import VideoExtruderConfig
from vpp_tpu.slam.pipeline import SlamConfig, slam_run


def build_cfg(g, **over):
    tr = dict(capacity=g["capacity"], detect_k=g["detect_k"], nscales=3,
              winsize=9, keypoint_spacing=g["spacing"], detector_period=1,
              detector_th=g["th"])
    sl = dict(intrinsics=g["intr"], keyframe_period=KF_PERIOD, ring=RING,
              ba_iters=BA_ITERS, pnp_iters=PNP_ITERS,
              min_parallax=MIN_PARALLAX, max_reproj=MAX_REPROJ,
              prune_reproj=PRUNE_REPROJ, history=64,
              lc_min_gap=60, enable_recovery=False)
    for k, v in over.items():
        (tr if k in tr else sl)[k] = v
    return SlamConfig(tracker=VideoExtruderConfig(**tr), **sl)


def main():
    geom = sys.argv[sys.argv.index("--geom") + 1] \
        if "--geom" in sys.argv else "vga_640x480"
    g = GEOMS[geom]
    frames, poses = make_scene(g, seed=1)
    dev = jax.device_put(jnp.asarray(frames))
    float(jnp.sum(dev[0, 0]))
    boot = jnp.asarray(poses[[0, KF_PERIOD]])

    def timed(name, cfg, reps=3):
        run = jax.jit(lambda f, b: slam_run(f, cfg, bootstrap_poses=b))
        st = jax.block_until_ready(run(dev, boot))
        np.asarray(st.lm_valid)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(dev, boot))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[reps // 2] / FRAMES * 1e3
        print(f"{name:44s} {ms:8.4f} ms/frame "
              f"({FRAMES / sorted(ts)[reps // 2]:7.1f} fps)", flush=True)
        return ms

    full = timed("full matched (bench_slam config)", build_cfg(g))
    timed("no keyframes (tracker only, det_period=1)",
          build_cfg(g, keyframe_period=10 ** 6))
    timed("no keyframes, detector_period=5",
          build_cfg(g, keyframe_period=10 ** 6, detector_period=5))
    timed("keyframes, ba_iters=0 (PnP+triang only)", build_cfg(g, ba_iters=0))
    timed("keyframes, pnp_iters=1", build_cfg(g, pnp_iters=1))
    timed("keyframes, history=8 (pose-graph small)", build_cfg(g, history=8))
    timed("full + recovery (archive PnP)",
          build_cfg(g, enable_recovery=True))
    print(f"total frames {FRAMES}, kf every {KF_PERIOD}")


if __name__ == "__main__":
    main()
