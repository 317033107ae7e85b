"""End-to-end tracking+BA benchmark on the TPU chip vs the native CPU
engine (BASELINE §2 configs 4-5: "≥2× reference CPU frames/s per chip
end-to-end (tracking+BA)").

Both sides consume the SAME rendered frames (synthetic 3-D blob cloud
under a lateral dolly, vpp_tpu/utils/synth.py) and run the SAME pipeline
shape at matched iteration counts: per-frame tracker (pyramids -> FAST ->
semi-dense flow -> lifecycle), every ``kf_period`` frames a keyframe
(GN PnP -> 2-view DLT triangulation -> LM sliding-window BA with landmark
Schur elimination -> reprojection pruning).

* TPU: ``slam_run`` (vpp_tpu/slam/pipeline.py) — the WHOLE clip under one
  ``lax.scan``, keyframe work behind ``lax.cond``. Two configurations per
  geometry: the workload-MATCHED tracking+BA run (archive recovery
  compiled out — the CPU engine has no such machinery), which carries
  ``vs_baseline``, and the FULL engine (archive PnP + closure/pose-graph
  machinery live every keyframe) reported as ``tpu_full_*``.
* CPU: ``slam_fps`` (native/cpu_baseline.cpp) — scalar C++/OpenMP with
  analytic Jacobians, built -O3 -march=native like the reference.

The reference itself STUBS this capability (structure_from_motion.hh:55-56
declares triangulation()/bundle_adjustement() with empty bodies), so the
denominator is our own reference-style CPU implementation; its ATE is
reported next to the TPU engine's to show both really solve the problem.

Run:  python benchmarks/bench_slam.py [--save benchmarks/BENCH_slam_r05.json]
Prints one JSON line per geometry + a summary line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

KF_PERIOD, RING, BA_ITERS, PNP_ITERS = 4, 6, 3, 6
MIN_PARALLAX, MAX_REPROJ = 2.0, 2.0
# post-BA obs prune: 2.5 px, not the 1.5 default — at VGA+ focal lengths
# the f32 window's residual floor sits near 1 px, and a 1.5 px prune
# cuts borderline-good observations faster than 3 LM iterations can pull
# them in (measured: ATE 0.88 -> 0.038 over 240 frames). Same constant
# on both engines.
PRUNE_REPROJ = 2.5
FRAMES = 240
WARM = 1                      # warm-up clips (compile + axon cache dodge)

GEOMS = {
    # Small-frame regime: the whole working set is CPU-cache-resident and
    # per-frame TPU dispatch floors dominate — the CPU wins here (reported
    # for transparency; the BASELINE per-chip target is about production
    # geometry, below).
    "qvga_192x144": dict(
        h=144, w=192, intr=(192.0, 192.0, 96.0, 72.0),
        n_pts=900, sigma=(1.0, 1.8), capacity=384, detect_k=192,
        spacing=8, th=8, timed_clips=3),
    "vga_640x480": dict(
        h=480, w=640, intr=(640.0, 640.0, 320.0, 240.0),
        n_pts=2000, sigma=(1.2, 2.2), capacity=1024, detect_k=512,
        spacing=10, th=10, timed_clips=2),
    "1080p_1920x1080": dict(
        h=1080, w=1920, intr=(1920.0, 1920.0, 960.0, 540.0),
        n_pts=3000, sigma=(1.4, 2.6), capacity=2048, detect_k=1024,
        spacing=12, th=10, timed_clips=1, extent=(18.0, 9.0, 3.5)),
}


def make_scene(g, seed):
    """Rendered clip + gt poses: lateral dolly over a wide cloud so
    landmarks continuously retire and respawn (archive churn)."""
    from vpp_tpu.utils.synth import camera_path, make_cloud, render_frames
    pts = make_cloud(g["n_pts"], seed=seed,
                     extent=g.get("extent", (16.0, 5.0, 3.5)),
                     center=(3.2, 0.0, 5.0))
    poses = camera_path(FRAMES, step=(0.02, 0.0, 0.0))
    frames = render_frames(pts, poses, g["intr"], (g["h"], g["w"]),
                           seed=seed, sigma=g["sigma"])
    return frames, poses


def tpu_side(g, clips, recovery: bool, prefix: str = "tpu"):
    """Time slam_run over the pre-transferred clips.

    ``recovery=False`` compiles out the archive PnP machinery the CPU
    engine does not have — the workload-MATCHED tracking+BA
    configuration; ``recovery=True`` is the full engine (loop-closure
    acceptance gated by lc_min_gap=60: the dolly never genuinely
    revisits, so closures against still-visible archive entries would
    just re-measure the current drift)."""
    import jax
    import jax.numpy as jnp
    from vpp_tpu.algorithms.video_extruder import VideoExtruderConfig
    from vpp_tpu.slam.pipeline import (SlamConfig, ate_rmse,
                                       keyframe_trajectory, slam_run)

    cfg = SlamConfig(
        intrinsics=g["intr"], keyframe_period=KF_PERIOD, ring=RING,
        ba_iters=BA_ITERS, pnp_iters=PNP_ITERS,
        min_parallax=MIN_PARALLAX, max_reproj=MAX_REPROJ,
        prune_reproj=PRUNE_REPROJ, history=64,
        lc_min_gap=60, enable_recovery=recovery,
        tracker=VideoExtruderConfig(
            capacity=g["capacity"], detect_k=g["detect_k"], nscales=3,
            winsize=9, keypoint_spacing=g["spacing"], detector_period=1,
            detector_th=g["th"]))

    run = jax.jit(lambda frames, boot: slam_run(frames, cfg,
                                                bootstrap_poses=boot))
    # all clips onto the device BEFORE timing (the 100+ MB H2D transfer
    # through the axon tunnel must not land inside the timed region);
    # the sum() forces materialisation
    devs = [jax.device_put(jnp.asarray(frames)) for frames, _ in clips]
    for d in devs:
        float(jnp.sum(d[0, 0]))
    # warm-up on its own clip (the axon runtime may serve repeated
    # identical (program, inputs) executions from cache)
    poses0 = clips[0][1]
    st = jax.block_until_ready(run(devs[0], jnp.asarray(poses0[[0,
                                                              KF_PERIOD]])))
    np.asarray(st.lm_valid)            # hard sync through the tunnel
    times, ates, lives, lms, kfs = [], [], [], [], []
    for dev, (frames, poses) in zip(devs[1:], clips[1:]):
        boot = jnp.asarray(poses[[0, KF_PERIOD]])
        t0 = time.perf_counter()
        st = jax.block_until_ready(run(dev, boot))
        times.append(time.perf_counter() - t0)
        est, fids = keyframe_trajectory(st)
        gt = jnp.asarray(poses[np.asarray(fids)])
        ates.append(float(ate_rmse(est, gt)))
        lives.append(int(np.asarray(st.tracker.keypoints.alive).sum()))
        lms.append(int(np.asarray(st.lm_valid).sum()))
        kfs.append(int(st.n_keyframes))
    fps = sorted(FRAMES / t for t in times)
    return {
        f"{prefix}_fps": round(fps[len(fps) // 2], 2),
        f"{prefix}_fps_spread": [round(fps[0], 2), round(fps[-1], 2)],
        f"{prefix}_ate": round(float(np.mean(ates)), 4),
        f"{prefix}_nlive": int(np.mean(lives)),
        f"{prefix}_nlm": int(np.mean(lms)),
        f"{prefix}_nkf": int(np.mean(kfs)),
    }


def cpu_side(g, clips, runs_per_clip: int = 2):
    from vpp_tpu.utils.native import cpu_slam_fps
    fpss, ates, lives, lms = [], [], [], []
    for frames, poses in clips[1:]:
        # C++ keyframes land on frames kf_period, 2*kf_period, ...
        boot = poses[[KF_PERIOD, 2 * KF_PERIOD]]
        for _ in range(runs_per_clip):
            fps, stats = cpu_slam_fps(
                frames, g["intr"], boot, kf_period=KF_PERIOD, ring=RING,
                ba_iters=BA_ITERS, pnp_iters=PNP_ITERS,
                spacing=g["spacing"], detector_th=g["th"],
                detector_period=1, min_parallax=MIN_PARALLAX,
                max_reproj=MAX_REPROJ, prune_reproj=PRUNE_REPROJ,
                gt=poses)
            if fps is None:
                return None
            fpss.append(fps)
            ates.append(stats["ate"])
            lives.append(stats["n_live"])
            lms.append(stats["n_landmarks"])
    fpss.sort()
    return {
        "cpu_fps": round(fpss[len(fpss) // 2], 2),
        "cpu_fps_spread": [round(fpss[0], 2), round(fpss[-1], 2)],
        "cpu_ate": round(float(np.mean(ates)), 4),
        "cpu_nlive": int(np.mean(lives)),
        "cpu_nlm": int(np.mean(lms)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", default=None)
    ap.add_argument("--geom", default=None, choices=list(GEOMS))
    args = ap.parse_args()
    out = []
    for name, g in GEOMS.items():
        if args.geom and name != args.geom:
            continue
        clips = [make_scene(g, seed=s)
                 for s in range(WARM + g["timed_clips"])]
        rec = {"geom": name, "frames": FRAMES, "kf_period": KF_PERIOD,
               "ring": RING, "ba_iters": BA_ITERS}
        # matched tracking+BA (the BASELINE configs 4-5 comparison) ...
        rec.update(tpu_side(g, clips, recovery=False))
        # ... and the full engine (archive recovery + closure machinery
        # the CPU engine does not have) for transparency
        rec.update(tpu_side(g, clips, recovery=True, prefix="tpu_full"))
        cpu = cpu_side(g, clips)
        if cpu:
            rec.update(cpu)
            rec["vs_baseline"] = round(rec["tpu_fps"] / rec["cpu_fps"], 3)
            rec["vs_baseline_full_engine"] = round(
                rec["tpu_full_fps"] / rec["cpu_fps"], 3)
        print(json.dumps(rec))
        out.append(rec)
    if len(out) > 1:
        summary = {
            "summary": True,
            "metric": "slam tracking+BA fps vs native CPU",
            "vs_baseline_min": min(r["vs_baseline"] for r in out),
            "vs_baseline": round(
                float(np.mean([r["vs_baseline"] for r in out])), 3),
        }
        print(json.dumps(summary))
        out.append(summary)
    if args.save:
        json.dump(out, open(args.save, "w"), indent=1)


if __name__ == "__main__":
    main()
