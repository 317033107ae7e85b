"""Scaling-efficiency evidence for the sharded tracker front-end
(BASELINE: ">= 0.8 scaling efficiency at >= 2 hosts").

Real multi-chip hardware is not reachable from this machine (one v5e
chip via a tunnel), so the evidence has two legs:

1. **Measured — virtual-mesh overhead trend.** The column-sharded
   tracker runs on 1/2/4/8 VIRTUAL CPU devices
   (``--xla_force_host_platform_device_count``). All virtual devices
   share the same host cores, so ideal sharding keeps wall time ~flat
   (same total work, differently partitioned); the measured inflation
   t(N)/t(1) upper-bounds the sharding overhead volume (replicated
   lifecycle stages + collective data movement, which on real chips
   rides ICI instead of memcpy).

2. **Analytic — ICI/DCN roofline model.** Per-frame communication
   volumes from ``tracker_comm_report`` (exact, from the program
   structure) against published v5e link bandwidth, combined with the
   MEASURED single-chip per-frame compute times (BENCH_slam_r05 /
   MICRO_r05), give predicted efficiency at 2..16 chips and the
   2-host DCN-boundary case.

Run:  python evaluation/scaling_eval.py [--skip-measured]
Prints JSON lines; SCALING.md narrates the committed results.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# virtual CPU mesh BEFORE jax import
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

H, W, FRAMES = 480, 640, 24


# --- 1. measured virtual-mesh trend ----------------------------------------

def measured_trend():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from vpp_tpu.algorithms.video_extruder import (VideoExtruderConfig,
                                                   video_extruder_init,
                                                   video_extruder_update)
    from vpp_tpu.core.image import from_array
    from vpp_tpu.parallel.sharded_tracker import (
        sharded_video_extruder_update)

    cfg = VideoExtruderConfig(capacity=1024, detect_k=512, nscales=3,
                              winsize=9, keypoint_spacing=10,
                              detector_period=2, detector_th=10)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (H + FRAMES + 8,
                                W + FRAMES + 8)).astype(np.float32)
    p = np.pad(base, 1, mode="edge")
    sm = sum(p[r:r + base.shape[0], c:c + base.shape[1]]
             for r in range(3) for c in range(3)) / 9.0
    frames = [jnp.asarray(sm[t:t + H, t:t + W]) for t in range(FRAMES)]

    out = []

    # single-device (unsharded) reference
    b = max(3, cfg.winsize)
    st = video_extruder_init(cfg)
    upd = jax.jit(lambda s, f1, f2: video_extruder_update(
        s, from_array(f1, border=b, border_mode="mirror"),
        from_array(f2, border=b, border_mode="mirror"), cfg))
    st = jax.block_until_ready(upd(st, frames[0], frames[1]))
    t0 = time.perf_counter()
    for t in range(1, FRAMES):
        st = upd(st, frames[t - 1], frames[t])
    jax.block_until_ready(st)
    t_ref = (time.perf_counter() - t0) / (FRAMES - 1) * 1000
    out.append({"mesh": "unsharded", "ms_per_frame": round(t_ref, 2)})

    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
        st = video_extruder_init(cfg)
        st = jax.block_until_ready(sharded_video_extruder_update(
            mesh, st, frames[0], frames[1], cfg))
        t0 = time.perf_counter()
        for t in range(1, FRAMES):
            st = sharded_video_extruder_update(mesh, st, frames[t - 1],
                                               frames[t], cfg)
        jax.block_until_ready(st)
        ms = (time.perf_counter() - t0) / (FRAMES - 1) * 1000
        out.append({
            "mesh": f"{n}-device virtual", "ms_per_frame": round(ms, 2),
            "inflation_vs_unsharded": round(ms / t_ref, 2),
            "n_live": int(np.asarray(st.keypoints.alive).sum()),
        })
    return out


# --- 2. analytic ICI/DCN model ---------------------------------------------

# v5e public specs: 4 ICI links/chip, 1600 Gbps aggregate -> ~50 GB/s per
# link per direction; a 1-D ring halo exchange uses 2 links concurrently.
# Conservative usable fractions below. DCN per host assumed 200 Gbps
# (25 GB/s) shared by that host's boundary shard.
ICI_GBPS = 45.0e9          # usable per link per direction (conservative)
DCN_GBPS = 12.5e9          # usable host-to-host per direction
COLLECTIVE_LAT_S = 5e-6    # per-collective launch latency
N_COLLECTIVES = 5          # halo x2 frames counts as 2 + 3 psum/allgather

# measured single-chip per-frame compute (BENCH_slam_r05.json matched
# runs: slam_run minus keyframe share -> tracker ms/f; keyframe work is
# landmark-sharded separately). "4k" is a bandwidth-proportional
# EXTRAPOLATION from 1080p (4x pixels; flow/pyramid/FAST are
# HBM-bandwidth-bound), labeled as such in the output.
MEASURED = {
    "vga_640x480": dict(t_comp_ms=1.09, h=480, w=640, halo=80,
                        capacity=1024, spacing=10,
                        t_keyframe_ms=5.4, kf_period=4),
    "1080p_1920x1080": dict(t_comp_ms=5.50, h=1080, w=1920, halo=80,
                            capacity=2048, spacing=12,
                            t_keyframe_ms=10.0, kf_period=4),
    "4k_3840x2160_extrapolated": dict(
        t_comp_ms=22.0, h=2160, w=3840, halo=80, capacity=4096,
        spacing=16, t_keyframe_ms=14.0, kf_period=4),
}
# Keyframe-work decomposition (measured at VGA, in-program deltas,
# round 5): BA assembly/backsub ~3.4 ms (landmark rows shard over the
# mesh; only the (6R)^2 pose solve ~0.1 ms is replicated), archive
# vote-PnP ~3 ms (archive rows + detections shard; the two 6x6 GN
# solves are replicated), triangulation/obs writes ~2 ms (slot-
# parallel, shards). Replicated residue: small solves + pose-graph
# refresh + control flow, ~0.1 of the total — budgeted at 0.12 below.
KF_SHARDED_FRACTION = 0.88


def model_efficiency(geom: str, n: int, hosts: int = 1) -> dict:
    from vpp_tpu.parallel.mesh import tracker_comm_report
    g = MEASURED[geom]
    rep = tracker_comm_report(n, g["h"], g["w"], halo=g["halo"],
                              capacity=g["capacity"], spacing=g["spacing"])
    # per-frame comm time on the slowest shard: halo rides ICI except at
    # host boundaries (DCN); psum/allgather volumes are tiny but pay
    # latency
    halo_dir_bytes = rep["halo_ppermute_bytes"] / 2.0
    link = DCN_GBPS if hosts > 1 else ICI_GBPS
    t_halo = halo_dir_bytes / link
    t_small = (rep["flow_psum_bytes"] + rep["cull_psum_bytes"]
               + rep["detect_allgather_bytes"]) / ICI_GBPS
    t_comm = t_halo + t_small + N_COLLECTIVES * COLLECTIVE_LAT_S
    # per-frame amortised keyframe work: sharded fraction scales /N,
    # replicated fraction does not (Amdahl term)
    t_kf = g["t_keyframe_ms"] * 1e-3 / g["kf_period"]
    t_kf_n = (t_kf * KF_SHARDED_FRACTION / n
              + t_kf * (1 - KF_SHARDED_FRACTION))
    t_track = g["t_comp_ms"] * 1e-3
    t_1 = t_track + t_kf
    t_n = t_track / n + t_comm + t_kf_n
    eff = t_1 / (n * t_n)
    return {
        "geom": geom, "n_chips": n, "hosts": hosts,
        "t_frame_1chip_ms": round(t_1 * 1e3, 3),
        "t_frame_per_chip_ms": round(t_n * 1e3, 3),
        "t_comm_ms": round(t_comm * 1e3, 4),
        "predicted_fps": round(1.0 / t_n, 1),
        "efficiency": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-measured", action="store_true")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    out = {"measured_virtual_mesh": [], "model": []}
    if not args.skip_measured:
        for rec in measured_trend():
            print(json.dumps(rec))
            out["measured_virtual_mesh"].append(rec)
    for geom in MEASURED:
        for n, hosts in ((2, 1), (4, 1), (8, 1), (16, 2)):
            rec = model_efficiency(geom, n, hosts)
            print(json.dumps(rec))
            out["model"].append(rec)
    # the DATA-PARALLEL axis (independent streams per chip/host, the
    # production serving layout; parallel/ tracker batches): no
    # inter-chip collectives at all — efficiency is bounded by host
    # video ingest, not ICI. Stated, not modelled: 1.0 by construction.
    dp = {"axis": "dp (streams)", "efficiency": 1.0,
          "note": "independent per-chip tracker/SLAM streams exchange "
                  "nothing; scaling >= 0.8 at any N trivially — the "
                  "spatial 'sp' rows above are the HARD (strong-"
                  "scaling, single-stream latency) case"}
    print(json.dumps(dp))
    out["model"].append(dp)
    if args.save:
        json.dump(out, open(args.save, "w"), indent=1)


if __name__ == "__main__":
    main()
