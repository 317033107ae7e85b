"""Native (C++) runtime components, loaded via ctypes.

``cpu_baseline``: the reference-equivalent CPU tracker used by bench.py to
measure "reference CPU frames/s" on the local machine (the reference repo
publishes no numbers — BASELINE.md §1 — so the denominator is measured).
Built on demand with the same flags the reference uses
(-O3 -march=native -fopenmp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def build_native(name: str = "cpu_baseline",
                 out: str = "libvppcpu.so") -> Optional[Path]:
    """Build (or reuse) the native library. Staleness is decided by a
    CONTENT hash of the source stored next to the lib — mtimes lie
    (checkouts, stashes and copies all reset them; an mtime check once
    served a stale .so missing a freshly added symbol)."""
    import hashlib
    src = _NATIVE_DIR / f"{name}.cpp"
    lib = _NATIVE_DIR / out
    tag = _NATIVE_DIR / f"{out}.srchash"
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    if (lib.exists() and tag.exists()
            and tag.read_text().strip() == digest):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", str(lib), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    tag.write_text(digest)
    return lib


def load_cpu_baseline() -> Optional[ctypes.CDLL]:
    lib = build_native()
    if lib is None:
        return None
    dll = ctypes.CDLL(str(lib))
    dll.tracker_fps.restype = ctypes.c_double
    dll.tracker_fps.argtypes = [ctypes.c_int] * 4
    dll.tracker_fps_stats.restype = ctypes.c_double
    dll.tracker_fps_stats.argtypes = [ctypes.c_int] * 4 + [
        ctypes.POINTER(ctypes.c_int)]
    dll.pyrlk_ms.restype = ctypes.c_double
    dll.pyrlk_ms.argtypes = [ctypes.c_int] * 5
    d = ctypes.c_double
    pd = ctypes.POINTER(d)
    pf = ctypes.POINTER(ctypes.c_float)
    dll.slam_fps.restype = d
    dll.slam_fps.argtypes = [pf] + [ctypes.c_int] * 3 + [d] * 4 + [pd] + \
        [ctypes.c_int] * 7 + [d] * 3 + [pd, pd]
    return dll


def cpu_tracker_fps(width: int, height: int, frames: int,
                    seed: int = 0) -> Optional[float]:
    dll = load_cpu_baseline()
    if dll is None:
        return None
    return float(dll.tracker_fps(width, height, frames, seed))


def cpu_tracker_fps_stats(width: int, height: int, frames: int,
                          seed: int = 0):
    """(fps, n_live_keypoints) of the native tracker — the denominator
    with its own workload size, so bench.py can show both sides' live-kp
    counts are comparable."""
    dll = load_cpu_baseline()
    if dll is None:
        return None, None
    n = ctypes.c_int(0)
    fps = dll.tracker_fps_stats(width, height, frames, seed,
                                ctypes.byref(n))
    return float(fps), int(n.value)


def cpu_pyrlk_ms(width: int = 640, height: int = 480, nkp: int = 1024,
                 iters: int = 10, seed: int = 0) -> Optional[float]:
    """ms per pyramidal-LK pass (pyramids + Scharr gradients + LK of
    ``nkp`` keypoints) of the native scalar engine — the denominator for
    the pyrlk micro-benchmark (reference methodology:
    benchmarks/pyrlk_opencv_comparison.cc)."""
    dll = load_cpu_baseline()
    if dll is None:
        return None
    return float(dll.pyrlk_ms(width, height, nkp, iters, seed))


def cpu_slam_fps(frames, intrinsics, boot, *, kf_period: int, ring: int,
                 ba_iters: int = 3, pnp_iters: int = 6, spacing: int = 8,
                 detector_th: int = 8, detector_period: int = 1,
                 min_parallax: float = 2.0, max_reproj: float = 2.0,
                 prune_reproj: float = 1.5, gt=None):
    """Scalar C++ tracking+BA engine (native/cpu_baseline.cpp slam_fps) —
    the measured denominator for BASELINE configs 4-5.

    ``frames``: (T, H, W) float array; ``boot``: (2, 4, 4) poses of the
    engine's FIRST TWO keyframes (they land on frames kf_period and
    2*kf_period); ``gt``: optional (T, 4, 4) ground truth for the ATE
    diagnostic. Returns (fps, stats dict).
    """
    import numpy as np
    dll = load_cpu_baseline()
    if dll is None:
        return None, None
    fr = np.ascontiguousarray(frames, np.float32)
    t, h, w = fr.shape
    bt = np.ascontiguousarray(boot, np.float64)
    out = np.zeros(5, np.float64)
    pd = ctypes.POINTER(ctypes.c_double)
    # keep a reference to the gt buffer for the duration of the call
    gt_arr = (np.ascontiguousarray(gt, np.float64)
              if gt is not None else None)
    gt_ptr = (gt_arr.ctypes.data_as(pd) if gt_arr is not None
              else ctypes.cast(None, pd))
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    fps = dll.slam_fps(
        fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, h, w,
        fx, fy, cx, cy, bt.ctypes.data_as(pd), kf_period, ring, ba_iters,
        pnp_iters, spacing, detector_th, detector_period,
        float(min_parallax), float(max_reproj), float(prune_reproj),
        gt_ptr, out.ctypes.data_as(pd))
    stats = {"ate": float(out[0]), "n_live": int(out[1]),
             "n_landmarks": int(out[2]), "n_keyframes": int(out[3]),
             "mean_reproj": float(out[4])}
    return float(fps), stats
