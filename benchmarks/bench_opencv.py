"""OpenCV comparison benchmarks — the reference's own methodology.

matt-42/vpp benchmarks itself against OpenCV
(benchmarks/pyrlk_opencv_comparison.cc:60-80 times
cv::calcOpticalFlowPyrLK vs vpp's pyrlk; benchmarks/fast_detector.cc
times cv::FAST vs vpp's fast9). This harness runs the same comparisons
against THIS machine's OpenCV (SIMD-optimised, all cores) and the TPU
implementations, at matched parameters.

Caveats, stated up front:
* cv::calcOpticalFlowPyrLK uses data-dependent early exit per point and
  per-level; the TPU path runs fixed iterations with masking — matched
  niterations/epsilon are passed but OpenCV usually converges early
  (that is its structural advantage and it keeps it).
* cv::FAST returns a dynamic keypoint vector with non-max suppression;
  the TPU fast9 is compared in its full-image score+NMS form.
* OpenCV numbers include no H2D transfers; TPU numbers are device
  compute under a lax.scan (dispatch floor subtracted).

Run on the chip:  python benchmarks/bench_opencv.py
One JSON line per comparison.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

try:
    import cv2
except ImportError:                      # environment-gated
    print(json.dumps({"error": "cv2 not available"}))
    sys.exit(0)

H, W = 480, 640
NKP = 1024
WINSIZE, NSCALES, NITER, EPS = 11, 3, 21, 0.1


def make_pair(seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 255, (H + 8, W + 8)).astype(np.uint8)
    a = cv2.blur(a, (3, 3))
    return a[2:2 + H, 2:2 + W].copy(), a[5:5 + H, 5:5 + W].copy()


def bench_cv(fn, reps=20):
    fn()                                  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        ts.append((time.perf_counter() - t0) / reps)
    return sorted(ts)[1] * 1e3


def main():
    rng = np.random.RandomState(1)
    a_u8, b_u8 = make_pair()
    pts = (rng.rand(NKP, 2).astype(np.float32)
           * [W - 20, H - 20] + 10)       # (x, y) for OpenCV

    # --- pyrLK ------------------------------------------------------------
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, NITER, EPS)

    pts_cv = np.ascontiguousarray(pts.reshape(-1, 1, 2), np.float32)

    def cv_lk():
        cv2.calcOpticalFlowPyrLK(
            a_u8, b_u8, pts_cv, None,
            winSize=(WINSIZE, WINSIZE), maxLevel=NSCALES - 1,
            criteria=crit)

    cv_lk_ms = bench_cv(cv_lk)

    # TPU side (same harness discipline as micro.py)
    import jax
    import jax.numpy as jnp
    from vpp_tpu.core.image import Image2d, from_array
    from vpp_tpu.algorithms import lucas_kanade

    i1 = from_array(jnp.asarray(a_u8.astype(np.float32)), border=9,
                    border_mode="mirror")
    i2d = from_array(jnp.asarray(b_u8.astype(np.float32)), border=9,
                     border_mode="mirror").data
    kp_rc = jnp.asarray(pts[:, ::-1].copy())          # (row, col)

    def timed(stepfn, carry, iters=20):
        def scan_fn(c):
            def stp(cc, i):
                return stepfn(cc * (1.0 + i * 1e-7)), None
            return jax.lax.scan(stp, c,
                                jnp.arange(iters, dtype=jnp.float32))[0]
        jf = jax.jit(scan_fn)
        out = jax.block_until_ready(jf(carry))
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        # dispatch floor: median of 3 tiny dispatches after settling
        # (a single post-warm measurement catches leftover async work
        # and over-estimates, zeroing the subtraction)
        tiny = jnp.float32(1.0)
        jt = jax.jit(lambda c: c * 1.0000001)
        jax.block_until_ready(jt(tiny))
        float(jt(tiny * 1.01))
        fls = []
        for k in (2.0, 3.0, 4.0):
            t0 = time.perf_counter()
            jax.block_until_ready(jt(tiny * k))
            fls.append(time.perf_counter() - t0)
        floor = sorted(fls)[1] * 1e3
        ts = []
        for k in (3, 5, 7):
            t0 = time.perf_counter()
            out = jax.block_until_ready(jf(carry * (1.0 + k * 1e-7)))
            ts.append(time.perf_counter() - t0)
        return max(sorted(ts)[1] * 1e3 - floor, 1e-6) / iters

    def lk_step(c):
        fl, dist = lucas_kanade(i1, Image2d(data=c, border=9), kp_rc,
                                winsize=WINSIZE, nscales=NSCALES,
                                niterations=NITER, convergence_delta=EPS)
        return c + 1e-9 * fl.sum()

    tpu_lk_ms = timed(lk_step, i2d)
    print(json.dumps({
        "bench": "pyrlk_vs_opencv", "nkp": NKP, "size": f"{W}x{H}",
        "opencv_ms": round(cv_lk_ms, 2), "tpu_ms": round(tpu_lk_ms, 2),
        "tpu_vs_opencv": round(cv_lk_ms / tpu_lk_ms, 2),
        "note": "recorded loss: per-point iterative LK is a CPU-shaped "
                "algorithm (early exit does ~5x less arithmetic, and "
                "the TPU's lockstep batch also scales ~linearly in N "
                "because the patch-extraction matmuls do) — the "
                "semi_dense row below is the TPU-native answer"}))

    # batch scaling: the TPU runs keypoints in lockstep on idle lanes —
    # 4x the batch costs ~nothing; OpenCV scales linearly
    NKP4 = 4096
    pts4 = (np.random.RandomState(7).rand(NKP4, 2).astype(np.float32)
            * [W - 20, H - 20] + 10)
    pts4_cv = np.ascontiguousarray(pts4.reshape(-1, 1, 2), np.float32)

    def cv_lk4():
        cv2.calcOpticalFlowPyrLK(
            a_u8, b_u8, pts4_cv, None, winSize=(WINSIZE, WINSIZE),
            maxLevel=NSCALES - 1, criteria=crit)

    cv_lk4_ms = bench_cv(cv_lk4)
    kp4_rc = jnp.asarray(pts4[:, ::-1].copy())

    def lk4_step(c):
        fl, dist = lucas_kanade(i1, Image2d(data=c, border=9), kp4_rc,
                                winsize=WINSIZE, nscales=NSCALES,
                                niterations=NITER, convergence_delta=EPS)
        return c + 1e-9 * fl.sum()

    tpu_lk4_ms = timed(lk4_step, i2d)
    print(json.dumps({
        "bench": "pyrlk_vs_opencv", "nkp": NKP4, "size": f"{W}x{H}",
        "opencv_ms": round(cv_lk4_ms, 2), "tpu_ms": round(tpu_lk4_ms, 2),
        "tpu_vs_opencv": round(cv_lk4_ms / tpu_lk4_ms, 2)}))

    # --- the TPU-native sparse tracking path vs OpenCV LK -----------------
    # the library's own answer to sparse tracking is NOT per-point LK but
    # the dense-cost-volume semi-dense flow (the video_extruder engine):
    # all keypoints advance through shifted whole-image slices + MXU
    # window sums — no per-point anything
    from vpp_tpu.algorithms import semi_dense_optical_flow
    pos2048 = jnp.asarray(
        np.random.RandomState(9).rand(2048, 2).astype(np.float32)
        * [H - 20, W - 20] + 10)
    ok2048 = jnp.ones((2048,), bool)

    def flow_step(c):
        m, d, ok = semi_dense_optical_flow(
            pos2048, ok2048, i1, Image2d(data=c, border=9),
            winsize=9, nscales=3)
        return c + 1e-9 * m.sum()

    tpu_flow_ms = timed(flow_step, i2d)
    print(json.dumps({
        "bench": "semi_dense_flow_vs_opencv_lk", "nkp": 2048,
        "size": f"{W}x{H}",
        "opencv_lk_1024_ms": round(cv_lk_ms, 2),
        "tpu_semi_dense_2048_ms": round(tpu_flow_ms, 2),
        "note": "different algorithms (SAD window search vs Newton LK; "
                "integer vs sub-pixel flow) — this is the engine the "
                "tracker actually runs, at 2x the keypoint count"}))

    # --- FAST -------------------------------------------------------------
    big = cv2.blur(rng.randint(0, 255, (1080, 1920)).astype(np.uint8),
                   (3, 3))
    det = cv2.FastFeatureDetector_create(threshold=10,
                                         nonmaxSuppression=True)

    def cv_fast():
        det.detect(big)

    cv_fast_ms = bench_cv(cv_fast, reps=10)

    from vpp_tpu.algorithms import fast9_score
    imgf = from_array(jnp.asarray(big.astype(np.float32)), border=3,
                      border_mode="mirror")

    def fast_step(c):
        s = fast9_score(Image2d(data=c, border=3), 10)
        return c + 1e-9 * s.astype(jnp.float32).sum()

    tpu_fast_ms = timed(fast_step, imgf.data)
    print(json.dumps({
        "bench": "fast9_vs_opencv", "size": "1920x1080",
        "opencv_ms": round(cv_fast_ms, 2),
        "tpu_ms": round(tpu_fast_ms, 2),
        "tpu_vs_opencv": round(cv_fast_ms / tpu_fast_ms, 2),
        "note": "cv::FAST detects+NMS into a vector; TPU side scores "
                "every pixel (the tracker's formulation)"}))


if __name__ == "__main__":
    main()
