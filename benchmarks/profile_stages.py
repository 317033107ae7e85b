"""Honest per-stage tracker profile at the bench config (640x480), on chip.

Two traps the old profile_components.py fell into (kept for reference):
  * the axon tunnel costs ~25 ms PER DISPATCH regardless of work, so
    per-iter numbers at small N are mostly overhead — here every stage
    scans over N frames in ONE dispatch and the scalar-carry floor is
    subtracted;
  * loop-invariant inputs (prebuilt pyramids) get hoisted out of the
    scan by XLA, silently deleting the work being measured — here every
    stage consumes a DIFFERENT frame of a preloaded clip each iteration.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.core.image import Image2d
from vpp_tpu.algorithms.pyramid import pyramid
from vpp_tpu.algorithms.fast import fast9, fast9_score
from vpp_tpu.algorithms.flow import semi_dense_optical_flow
from vpp_tpu.algorithms.video_extruder import (VideoExtruderConfig,
                                               video_extruder_init,
                                               video_extruder_update,
                                               video_extruder_run,
                                               _merge_collided,
                                               _occupancy_mask)

H, W, N = 480, 640, 60
cfg = VideoExtruderConfig(capacity=4096, detect_k=2048, nscales=3,
                          winsize=9, keypoint_spacing=10,
                          detector_period=5, detector_th=10)
B = max(3, cfg.winsize)


def say(m):
    print(m, flush=True)


def make_clip(nframes, seed=0):
    rng = np.random.RandomState(seed)
    th, tw = H + nframes + 8, W + nframes + 8
    base = rng.randint(0, 256, (th, tw)).astype(np.float32)
    p = np.pad(base, 1, mode="edge")
    sm = sum(p[r:r + th, c:c + tw] for r in range(3) for c in range(3)) / 9.0
    return np.stack([sm[t:t + H, t:t + W] for t in range(nframes)])


clip = jax.device_put(jnp.asarray(make_clip(N)))
# pre-padded clip (mirror border) so stages can skip the pad cost
padded = jnp.pad(clip, ((0, 0), (B, B), (B, B)), mode="symmetric")

_floor = None


def scan_time(name, step, init, reps=5):
    global _floor

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(step, c, jnp.arange(N))
        return c
    r = jax.block_until_ready(run(init))
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        ts.append(time.perf_counter() - t0)
    tot = sorted(ts)[reps // 2]
    ms = tot / N * 1e3
    if _floor is None:
        _floor = ms
        say(f"{name:34s} {ms:8.4f} ms/frame   [floor]")
    else:
        say(f"{name:34s} {ms:8.4f} ms/frame   net {ms - _floor:7.4f}")
    return ms


def main():
    say(f"# backend: {jax.default_backend()}  N={N}")
    rng = np.random.RandomState(0)
    K = cfg.capacity
    pos = jnp.asarray(rng.rand(K, 2).astype(np.float32) * [H - 1, W - 1])
    valid = jnp.ones((K,), bool)

    scan_time("floor (scalar carry)", lambda c, i: (c + 1.0, None),
              jnp.float32(0))

    # pyramid build per frame
    def pyr_step(c, i):
        p = pyramid(Image2d(data=padded[i], border=B), cfg.nscales, border=B)
        return c + p.levels[-1].data[B, B] * 1e-30, None
    scan_time("pyramid(3lvl)", pyr_step, jnp.float32(0))

    # score map per frame
    def score_step(c, i):
        s = fast9_score(Image2d(data=padded[i], border=B), 10)
        return c + s[0, 0].astype(jnp.float32) * 1e-30, None
    scan_time("fast9_score full image", score_step, jnp.float32(0))

    # blockwise detect per frame (runs every 5th in the tracker)
    def fast_step(c, i):
        kp, score, nv = fast9(Image2d(data=padded[i], border=B), 10,
                              blockwise=True, block_size=10, k=2048)
        return c + score.astype(jnp.float32).sum() * 1e-30, None
    scan_time("fast9 blockwise+topk", fast_step, jnp.float32(0))

    # flow per frame (carry previous pyramid like the tracker's scan)
    def flow_step(carry, i):
        c, pyr1 = carry
        f2 = Image2d(data=padded[i], border=B)
        pyr2 = pyramid(f2, cfg.nscales, border=B)
        f1 = Image2d(data=padded[jnp.maximum(i - 1, 0)], border=B)
        m, d, ok = semi_dense_optical_flow(
            pos, valid, f1, f2, winsize=cfg.winsize, nscales=cfg.nscales,
            propagation=2, patchsize=5, pyr1=pyr1, pyr2=pyr2)
        return (c + m.sum() * 1e-30, pyr2), None
    pyr0 = pyramid(Image2d(data=padded[0], border=B), cfg.nscales, border=B)
    pyr_ms = scan_time("pyramid + flow", flow_step, (jnp.float32(0), pyr0))

    # merge scatter alone
    state = video_extruder_init(cfg)
    kps0 = state.keypoints.replace(
        position=pos,
        age=jnp.asarray(rng.randint(1, 20, (K,)), jnp.int32))

    def merge_step(c, i):
        kk = kps0.replace(position=kps0.position + i * 1e-30)
        kk = _merge_collided(kk, (H, W), cfg.keypoint_spacing)
        return c + kk.alive.sum() * 1e-30, None
    scan_time("merge scatter", merge_step, jnp.float32(0))

    # occupancy mask alone
    def occ_step(c, i):
        kk = kps0.replace(position=kps0.position + i * 1e-30)
        m = _occupancy_mask(kk, (H, W), cfg.keypoint_spacing)
        return c + m.astype(jnp.float32).sum() * 1e-30, None
    scan_time("occupancy mask", occ_step, jnp.float32(0))

    # full update per frame (pyramid carried, like the run driver)
    def upd_step(carry, i):
        st, prev_data, pyr1 = carry
        f2 = Image2d(data=padded[i], border=B)
        pyr2 = pyramid(f2, cfg.nscales, border=B)
        f1 = Image2d(data=prev_data, border=B)
        st2 = video_extruder_update(st, f1, f2, cfg, pyr1=pyr1, pyr2=pyr2)
        return (st2, f2.data, pyr2), None
    scan_time("full update (pyr carried)", upd_step,
              (state, padded[0], pyr0))

    # the bench path itself, same N
    def bench_like(c, i):
        return c, None
    t0 = time.perf_counter()
    runf = jax.jit(lambda f: video_extruder_run(f, cfg))
    st = jax.block_until_ready(runf(clip))
    np.asarray(st[0].keypoints.alive)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(runf(clip))
        ts.append(time.perf_counter() - t0)
    tot = sorted(ts)[2]
    say(f"{'video_extruder_run (bench)':34s} {tot / N * 1e3:8.4f} ms/frame"
        f"   net {tot / N * 1e3 - _floor:7.4f}")


if __name__ == "__main__":
    main()
