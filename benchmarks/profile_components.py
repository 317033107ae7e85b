"""Per-stage tracker profile at the bench config (640x480) — run on chip.

Each stage runs N iterations under one lax.scan (tunnel dispatch
amortised); prints ms/iter incrementally (unbuffered)."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.core.image import Image2d, from_array
from vpp_tpu.algorithms.pyramid import pyramid
from vpp_tpu.algorithms.fast import fast9, fast9_score, fast9_score_at
from vpp_tpu.algorithms.flow import semi_dense_optical_flow
from vpp_tpu.algorithms.video_extruder import (VideoExtruderConfig,
                                               video_extruder_init,
                                               video_extruder_update)

H, W = 480, 640
cfg = VideoExtruderConfig(capacity=4096, detect_k=2048, nscales=3,
                          winsize=9, keypoint_spacing=10,
                          detector_period=5, detector_th=10)
B = max(3, cfg.winsize)
N = 30

rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.float32))
f2 = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.float32))


def say(msg):
    print(msg, flush=True)


def scan_time(name, step, init, reps=3):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(step, c, jnp.arange(N))
        return c
    t0 = time.perf_counter()
    r = jax.block_until_ready(run(init))
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    say(f"#   [{name} compiled in {time.perf_counter()-t0:.0f}s]")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        ts.append(time.perf_counter() - t0)
    say(f"{name:32s} {sorted(ts)[reps//2]/N*1e3:8.3f} ms/iter")


def main():
    say(f"# backend: {jax.default_backend()}")

    # pyramid build (1 per frame in the scan driver)
    def pyr_step(c, i):
        p = pyramid(from_array(c + i, border=B, border_mode="mirror"),
                    cfg.nscales, border=B)
        return p.levels[0].data[B:-B, B:-B], None
    scan_time("pyramid(3lvl)", pyr_step, f1)

    # full-image FAST9 blockwise detect (every detector_period frames)
    def fast_step(c, i):
        kp, score, n = fast9(from_array(c + i, border=B,
                                        border_mode="mirror"), 10,
                             blockwise=True, block_size=10, k=2048)
        return c + score.astype(jnp.float32).sum() * 1e-30, None
    scan_time("fast9 blockwise+topk", fast_step, f1)

    # full-image score map (the OLD per-frame cull path)
    def score_step(c, i):
        s = fast9_score(Image2d(data=c + i, border=B), 10)
        return c + s.astype(jnp.float32).sum() * 1e-30, None
    scan_time("fast9_score full image", score_step,
              from_array(f1, border=B, border_mode="mirror").data)

    # per-keypoint score sampling (the NEW cull path)
    K = 4096
    pos_i = jnp.asarray(np.stack([rng.randint(0, H, K),
                                  rng.randint(0, W, K)], -1), jnp.int32)

    def score_at_step(c, i):
        s = fast9_score_at(Image2d(data=c + i, border=B), pos_i, 10)
        return c + s.astype(jnp.float32).sum() * 1e-30, None
    scan_time("fast9_score_at 4096 kps", score_at_step,
              from_array(f1, border=B, border_mode="mirror").data)

    # flow with prebuilt pyramids (the scan driver's configuration)
    pos = jnp.asarray(rng.rand(K, 2).astype(np.float32) * [H - 1, W - 1])
    valid = jnp.ones((K,), bool)
    i1 = from_array(f1, border=B, border_mode="mirror")
    i2 = from_array(f2, border=B, border_mode="mirror")
    pyr1 = pyramid(i1, cfg.nscales, border=B)
    pyr2 = pyramid(i2, cfg.nscales, border=B)

    def flow_pre_step(c, i):
        m, d, ok = semi_dense_optical_flow(
            pos + c * 1e-30, valid, i1, i2, winsize=cfg.winsize,
            nscales=cfg.nscales, propagation=2, patchsize=5,
            pyr1=pyr1, pyr2=pyr2)
        return c + m.sum() * 1e-30, None
    scan_time("flow (prebuilt pyramids)", flow_pre_step, jnp.float32(0))

    def flow_pre_xla_step(c, i):
        m, d, ok = semi_dense_optical_flow(
            pos + c * 1e-30, valid, i1, i2, winsize=cfg.winsize,
            nscales=cfg.nscales, propagation=2, patchsize=5,
            pyr1=pyr1, pyr2=pyr2, use_pallas=False)
        return c + m.sum() * 1e-30, None
    scan_time("flow (prebuilt, XLA path)", flow_pre_xla_step,
              jnp.float32(0))

    # full tracker update (pyramids built inside: 2 per call)
    state = video_extruder_init(cfg)

    def upd_step(s, i):
        s2 = video_extruder_update(
            s, from_array(f1 + i, border=B, border_mode="mirror"),
            from_array(f2 + i, border=B, border_mode="mirror"), cfg)
        return s2, None
    scan_time("video_extruder_update", upd_step, state)


if __name__ == "__main__":
    main()
