"""BASELINE config 2: FAST-9 + LBP descriptors on a 3-level pyramid,
1080p frame — TPU vs the measured native C++/OpenMP counterpart.

Per frame, both sides do the same capability work: build a 3-level
binomial pyramid, FAST9-detect + score every level, and compute the
8-neighbour LBP code image of every level. The TPU side runs N frames
under one lax.scan with per-iteration-varying input (the axon tunnel
costs ~25 ms per dispatch and XLA would hoist loop-invariant work); the
CPU side is native/cpu_baseline.cpp:fastlbp_ms.

Prints ONE json line {"metric", "value" (tpu ms/frame), "unit",
"cpu_ms", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H, W, N = 1080, 1920, 30


def tpu_ms():
    import jax
    import jax.numpy as jnp
    from vpp_tpu.core.image import Image2d
    from vpp_tpu.algorithms.pyramid import pyramid
    from vpp_tpu.algorithms.fast import fast9_score_image
    from vpp_tpu.algorithms.lbp import lbp_transform

    rng = np.random.RandomState(0)
    b = 3
    frame = jnp.asarray(
        np.pad(rng.randint(0, 256, (H, W)).astype(np.float32), b,
               mode="symmetric"))

    def step(c, i):
        img = Image2d(data=frame + c * 1e-30 + i * 1e-30, border=b)
        pyr = pyramid(img, 3, border=b)
        acc = c
        for lvl in pyr.levels:
            s = fast9_score_image(lvl, 10)
            code = lbp_transform(lvl)
            acc = acc + (s.interior.astype(jnp.float32).sum()
                         + code.interior.astype(jnp.float32).sum()) * 1e-30
        return acc, None

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(step, c, jnp.arange(N))
        return c

    jax.block_until_ready(run(jnp.float32(0)))
    np.asarray(run(jnp.float32(0)))

    # scalar-carry floor of the same scan length = the dispatch cost
    @jax.jit
    def floor_run(c):
        c, _ = jax.lax.scan(lambda c, i: (c + 1.0, None), c, jnp.arange(N))
        return c
    jax.block_until_ready(floor_run(jnp.float32(0)))

    def med(f):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2]

    return (med(run) - med(floor_run)) / N * 1e3


def cpu_ms(runs: int = 3):
    from vpp_tpu.utils.native import load_cpu_baseline
    lib = load_cpu_baseline()
    if lib is None:
        return None
    import ctypes
    lib.fastlbp_ms.restype = ctypes.c_double
    lib.fastlbp_ms.argtypes = [ctypes.c_int] * 4
    vals = sorted(lib.fastlbp_ms(W, H, 10, 0) for _ in range(runs))
    return vals[runs // 2]


def main():
    t = tpu_ms()
    c = cpu_ms()
    print(json.dumps({
        "metric": "FAST9+LBP on 3-level pyramid (1080p)",
        "value": round(t, 3),
        "unit": "ms/frame (tpu)",
        "cpu_ms": round(c, 3) if c else None,
        "vs_baseline": round(c / t, 2) if c else None,
    }))


if __name__ == "__main__":
    main()
