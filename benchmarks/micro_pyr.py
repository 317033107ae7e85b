"""Decimation/pyramid strategy shootout on chip."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
N = 100


def say(m):
    print(m, flush=True)


def scan_time(name, step, init, n=N, reps=3):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(step, c, jnp.arange(n))
        return c
    r = jax.block_until_ready(run(init))
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[reps // 2] / n * 1e3
    say(f"{name:40s} {ms:8.4f} ms/iter")
    return ms


def decim_matrices(h, oh, dtype=jnp.float32):
    """(oh, h) banded matrix: row i = binomial taps at column 2i."""
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16.0
    A = np.zeros((oh, h), np.float32)
    for i in range(oh):
        for t in range(5):
            src = 2 * i + t - 2
            # symmetric (mirror) boundary
            if src < 0:
                src = -src - 1
            if src >= h:
                src = 2 * h - src - 1
            A[i, src] += k[t]
    return jnp.asarray(A, dtype)


def main():
    say(f"# backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    clip = jnp.asarray(rng.rand(8, H, W).astype(np.float32) * 255)

    floor = scan_time("floor", lambda c, i: (c + 1.0, None), jnp.float32(0))

    # stride-2 extraction variants
    def s2a(c, i):
        x = clip[i % 8] + c * 1e-30
        return c + x[::2, ::2].sum() * 1e-30, None
    scan_time("x[::2, ::2]", s2a, jnp.float32(0))

    def s2b(c, i):
        x = clip[i % 8] + c * 1e-30
        y = x.reshape(H // 2, 2, W // 2, 2)[:, 0, :, 0]
        return c + y.sum() * 1e-30, None
    scan_time("reshape phase extract", s2b, jnp.float32(0))

    # matmul pyramid: A1 @ x @ B1 -> level1; A2 @ l1 @ B2 -> level2
    A1 = decim_matrices(H, 241)
    B1 = decim_matrices(W, 321).T
    A2 = decim_matrices(241, 121)
    B2 = decim_matrices(321, 161).T

    def pyr_mm(c, i):
        x = clip[i % 8] + c * 1e-30
        l1 = (A1 @ x) @ B1
        l2 = (A2 @ l1) @ B2
        o0 = jnp.pad(x, 9, mode="symmetric")
        o1 = jnp.pad(l1, 9, mode="symmetric")
        o2 = jnp.pad(l2, 9, mode="symmetric")
        return c + (o0[9, 9] + o1[9, 9] + o2[9, 9]) * 1e-30, None
    scan_time("pyramid 2 levels via matmul f32", pyr_mm, jnp.float32(0))

    # without the mirror pads (isolate pad cost)
    def pyr_mm_nopad(c, i):
        x = clip[i % 8] + c * 1e-30
        l1 = (A1 @ x) @ B1
        l2 = (A2 @ l1) @ B2
        return c + (l1[0, 0] + l2[0, 0]) * 1e-30, None
    scan_time("matmul pyramid (no pads)", pyr_mm_nopad, jnp.float32(0))

    # pads alone
    def pads_only(c, i):
        x = clip[i % 8] + c * 1e-30
        o0 = jnp.pad(x, 9, mode="symmetric")
        o1 = jnp.pad(x[:241, :321], 9, mode="symmetric")
        o2 = jnp.pad(x[:121, :161], 9, mode="symmetric")
        return c + (o0[9, 9] + o1[9, 9] + o2[9, 9]) * 1e-30, None
    scan_time("3 mirror pads only", pads_only, jnp.float32(0))

    # conv-based, single level (isolate)
    k1 = jnp.asarray(np.array([1, 4, 6, 4, 1], np.float32) / 16.0)
    k2 = jnp.outer(k1, k1)

    def conv1(c, i):
        x = clip[i % 8] + c * 1e-30
        p = jnp.pad(x, 2, mode="symmetric")
        p = jnp.pad(p, ((0, 1), (0, 1)), mode="symmetric")
        o = jax.lax.conv_general_dilated(
            p[None, None], k2[None, None], window_strides=(2, 2),
            padding="VALID")[0, 0]
        return c + o[0, 0] * 1e-30, None
    scan_time("conv stride2 1 level", conv1, jnp.float32(0))

    # filter WITHOUT decimation (isolate the stencil cost)
    def filt_only(c, i):
        x = clip[i % 8] + c * 1e-30
        p = jnp.pad(x, 2, mode="symmetric")
        t = (p[:, 0:W] + 4 * p[:, 1:W + 1] + 6 * p[:, 2:W + 2]
             + 4 * p[:, 3:W + 3] + p[:, 4:W + 4])
        o = (t[0:H] + 4 * t[1:H + 1] + 6 * t[2:H + 2] + 4 * t[3:H + 3]
             + t[4:H + 4]) * (1.0 / 256.0)
        return c + o[0, 0] * 1e-30, None
    scan_time("separable filter only (no decim)", filt_only, jnp.float32(0))

    # filter then [::2]
    def filt_dec(c, i):
        x = clip[i % 8] + c * 1e-30
        p = jnp.pad(x, 2, mode="symmetric")
        t = (p[:, 0:W] + 4 * p[:, 1:W + 1] + 6 * p[:, 2:W + 2]
             + 4 * p[:, 3:W + 3] + p[:, 4:W + 4])
        o = (t[0:H] + 4 * t[1:H + 1] + 6 * t[2:H + 2] + 4 * t[3:H + 3]
             + t[4:H + 4]) * (1.0 / 256.0)
        return c + o[::2, ::2][0, 0] * 1e-30, None
    scan_time("separable filter + [::2] slice", filt_dec, jnp.float32(0))


if __name__ == "__main__":
    main()
