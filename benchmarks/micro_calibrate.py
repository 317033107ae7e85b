"""Calibration microbench: how fast are trivial ops on this chip, under
the same lax.scan harness the stage profiler uses? Establishes the
per-iteration floor and the achievable HBM bandwidth so stage numbers can
be judged against speed-of-light."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 498, 658           # bordered VGA, matches the tracker's buffers
N = 100


def say(m):
    print(m, flush=True)


def scan_time(name, step, init, n=N, reps=3, bytes_moved=None):
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
    bw = f"  ({bytes_moved / ms * 1e3 / 1e9:.0f} GB/s)" if bytes_moved else ""
    say(f"{name:36s} {ms:8.4f} ms/iter{bw}")
    return ms


def main():
    say(f"# backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(H, W).astype(np.float32))

    # 1. pure scalar carry (the scan-iteration floor)
    scan_time("scalar carry (floor)", lambda c, i: (c + 1.0, None),
              jnp.float32(0))

    # 7. strided reduce_window (the cost-volume op) at level-0 geometry
    D, lr, lc = 25, 484, 644
    GH, GW = (lr - 9) // 5 + 1, (lc - 9) // 5 + 1
    vol_in = jnp.asarray(rng.rand(D, lr, lc).astype(np.float32))

    def rw(c, i):
        o = jax.lax.reduce_window(c, jnp.float32(0), jax.lax.add,
                                  (1, 9, 9), (1, 5, 5), "valid")
        return c.at[:, :96, :128].add(o * 1e-30), None
    scan_time("reduce_window 25x(485,649) 9x9s5", rw, vol_in,
              bytes_moved=(D * lr * lc * 4))

    # 8. the 25-slice diff stack (build vol_in from two images)
    a2 = jnp.asarray(rng.rand(H, W).astype(np.float32))

    def dstack(c, i):
        base = jax.lax.slice(c, (4, 4), (4 + lr, 4 + lc))
        sls = [jnp.abs(base - jax.lax.slice(a2, (4 + dr, 4 + dc),
                                            (4 + dr + lr, 4 + dc + lc)))
               for dr in range(-2, 3) for dc in range(-2, 3)]
        st = jnp.stack(sls)
        return c.at[:lr, :lc].add(st.sum(0) * 1e-30), None
    scan_time("25-slice diff stack + sum", dstack, a,
              bytes_moved=(2 * H * W * 4 + D * lr * lc * 4))

    # 9. diff stack THEN reduce_window (the full level-0 cost volume)
    def dvol(c, i):
        base = jax.lax.slice(c, (4, 4), (4 + lr, 4 + lc))
        sls = [jnp.abs(base - jax.lax.slice(a2, (4 + dr, 4 + dc),
                                            (4 + dr + lr, 4 + dc + lc)))
               for dr in range(-2, 3) for dc in range(-2, 3)]
        st = jnp.stack(sls)
        o = jax.lax.reduce_window(st, jnp.float32(0), jax.lax.add,
                                  (1, 9, 9), (1, 5, 5), "valid")
        return c.at[:96, :128].add(o.sum(0) * 1e-30), None
    scan_time("L0 cost volume (diff+rw)", dvol, a,
              bytes_moved=(2 * H * W * 4 + 2 * D * lr * lc * 4))

    # 10. argmin over the volume
    def argm(c, i):
        m = jnp.argmin(c[:, :96, :128], axis=0)
        return c.at[0, :96, :128].add(m * 1e-30), None
    scan_time("argmin 25x96x128", argm, vol_in)

    # 11. matmul window-sum alternative: S[g] = P @ D @ Q per slice
    P = jnp.zeros((96, lr), jnp.float32)
    for g in range(96):
        P = P.at[g, g * 5:g * 5 + 9].set(1.0)
    Q = jnp.zeros((lc, 128), jnp.float32)
    for g in range(128):
        Q = Q.at[g * 5:g * 5 + 9, g].set(1.0)

    def mmsum(c, i):
        base = jax.lax.slice(c, (4, 4), (4 + lr, 4 + lc))
        sls = [jnp.abs(base - jax.lax.slice(a2, (4 + dr, 4 + dc),
                                            (4 + dr + lr, 4 + dc + lc)))
               for dr in range(-2, 3) for dc in range(-2, 3)]
        st = jnp.stack(sls)                       # (25, lr, lc)
        o = jnp.einsum("gr,krc,cf->kgf", P, st, Q)
        return c.at[:96, :128].add(o.sum(0) * 1e-30), None
    scan_time("L0 cost volume (diff+MXU)", mmsum, a,
              bytes_moved=(2 * H * W * 4 + D * lr * lc * 4))

    # 12. bf16 variant of the diff stack + MXU
    a2h = a2.astype(jnp.bfloat16)
    Ph, Qh = P.astype(jnp.bfloat16), Q.astype(jnp.bfloat16)

    def mmsum16(c, i):
        ch = c.astype(jnp.bfloat16)
        base = jax.lax.slice(ch, (4, 4), (4 + lr, 4 + lc))
        sls = [jnp.abs(base - jax.lax.slice(a2h, (4 + dr, 4 + dc),
                                            (4 + dr + lr, 4 + dc + lc)))
               for dr in range(-2, 3) for dc in range(-2, 3)]
        st = jnp.stack(sls)
        o = jnp.einsum("gr,krc,cf->kgf", Ph, st, Qh,
                       preferred_element_type=jnp.float32)
        return c.at[:96, :128].add(o.sum(0) * 1e-30), None
    scan_time("L0 cost volume (bf16+MXU)", mmsum16, a,
              bytes_moved=(2 * H * W * 4 + D * lr * lc * 2))

    # 12b. separable 2-pass reduce_window
    def rwsep(c, i):
        o = jax.lax.reduce_window(c, jnp.float32(0), jax.lax.add,
                                  (1, 9, 1), (1, 5, 1), "valid")
        o = jax.lax.reduce_window(o, jnp.float32(0), jax.lax.add,
                                  (1, 1, 9), (1, 1, 5), "valid")
        return c.at[:, :GH, :GW].add(o * 1e-30), None
    scan_time("reduce_window separable 2-pass", rwsep, vol_in,
              bytes_moved=(D * lr * lc * 4))

    # 12c. full volume, separable rw
    def dvolsep(c, i):
        base = jax.lax.slice(c, (4, 4), (4 + lr, 4 + lc))
        sls = [jnp.abs(base - jax.lax.slice(a2, (4 + dr, 4 + dc),
                                            (4 + dr + lr, 4 + dc + lc)))
               for dr in range(-2, 3) for dc in range(-2, 3)]
        st = jnp.stack(sls)
        o = jax.lax.reduce_window(st, jnp.float32(0), jax.lax.add,
                                  (1, 9, 1), (1, 5, 1), "valid")
        o = jax.lax.reduce_window(o, jnp.float32(0), jax.lax.add,
                                  (1, 1, 9), (1, 1, 5), "valid")
        return c.at[:GH, :GW].add(o.sum(0) * 1e-30), None
    scan_time("L0 cost volume (diff+sep rw)", dvolsep, a,
              bytes_moved=(2 * H * W * 4 + 2 * D * lr * lc * 4))

    # 14. pyramid: current conv-based build (varying input)
    from vpp_tpu.core.image import Image2d
    from vpp_tpu.algorithms.pyramid import pyramid as build_pyr
    clip = jnp.asarray(rng.rand(8, H, W).astype(np.float32))

    def pyrc(c, i):
        p = build_pyr(Image2d(data=clip[i % 8] + c * 1e-30, border=9),
                      3, border=9)
        return c + p.levels[-1].data[9, 9] * 1e-30, None
    scan_time("pyramid conv-based (current)", pyrc, jnp.float32(0))

    # 15. pyramid via separable shifted slices (prototype)
    def sep_decimate(x, oh, ow):
        h, w = x.shape
        p = jnp.pad(x, 2, mode="symmetric")
        t = (p[:, 0:w] + 4 * p[:, 1:w + 1] + 6 * p[:, 2:w + 2]
             + 4 * p[:, 3:w + 3] + p[:, 4:w + 4])
        o = (t[0:h] + 4 * t[1:h + 1] + 6 * t[2:h + 2] + 4 * t[3:h + 3]
             + t[4:h + 4]) * (1.0 / 256.0)
        nr = max(0, 2 * (oh - 1) + 1 - h)
        nc = max(0, 2 * (ow - 1) + 1 - w)
        if nr or nc:
            o = jnp.pad(o, ((0, nr), (0, nc)), mode="symmetric")
        return o[::2, ::2][:oh, :ow]

    def pyrs(c, i):
        x = clip[i % 8][9:-9, 9:-9] if False else clip[i % 8]
        x = x + c * 1e-30
        l1 = sep_decimate(x, 241, 321)
        l2 = sep_decimate(l1, 121, 161)
        out = (jnp.pad(x, 9, mode="symmetric"),
               jnp.pad(l1, 9, mode="symmetric"),
               jnp.pad(l2, 9, mode="symmetric"))
        return c + out[2][9, 9] * 1e-30, None
    scan_time("pyramid separable slices", pyrs, jnp.float32(0))

    # 13. warp by masked-select over 24 rolls (the level-0 warp)
    dig = jnp.asarray(rng.randint(-12, 13, (H, W)) * 2, jnp.int32)

    def warp(c, i):
        out = c
        for axis in (0, 1):
            sel = out
            for k in range(-24, 25, 2):
                if k == 0:
                    continue
                sel = jnp.where(dig == k, jnp.roll(out, -k, axis=axis), sel)
            out = sel
        return out, None
    scan_time("warp 2x24 masked rolls", warp, a,
              bytes_moved=2 * H * W * 4)


if __name__ == "__main__":
    main()
