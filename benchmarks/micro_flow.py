"""Flow-internals shootout: where do the ~0.53 ms/frame go?"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vpp_tpu.core.image import Image2d
from vpp_tpu.algorithms.pyramid import pyramid
from vpp_tpu.algorithms.flow import semi_dense_optical_flow

H, W, N = 480, 640, 60
B = 9
K = 4096


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
    say(f"{name:44s} {ms:8.4f} ms/iter")
    return ms


def make_clip(nframes, seed=0):
    rng = np.random.RandomState(seed)
    th, tw = H + nframes + 8, W + nframes + 8
    base = rng.randint(0, 256, (th, tw)).astype(np.float32)
    p = np.pad(base, 1, mode="edge")
    sm = sum(p[r:r + th, c:c + tw] for r in range(3) for c in range(3)) / 9.0
    return np.stack([sm[t:t + H, t:t + W] for t in range(nframes)])


def main():
    say(f"# backend: {jax.default_backend()}  N={N}")
    rng = np.random.RandomState(0)
    clip = jax.device_put(jnp.asarray(make_clip(N)))
    padded = jnp.pad(clip, ((0, 0), (B, B), (B, B)), mode="symmetric")
    pos = jnp.asarray(rng.rand(K, 2).astype(np.float32) * [H - 1, W - 1])
    valid = jnp.ones((K,), bool)

    floor = scan_time("floor", lambda c, i: (c + 1.0, None), jnp.float32(0))

    def flow_step_args(prop):
        def step(carry, i):
            c, pyr1 = carry
            f2 = Image2d(data=padded[i], border=B)
            pyr2 = pyramid(f2, 3, border=B)
            f1 = Image2d(data=padded[jnp.maximum(i - 1, 0)], border=B)
            m, d, ok = semi_dense_optical_flow(
                pos, valid, f1, f2, winsize=9, nscales=3,
                propagation=prop, patchsize=5, pyr1=pyr1, pyr2=pyr2)
            return (c + m.sum() * 1e-30, pyr2), None
        return step
    pyr0 = pyramid(Image2d(data=padded[0], border=B), 3, border=B)

    def pyr_only(carry, i):
        c, _ = carry
        f2 = Image2d(data=padded[i], border=B)
        pyr2 = pyramid(f2, 3, border=B)
        return (c + pyr2.levels[-1].data[B, B] * 1e-30, pyr2), None
    scan_time("pyramid only", pyr_only, (jnp.float32(0), pyr0))
    scan_time("pyr + flow prop=2 (current)", flow_step_args(2),
              (jnp.float32(0), pyr0))
    scan_time("pyr + flow prop=0", flow_step_args(0),
              (jnp.float32(0), pyr0))
    scan_time("pyr + flow prop=1", flow_step_args(1),
              (jnp.float32(0), pyr0))

    # mark scatter alone (the s==min_scale occupancy)
    gh, gw = 96, 128
    cell_flat = jnp.asarray(rng.randint(0, gh * gw, (K,)), jnp.int32)

    def mark_step(c, i):
        cf = jnp.minimum(cell_flat + i * 0, gh * gw - 1)
        occ = jnp.zeros((gh * gw,), bool).at[
            jnp.where(valid, cf, gh * gw)].max(
            jnp.ones_like(valid), mode="drop")
        return c + occ.sum() * 1e-30, None
    scan_time("mark scatter 4096->12k", mark_step, jnp.float32(0))

    # readout gather alone
    lvlflow = jnp.asarray(rng.randint(-5, 6, (gh, gw, 2)), jnp.int32)

    def readout(c, i):
        p = pos + c * 1e-30
        cc = jnp.clip(jnp.floor(p / 5).astype(jnp.int32), 0,
                      jnp.array([gh - 1, gw - 1]))
        f = lvlflow[cc[:, 0], cc[:, 1]]
        return c + f.sum() * 1e-30, None
    scan_time("readout gather 4096", readout, jnp.float32(0))

    # propagation lookup alone: 8 neighbors x 2 iters at L0 geometry
    vol = jnp.asarray(rng.rand(25, gh, gw).astype(np.float32))
    flow0 = lvlflow
    pred = jnp.zeros((gh, gw, 2), jnp.int32)
    from vpp_tpu.algorithms.flow import _volume_lookup, _C8

    def prop_step(c, i):
        v = vol + c * 1e-30
        flow, dist = flow0, v[0]
        for _ in range(2):
            best_nf, best_nd = flow, dist
            for dr, dc in _C8:
                nf = jnp.roll(flow, (-dr, -dc), axis=(0, 1))
                q = nf - pred
                cand = _volume_lookup(v, q, 2)
                ok = cand < best_nd
                best_nf = jnp.where(ok[..., None], nf, best_nf)
                best_nd = jnp.where(ok, cand, best_nd)
            flow, dist = best_nf, best_nd
        return c + dist.sum() * 1e-30, None
    scan_time("prop lookups L0 (2 iters x 8 nbrs)", prop_step,
              jnp.float32(0))

    # take_along_axis variant of the lookup
    def prop_taa(c, i):
        v = vol + c * 1e-30
        flow, dist = flow0, v[0]
        for _ in range(2):
            best_nf, best_nd = flow, dist
            for dr, dc in _C8:
                nf = jnp.roll(flow, (-dr, -dc), axis=(0, 1))
                q = nf - pred
                qf = ((jnp.clip(q[..., 0], -2, 2) + 2) * 5 +
                      (jnp.clip(q[..., 1], -2, 2) + 2))
                cand = jnp.take_along_axis(v, qf[None], axis=0)[0]
                ok = cand < best_nd
                best_nf = jnp.where(ok[..., None], nf, best_nf)
                best_nd = jnp.where(ok, cand, best_nd)
            flow, dist = best_nf, best_nd
        return c + dist.sum() * 1e-30, None
    scan_time("prop take_along_axis variant", prop_taa, jnp.float32(0))

    # warp at L0 (24 rolls) vs reduced candidate set
    a = padded[0]

    def warp24(c, i):
        out = a + c * 1e-30
        dig = (lvlflow[..., 0] * 0 + 4)
        digf = jnp.repeat(jnp.repeat(dig, 5, axis=0), 5, axis=1)
        digf = jnp.pad(digf, ((B, a.shape[0] - B - 480),
                              (B, a.shape[1] - B - 640)), mode="edge")
        for axis in (0, 1):
            sel = out
            for k in range(-24, 25, 2):
                if k == 0:
                    continue
                sel = jnp.where(digf == k, jnp.roll(out, -k, axis=axis), sel)
            out = sel
        return c + out.sum() * 1e-30, None
    scan_time("L0 warp (2 x 24 rolls)", warp24, jnp.float32(0))


if __name__ == "__main__":
    main()
