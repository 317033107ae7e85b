"""Correctness coverage for the fused Pallas flow-level kernel.

The kernel (ops/pallas_kernels.py:flow_level_pallas) is the default TPU
path for semi-dense flow; its first version shipped algebraically wrong,
so it must never again be uncovered. These tests run it in Pallas
interpret mode on the CPU test platform and assert parity with the XLA
formulation it replaces (algorithms/flow.py).

For integer-valued grayscale images the kernel's SAD is *exact* (integers
0..256 are bf16-representable; both matmuls accumulate in f32), so parity
here is bit-level on the flow and distances, not a tolerance band.

Interpret mode is slow (~10 s per level call), so the configs are small:
48x64 frames, search radius 2. The TPU-compiled kernel at production
geometry is exercised by bench.py / benchmarks/micro.py on the chip.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vpp_tpu.core import from_array
from vpp_tpu.algorithms import flow as F
from vpp_tpu.algorithms.flow import semi_dense_optical_flow

H, W = 48, 64


def _int_texture(h, w, seed=0):
    """Integer-valued smoothed texture (SAD basins + bf16-exact values)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h * 2, w * 2)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 1, mode="wrap"), (3, 3))
    sm = (sm.sum(axis=(2, 3)) // 9).astype(np.float32)   # integer-valued
    return sm


def _frame(tex, dr, dc, h, w, border):
    a = tex[16 + dr:16 + dr + h, 16 + dc:16 + dc + w]
    return from_array(jnp.asarray(a), border=border, border_mode="mirror")


def test_pallas_flow_matches_xla_end_to_end():
    """semi_dense_optical_flow(use_pallas=True) == (use_pallas=False),
    bit-level, on an integer-texture translation scene."""
    winsize, nscales = 7, 2
    tex = _int_texture(H, W)
    i1 = _frame(tex, 0, 0, H, W, winsize)
    i2 = _frame(tex, 2, -1, H, W, winsize)
    rng = np.random.RandomState(1)
    n = 40
    pts = np.stack([rng.randint(8, H - 8, n),
                    rng.randint(8, W - 8, n)], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)
    valid = jnp.ones((n,), bool)
    kw = dict(winsize=winsize, nscales=nscales, propagation=1,
              patchsize=5, search_niters=2)
    m_x, d_x, ok_x = semi_dense_optical_flow(pts, valid, i1, i2,
                                             use_pallas=False, **kw)
    with pltpu.force_tpu_interpret_mode():
        m_p, d_p, ok_p = semi_dense_optical_flow(pts, valid, i1, i2,
                                                 use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_p))
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_p),
                               rtol=1e-5, atol=1e-3)
    # and the flow is actually right (scene moved by (-2, +1))
    flow = np.asarray(m_x) - np.asarray(pts)
    assert (np.abs(np.median(flow, axis=0) - [-2.0, 1.0]) <= 0.5).all()


def test_flow_level_pallas_matches_xla_level():
    """Direct single-level check with a synthetic nonzero prediction field
    (exercises the warp stage + propagation volume lookups)."""
    winsize, patch, R = 7, 5, 2
    b = max(3, winsize)
    tex = _int_texture(H, W, seed=3)
    a1j = _frame(tex, 0, 0, H, W, b).data.astype(jnp.float32)
    a2j = _frame(tex, 2, 2, H, W, b).data.astype(jnp.float32)
    gh, gw = H // patch, W // patch
    disp, offsets = F._displacement_table(R)

    # even-valued prediction field (predictions are 2x coarser flow)
    rng = np.random.RandomState(0)
    pred = 2 * rng.randint(-1, 2, (gh, gw, 2)).astype(np.int32)
    pred_bound = 2
    predj = jnp.asarray(pred)

    # XLA path (the exact code path of flow.py's non-pallas branch)
    flow, dist = F._flow_level_xla(a1j, a2j, predj, b, H, W, winsize,
                                   patch, gh, gw, R, offsets, disp,
                                   pred_bound, prop_iters=2)

    # Pallas path (interpret mode)
    with pltpu.force_tpu_interpret_mode():
        flow_p, dist_p = F._flow_level_fused(
            a1j, a2j, predj, b, H, W, winsize, patch, gh, gw, R,
            offsets, pred_bound, prop_iters=2)

    np.testing.assert_array_equal(np.asarray(flow), np.asarray(flow_p))
    fin = np.asarray(dist) < 1e29
    np.testing.assert_array_equal(fin, np.asarray(dist_p) < 1e29)
    np.testing.assert_allclose(np.asarray(dist)[fin],
                               np.asarray(dist_p)[fin],
                               rtol=1e-5, atol=1e-3)
