"""Column-sharded flow == single-device flow, on the 8-device CPU mesh.

The sharded front-end (parallel/sharded_tracker.py) computes every owned
cell with a halo wide enough to be exact, so match positions, distances
and matched flags must be IDENTICAL to semi_dense_optical_flow away from
the right image margin (the global grid chain's overhang column — see
the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vpp_tpu.core import from_array
from vpp_tpu.algorithms.flow import semi_dense_optical_flow
from vpp_tpu.parallel.sharded_tracker import (flow_halo,
                                              sharded_semi_dense_flow)

H, W = 96, 320            # W/8 = 40 = 2 x patch*2^(nscales-1) for ns=3
NSCALES, WINSIZE, PATCH = 3, 9, 5


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _scene(shift, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (H * 2, W * 2)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 1, mode="wrap"), (3, 3))
    sm = (sm.sum(axis=(2, 3)) // 9).astype(np.float32)
    f1 = sm[32:32 + H, 32:32 + W]
    f2 = sm[32 + shift[0]:32 + shift[0] + H,
            32 + shift[1]:32 + shift[1] + W]
    return jnp.asarray(f1), jnp.asarray(f2)


def test_sharded_flow_matches_single_device():
    mesh = _mesh()
    f1, f2 = _scene((3, -2))
    rng = np.random.RandomState(1)
    n = 120
    # keypoints away from the column margins: the right margin carries
    # the global grid chain's overhang influence, and at both margins
    # the warp's roll-wrap junk (which only feeds cells with rejected /
    # out-of-domain-prediction neighbours) wraps over different content
    # in the sliced vs global buffers — flows agree, junk distances
    # need not (module docstring, deviation 2)
    pts = np.stack([rng.randint(8, H - 8, n),
                    rng.randint(40, W - 56, n)], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    val = jnp.ones((n,), bool)

    kw = dict(winsize=WINSIZE, nscales=NSCALES, propagation=2,
              patchsize=PATCH, search_niters=5)
    b = max(3, WINSIZE)
    i1 = from_array(f1, border=b, border_mode="mirror")
    i2 = from_array(f2, border=b, border_mode="mirror")
    m_ref, d_ref, ok_ref = semi_dense_optical_flow(pts, val, i1, i2, **kw)
    m_sh, d_sh, ok_sh = sharded_semi_dense_flow(mesh, pts, val, f1, f2,
                                                **kw)

    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_sh))
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_sh))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=1e-5, atol=1e-3)
    # sanity: the flow is actually right
    fl = np.asarray(m_ref) - np.asarray(pts)
    assert (np.abs(np.median(fl, axis=0) - [-3.0, 2.0]) <= 0.5).all()


def test_sharded_flow_dead_keypoints_and_ownership():
    mesh = _mesh()
    f1, f2 = _scene((1, 1), seed=3)
    # keypoints straddling every shard boundary + a dead one
    cols = [41.0, 79.0, 81.0, 119.0, 160.0, 201.0, 239.0, 250.0, 255.0]
    pts = jnp.asarray([[48.0, c] for c in cols], jnp.float32)
    val = jnp.asarray([True] * 8 + [False])
    kw = dict(winsize=WINSIZE, nscales=NSCALES, propagation=2,
              patchsize=PATCH, search_niters=5)
    b = max(3, WINSIZE)
    i1 = from_array(f1, border=b, border_mode="mirror")
    i2 = from_array(f2, border=b, border_mode="mirror")
    m_ref, d_ref, ok_ref = semi_dense_optical_flow(pts, val, i1, i2, **kw)
    m_sh, d_sh, ok_sh = sharded_semi_dense_flow(mesh, pts, val, f1, f2,
                                                **kw)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_sh))
    assert not bool(ok_sh[-1])
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_sh))


def test_flow_halo_covers_reach():
    # halo must cover prediction reach + window + propagation travel
    h = flow_halo(9, 3, 5, 2, 5)
    assert h >= 5 * 7 + 9 + 10
    assert h % (5 * 4) == 0
