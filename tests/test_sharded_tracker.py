"""Column-sharded flow == single-device flow, on the 8-device CPU mesh.

The sharded front-end (parallel/sharded_tracker.py) computes every owned
cell with a halo wide enough to be exact, so match positions, distances
and matched flags must be IDENTICAL to semi_dense_optical_flow away from
the right image margin (the global grid chain's overhang column — see
the module docstring).

Geometry: small by default so the suite stays fast; the default config
(nscales=2, search_niters=3, W=320 -> shard width 40 >= halo 40)
exercises the PRODUCTION one-hop ppermute ring exchange, not the
all-gather fallback. Set VPP_FULL_TESTS=1 to also run the round-3
full-size configuration (nscales=3, search_niters=5, halo > shard width
-> all-gather fallback path), ~5 extra minutes on CPU.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from vpp_tpu.core import from_array
from vpp_tpu.algorithms.flow import semi_dense_optical_flow
from vpp_tpu.parallel.sharded_tracker import (flow_halo,
                                              sharded_semi_dense_flow)

H, W = 64, 320            # W/8 = 40 = 4 x patch*2^(nscales-1) for ns=2
NSCALES, WINSIZE, PATCH, SN = 2, 7, 5, 3

FULL = os.environ.get("VPP_FULL_TESTS", "") not in ("", "0")


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _scene(shift, seed=0, h=H, w=W):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h * 2, w * 2)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 1, mode="wrap"), (3, 3))
    sm = (sm.sum(axis=(2, 3)) // 9).astype(np.float32)
    f1 = sm[32:32 + h, 32:32 + w]
    f2 = sm[32 + shift[0]:32 + shift[0] + h,
            32 + shift[1]:32 + shift[1] + w]
    return jnp.asarray(f1), jnp.asarray(f2)


def _assert_equivalent(pts, val, f1, f2, kw, expect_flow=None):
    b = max(3, kw["winsize"])
    i1 = from_array(f1, border=b, border_mode="mirror")
    i2 = from_array(f2, border=b, border_mode="mirror")
    m_ref, d_ref, ok_ref = semi_dense_optical_flow(pts, val, i1, i2, **kw)
    m_sh, d_sh, ok_sh = sharded_semi_dense_flow(_mesh(), pts, val, f1, f2,
                                                **kw)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_sh))
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_sh))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=1e-5, atol=1e-3)
    if expect_flow is not None:
        fl = np.asarray(m_ref) - np.asarray(pts)
        assert (np.abs(np.median(fl, axis=0) - expect_flow) <= 0.5).all()
    return ok_sh


def _pts(n, seed=1, h=H, w=W):
    """Keypoints away from the column margins: the right margin carries
    the global grid chain's overhang influence, and at both margins the
    warp's roll-wrap junk (which only feeds cells with rejected /
    out-of-domain-prediction neighbours) wraps over different content in
    the sliced vs global buffers — flows agree, junk distances need not
    (module docstring, deviation 2)."""
    rng = np.random.RandomState(seed)
    return np.stack([rng.randint(8, h - 8, n),
                     rng.randint(40, w - 56, n)], -1).astype(np.float32)


KW = dict(winsize=WINSIZE, nscales=NSCALES, propagation=2,
          patchsize=PATCH, search_niters=SN)


def test_ring_halo_is_exercised():
    # the default config must take the one-hop ring path, not the
    # all-gather fallback: halo <= shard width
    halo = flow_halo(WINSIZE, NSCALES, PATCH, 2, SN)
    assert halo <= W // 8, (halo, W // 8)


def test_sharded_flow_matches_single_device():
    f1, f2 = _scene((3, -2))
    n = 120
    pts = jnp.asarray(_pts(n))
    val = jnp.ones((n,), bool)
    _assert_equivalent(pts, val, f1, f2, KW, expect_flow=[-3.0, 2.0])


def test_sharded_flow_dead_keypoints_and_ownership():
    f1, f2 = _scene((1, 1), seed=3)
    # keypoints straddling every shard boundary + dead ones; padded to
    # the same K as the test above so the jitted program is reused
    cols = [41.0, 79.0, 81.0, 119.0, 160.0, 201.0, 239.0, 250.0, 255.0]
    n = 120
    pts = _pts(n, seed=4)
    pts[:len(cols)] = [[30.0, c] for c in cols]
    val = np.zeros((n,), bool)
    val[:8] = True                       # 9th boundary point stays dead
    ok = _assert_equivalent(jnp.asarray(pts), jnp.asarray(val), f1, f2, KW)
    assert not bool(ok[8])


def test_flow_halo_covers_reach():
    # halo must cover prediction reach + window + propagation travel
    h = flow_halo(9, 3, 5, 2, 5)
    assert h >= 5 * 7 + 9 + 10
    assert h % (5 * 4) == 0
    # conservative sizing scales propagation travel by the level chain
    hc = flow_halo(9, 3, 5, 2, 5, conservative=True)
    assert hc >= 5 * 7 + 9 + 2 * 5 * 7


def test_conservative_halo_auto_selected_outside_envelope():
    """The default (non-conservative) halo is validated only for
    nscales <= 3, propagation <= 2; outside that envelope _flow_locals
    must auto-switch to the conservative sizing so exactness cannot
    silently degrade (round-4 advisor finding)."""
    from vpp_tpu.parallel.sharded_tracker import (_flow_locals,
                                                  needs_conservative_halo)

    assert not needs_conservative_halo(3, 2)
    assert needs_conservative_halo(4, 2)
    assert needs_conservative_halo(3, 3)
    # geometry check: a deep-pyramid program really gets the wider halo
    mesh = _mesh()
    _, geom = _flow_locals(mesh, "sp", (64, 640), 7, 4, 2, 5, 3, 1)
    assert geom["halo"] == flow_halo(7, 4, 5, 2, 3, conservative=True)
    _, geom3 = _flow_locals(mesh, "sp", (64, 320), 7, 3, 2, 5, 3, 1)
    assert geom3["halo"] == flow_halo(7, 3, 5, 2, 3)


def test_sharded_flow_allgather_fallback_matches():
    """Narrow shards (halo > shard width) take the all-gather + slice
    fallback in extend(); that branch must stay bit-exact too. W=160 on
    8 devices -> wl=20 < halo=40 for the nscales=2 config."""
    h, w = 48, 160
    halo = flow_halo(WINSIZE, NSCALES, PATCH, 2, SN)
    assert halo > w // 8          # really the fallback branch
    f1, f2 = _scene((2, -1), seed=9, h=h, w=w)
    n = 48
    rng = np.random.RandomState(2)
    pts = np.stack([rng.randint(8, h - 8, n),
                    rng.randint(40, w - 56, n)], -1).astype(np.float32)
    val = jnp.ones((n,), bool)
    _assert_equivalent(jnp.asarray(pts), val, f1, f2, KW,
                       expect_flow=[-2.0, 1.0])


@pytest.mark.skipif(not FULL, reason="set VPP_FULL_TESTS=1 for the "
                    "full-size all-gather-fallback equivalence run")
def test_sharded_flow_matches_single_device_full():
    h, w = 96, 320
    f1, f2 = _scene((3, -2), h=h, w=w)
    n = 120
    pts = jnp.asarray(_pts(n, h=h, w=w))
    val = jnp.ones((n,), bool)
    kw = dict(winsize=9, nscales=3, propagation=2, patchsize=5,
              search_niters=5)
    _assert_equivalent(pts, val, f1, f2, kw, expect_flow=[-3.0, 2.0])


def test_sharded_update_matches_single_device():
    """The COMPLETE sharded tracker step (flow + cull + blockwise
    detection + lifecycle) equals the single-device update, bit-for-bit,
    away from the flow's documented right-margin deviation (margin
    keypoints are killed identically in both paths between steps)."""
    from vpp_tpu.algorithms.video_extruder import (VideoExtruderConfig,
                                                   video_extruder_init,
                                                   video_extruder_update)
    from vpp_tpu.core.keypoints import kp_kill_where
    from vpp_tpu.parallel.sharded_tracker import (
        sharded_video_extruder_update)

    cfg = VideoExtruderConfig(capacity=128, detect_k=64, nscales=NSCALES,
                              winsize=WINSIZE, patchsize=PATCH,
                              keypoint_spacing=10, detector_period=2,
                              detector_th=8)
    mesh = _mesh()
    b = max(3, cfg.winsize)
    f0, f1 = _scene((2, -1), seed=7)
    _, f2 = _scene((4, -2), seed=7)

    def pad(f):
        return from_array(f, border=b, border_mode="mirror")

    def kill_margin(st):
        col = st.keypoints.position[:, 1]
        bad = st.keypoints.alive & ((col < 40) | (col >= W - 56))
        return st.replace(keypoints=kp_kill_where(st.keypoints, bad))

    st_ref = video_extruder_init(cfg)
    st_sh = video_extruder_init(cfg)
    for fr1, fr2 in ((f0, f0), (f0, f1), (f1, f2)):
        st_ref = video_extruder_update(st_ref, pad(fr1), pad(fr2), cfg)
        st_sh = sharded_video_extruder_update(mesh, st_sh, fr1, fr2, cfg)
        np.testing.assert_array_equal(
            np.asarray(st_ref.keypoints.age),
            np.asarray(st_sh.keypoints.age))
        np.testing.assert_array_equal(
            np.asarray(st_ref.keypoints.position),
            np.asarray(st_sh.keypoints.position))
        np.testing.assert_array_equal(np.asarray(st_ref.traj_len),
                                      np.asarray(st_sh.traj_len))
        np.testing.assert_allclose(np.asarray(st_ref.traj),
                                   np.asarray(st_sh.traj))
        st_ref, st_sh = kill_margin(st_ref), kill_margin(st_sh)
    assert int(np.asarray(st_ref.keypoints.alive).sum()) > 50


def test_tracker_comm_report():
    from vpp_tpu.parallel.mesh import tracker_comm_report
    rep = tracker_comm_report(8, 480, 640, halo=80, capacity=4096,
                              spacing=10, ring=8)
    assert rep["owned_cols_per_device"] == 80
    assert rep["halo_ppermute_bytes"] == 2 * 2 * 480 * 80 * 4
    assert rep["total_comm_bytes_per_frame"] == (
        rep["halo_ppermute_bytes"] + rep["flow_psum_bytes"]
        + rep["cull_psum_bytes"] + rep["detect_allgather_bytes"])
    assert rep["ba_psum_bytes_per_iter"] == (8 * 6 * 8 * 6 + 8 * 6 + 1) * 4
