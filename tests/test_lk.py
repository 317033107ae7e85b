"""Pyramidal LK — synthetic end-to-end test in the style of reference
tests/pyrlk.cc:14-45: a small square moves by a known offset; recovered
flow must match."""

import jax.numpy as jnp
import numpy as np

from vpp_tpu.core import from_array
from vpp_tpu.core.keypoints import keypoints_from_positions
from vpp_tpu.algorithms.pyramid import antialiasing_lowpass_filter, pyramid
from vpp_tpu.algorithms.lk import (gradient_pyramid, lk_match_batch,
                                   lucas_kanade, pyrlk_match)


def _blurred_square(shift_r, shift_c, size=100):
    a = np.zeros((size, size), np.float32)
    r0, c0 = 50 + shift_r, 50 + shift_c
    a[r0:r0 + 5, c0:c0 + 5] = 200.0
    img = from_array(jnp.asarray(a), border=3, border_mode="mirror")
    return antialiasing_lowpass_filter(img)


def test_lucas_kanade_recovers_translation():
    i1 = _blurred_square(0, 0)
    i2 = _blurred_square(2, 2)
    kps = jnp.array([[52.0, 52.0]])  # centre of the square
    flow, dist = lucas_kanade(i1, i2, kps, winsize=11, nscales=3)
    f = np.asarray(flow[0])
    assert abs(f[0] - 2.0) < 0.35 and abs(f[1] - 2.0) < 0.35, f
    assert float(dist[0]) < 2.0


def test_lk_match_batch_rejects_textureless():
    i1 = _blurred_square(0, 0)
    i2 = _blurred_square(1, 1)
    grad = gradient_pyramid(pyramid(i1, 1))
    # (10,10) is flat: no gradient → min_ev reject
    flow, err = lk_match_batch(i1, i2, grad[0],
                               jnp.array([[10.0, 10.0]]),
                               jnp.zeros((1, 2)), winsize=11, min_ev=1e-4,
                               niterations=10, convergence_delta=0.1)
    assert float(err[0]) > 1e30


def test_pyrlk_match_moves_and_kills():
    i1 = _blurred_square(0, 0)
    i2 = _blurred_square(2, 2)
    p_prev = pyramid(i1, 3)
    p_next = pyramid(i2, 3)
    p_grad = gradient_pyramid(p_prev)
    kps = keypoints_from_positions(
        jnp.array([[52.0, 52.0], [10.0, 10.0]]),   # corner, flat patch
        jnp.array([True, True]))
    out = pyrlk_match(p_prev, p_grad, p_next, kps, winsize=11, max_err=2.0)
    assert bool(out.alive[0]) and not bool(out.alive[1])
    np.testing.assert_allclose(np.asarray(out.position[0]), [54.0, 54.0],
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(out.velocity[0]), [2.0, 2.0],
                               atol=0.5)


def test_pyrlk_level_kill_semantics(monkeypatch):
    """Control-flow parity with the reference level loop
    (pyrlk_match.hh:32-50): per level, the flow is adopted only when
    err < max_err, but ``dist`` is OVERWRITTEN each level, so the final
    kill tests only the finest level's residual — a coarse-level failure
    alone must not kill the keypoint."""
    import vpp_tpu.algorithms.lk as lkmod

    # three levels; per-keypoint err schedule (coarsest..finest):
    #  kp0: fails coarse, succeeds after -> must SURVIVE (flow from fine)
    #  kp1: succeeds coarse+mid, fails finest -> must DIE
    errs = {2: jnp.asarray([9.0, 0.1]),
            1: jnp.asarray([0.1, 0.1]),
            0: jnp.asarray([0.1, 9.0])}
    flows = {2: jnp.asarray([[8.0, 8.0], [1.0, 1.0]]),
             1: jnp.asarray([[1.0, 1.0], [1.0, 1.0]]),
             0: jnp.asarray([[2.0, 2.0], [1.0, 1.0]])}
    shapes = {100: 0, 51: 1, 26: 2}   # level image height -> level id

    def stub(A, B, Ag, p, tr, **kw):
        s = shapes[A.shape[0]]
        return flows[s], errs[s]

    monkeypatch.setattr(lkmod, "lk_match_batch", stub)

    i1 = _blurred_square(0, 0)
    pyr = pyramid(i1, 3, border=5)
    gpyr = gradient_pyramid(pyr)
    kps = keypoints_from_positions(
        jnp.asarray([[50.0, 50.0], [50.0, 50.0]]),
        jnp.asarray([True, True]))
    out = pyrlk_match(pyr, gpyr, pyr, kps, max_err=2.0)

    # scalar transcription of the reference loop for kp0:
    # tr=0; S=2: err 9 -> not adopted, dist=9; S=1: adopt (tr=flow=1,1),
    # dist=.1; S=0: adopt (tr=2,2), dist=.1 -> dist<=max_err -> survives
    assert bool(out.alive[0]), "coarse-level failure must not kill"
    np.testing.assert_allclose(np.asarray(out.position[0]), [52.0, 52.0])
    # kp1 fails at the finest level -> dist=9 -> killed
    assert not bool(out.alive[1]), "finest-level failure must kill"


def test_oriented_lk_axis_aligned_matches_plain():
    """With match directions (0,1) the rotated window is a row-flip of the
    square window — identical sample set, so oriented LK must reproduce
    plain LK exactly (lk.hh:178-317 vs lk.hh:40-175)."""
    from vpp_tpu.algorithms.lk import oriented_lk_match_batch
    from vpp_tpu.algorithms.scharr import scharr

    i1 = _blurred_square(0, 0)
    i2 = _blurred_square(2, 1)
    g = scharr(i1)
    p = jnp.array([[52.0, 52.0], [51.0, 53.0]])
    pred = jnp.zeros((2, 2), jnp.float32)
    dirs = jnp.broadcast_to(jnp.array([0.0, 1.0]), (2, 2))
    kw = dict(winsize=11, min_ev=1e-4, niterations=15,
              convergence_delta=0.01)
    f0, e0 = lk_match_batch(i1, i2, g, p, pred, **kw)
    f1, e1 = oriented_lk_match_batch(i1, i2, g, p, pred,
                                     match_direction1=dirs,
                                     match_direction2=dirs,
                                     max_step_norm=100.0, **kw)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1),
                               rtol=1e-4, atol=1e-4)


def test_oriented_lk_step_clamp_limits_travel():
    """max_step_norm bounds per-iteration travel (lk.hh:280-284)."""
    from vpp_tpu.algorithms.lk import oriented_lk_match_batch
    from vpp_tpu.algorithms.scharr import scharr

    i1 = _blurred_square(0, 0)
    i2 = _blurred_square(4, 4)
    g = scharr(i1)
    p = jnp.array([[52.0, 52.0]])
    pred = jnp.zeros((1, 2), jnp.float32)
    dirs = jnp.array([[0.0, 1.0]])
    flow, _ = oriented_lk_match_batch(
        i1, i2, g, p, pred, match_direction1=dirs, match_direction2=dirs,
        winsize=11, min_ev=1e-4, niterations=3, convergence_delta=0.01,
        max_step_norm=0.5)
    # 3 iterations x max 0.5 px => at most 1.5 px of travel
    assert float(jnp.linalg.norm(flow[0])) <= 1.5 + 1e-5
