"""Pyramid / Scharr / LBP / FAST9 vs scalar NumPy references — the
reference repo's test pattern (synthetic images, algebraic invariants)."""

import jax.numpy as jnp
import numpy as np

from vpp_tpu.core import from_array
from vpp_tpu.algorithms.pyramid import (antialiasing_lowpass_filter,
                                        level_shapes, pyramid, subsample2)
from vpp_tpu.algorithms.scharr import scharr, scharr_point
from vpp_tpu.algorithms.lbp import lbp_hamming_distance, lbp_transform
from vpp_tpu.algorithms.fast import (blockwise_maxima_filter, fast9,
                                     fast9_detect, fast9_score,
                                     local_maxima_filter, select_keypoints,
                                     fast9_score_image, CIRCLE)


def _img(arr, border=3):
    return from_array(jnp.asarray(arr), border=border, border_mode="mirror")


# --- pyramid -----------------------------------------------------------------

def _ref_lowpass(a):
    """Scalar binomial 1-4-6-4-1/16, cols then rows, mirror border."""
    k = np.array([1, 4, 6, 4, 1], np.float64) / 16
    p = np.pad(a.astype(np.float64), 2, mode="symmetric")
    tmp = sum(k[i] * p[2:-2, i:i + a.shape[1]] for i in range(5))
    p2 = np.pad(tmp, 2, mode="symmetric")
    out = sum(k[i] * p2[i:i + a.shape[0], 2:-2] for i in range(5))
    return out


def test_lowpass_matches_scalar_reference():
    rng = np.random.RandomState(1)
    a = rng.rand(16, 20).astype(np.float32)
    out = antialiasing_lowpass_filter(_img(a)).to_numpy()
    np.testing.assert_allclose(out, _ref_lowpass(a), rtol=1e-5)


def test_lowpass_integer_division():
    a = np.full((8, 8), 17, np.int32)
    out = antialiasing_lowpass_filter(_img(a)).to_numpy()
    # constant image: sum = 17*16, //16 = 17 exactly
    np.testing.assert_array_equal(out, 17)


def test_level_shapes_reference_formula():
    # pyramid.hh:136-158: next = 1 + n // factor
    assert level_shapes((100, 200), 3) == ((100, 200), (51, 101), (26, 51))


def test_subsample2_even_sites():
    a = np.arange(100, dtype=np.float32).reshape(10, 10)
    out = subsample2(_img(a, border=2), out_shape=(5, 5)).to_numpy()
    np.testing.assert_array_equal(out, a[::2, ::2])


def test_pyramid_constant_preserved():
    a = np.full((32, 40), 9.0, np.float32)
    pyr = pyramid(_img(a), nlevels=3)
    for lvl in pyr.levels:
        np.testing.assert_allclose(lvl.to_numpy(), 9.0, rtol=1e-6)
    assert pyr[1].shape == (17, 21)


# --- scharr ------------------------------------------------------------------

def test_scharr_linear_ramp():
    # f(r,c) = 2r + 3c → gradient (2, 3) everywhere in the interior
    r, c = np.meshgrid(np.arange(12), np.arange(14), indexing="ij")
    a = (2.0 * r + 3.0 * c).astype(np.float32)
    g = scharr(from_array(jnp.asarray(a), border=1, border_mode="closest"))
    gn = g.to_numpy()
    np.testing.assert_allclose(gn[2:-2, 2:-2, 0], 2.0, atol=1e-4)
    np.testing.assert_allclose(gn[2:-2, 2:-2, 1], 3.0, atol=1e-4)


def test_scharr_point_matches_full():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 255, (9, 9)).astype(np.float32)
    img = _img(a, border=1)
    full = scharr(img).to_numpy()
    pt = np.asarray(scharr_point(img, (4, 5)))
    np.testing.assert_allclose(pt, full[4, 5], rtol=1e-5)


# --- lbp ---------------------------------------------------------------------

def test_lbp_hand_computed():
    # centre 5; neighbours > 5 set their bit (lbp_transform.hh:20-33)
    a = np.array([[9, 1, 9],
                  [1, 5, 9],
                  [9, 1, 1]], np.float32)
    code = lbp_transform(_img(a, border=1)).to_numpy()[1, 1]
    # offsets: (-1,-1)b0 9>5, (-1,0)b1 1<5, (-1,1)b2 9>5, (0,-1)b3 1,
    # (0,1)b4 9>5, (1,-1)b5 9>5, (1,0)b6 1, (1,1)b7 1
    expect = (1 << 0) | (1 << 2) | (1 << 4) | (1 << 5)
    assert int(code) == expect


def test_lbp_hamming():
    assert int(lbp_hamming_distance(np.uint8(0b1010), np.uint8(0b0101))) == 4
    assert int(lbp_hamming_distance(np.uint8(255), np.uint8(255))) == 0


# --- fast9 -------------------------------------------------------------------

def _ref_fast9(a, th):
    """Scalar FAST9: 9 contiguous circle points all brighter/darker."""
    h, w = a.shape
    out = np.zeros((h, w), bool)
    for r in range(3, h - 3):
        for c in range(3, w - 3):
            v = int(a[r, c])
            br = [int(a[r + dr, c + dc]) > v + th for dr, dc in CIRCLE]
            dk = [int(a[r + dr, c + dc]) < v - th for dr, dc in CIRCLE]
            for flags in (br, dk):
                f2 = flags + flags
                if any(all(f2[s:s + 9]) for s in range(16)):
                    out[r, c] = True
    return out


def _ref_fast9_score(a, th):
    h, w = a.shape
    out = np.zeros((h, w), np.int32)
    for r in range(3, h - 3):
        for c in range(3, w - 3):
            v = int(a[r, c])
            sup = sum(int(a[r + dr, c + dc]) - v - 0
                      for dr, dc in CIRCLE
                      if int(a[r + dr, c + dc]) - v > th)
            inf = sum(v - int(a[r + dr, c + dc])
                      for dr, dc in CIRCLE
                      if int(a[r + dr, c + dc]) - v < -th)
            out[r, c] = max(sup, inf)
    return out


def test_fast9_matches_scalar_reference():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 255, (24, 24)).astype(np.int32)
    mask = np.asarray(fast9_detect(_img(a), 20))
    ref = _ref_fast9(a, 20)
    # compare away from the mirror-border margin
    np.testing.assert_array_equal(mask[3:-3, 3:-3], ref[3:-3, 3:-3])
    assert ref[3:-3, 3:-3].sum() > 0, "test image should contain corners"


def test_fast9_score_matches_scalar_reference():
    rng = np.random.RandomState(4)
    a = rng.randint(0, 255, (16, 16)).astype(np.int32)
    s = np.asarray(fast9_score(_img(a), 10))
    ref = _ref_fast9_score(a, 10)
    np.testing.assert_array_equal(s[3:-3, 3:-3], ref[3:-3, 3:-3])


def test_fast9_bright_blob_detected():
    a = np.zeros((20, 20), np.int32)
    a[9:12, 9:12] = 200
    pos, score, valid = fast9(_img(a), 20, k=16)
    assert int(valid.sum()) > 0
    pts = np.asarray(pos)[np.asarray(valid)]
    assert all(7 <= r <= 13 and 7 <= c <= 13 for r, c in pts)


def test_local_maxima_filter():
    s = np.zeros((10, 10), np.uint8)
    s[4, 4] = 10
    s[4, 5] = 8  # suppressed by (4,4)
    s[8, 8] = 3
    out = local_maxima_filter(from_array(jnp.asarray(s), border=1)).to_numpy()
    assert out[4, 4] == 10 and out[4, 5] == 0 and out[8, 8] == 3


def test_blockwise_maxima_keeps_one_per_block():
    s = np.zeros((10, 10), np.uint8)
    s[1, 1] = 5
    s[2, 3] = 9   # same block as (1,1) → wins
    s[6, 6] = 4
    out = blockwise_maxima_filter(from_array(jnp.asarray(s), border=1),
                                  5).to_numpy()
    assert out[2, 3] == 9 and out[1, 1] == 0 and out[6, 6] == 4


def test_select_keypoints_budget_and_order():
    s = np.zeros((8, 8), np.uint8)
    s[1, 1] = 5
    s[2, 2] = 9
    s[3, 3] = 7
    pos, score, valid = select_keypoints(from_array(jnp.asarray(s)), 2)
    assert int(valid.sum()) == 2
    np.testing.assert_array_equal(np.asarray(pos[0]), [2, 2])
    np.testing.assert_array_equal(np.asarray(pos[1]), [3, 3])


def test_fast9_mask_blocks_detection():
    a = np.zeros((20, 20), np.int32)
    a[9:12, 9:12] = 200
    mask = np.zeros((20, 20), np.uint8)  # all masked out
    s = fast9_score_image(_img(a), 20, mask=jnp.asarray(mask))
    assert int(s.interior.sum()) == 0


def test_fast9_score_at_matches_score_image():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 255, (40, 60)).astype(np.int32)
    img = _img(a)
    from vpp_tpu.algorithms.fast import fast9_score_at
    pts = np.stack([rng.randint(0, 40, 64),
                    rng.randint(0, 60, 64)], axis=-1).astype(np.int32)
    per_kp = np.asarray(fast9_score_at(img, jnp.asarray(pts), 10))
    full = np.asarray(fast9_score(img, 10))
    np.testing.assert_array_equal(per_kp, full[pts[:, 0], pts[:, 1]])


def test_fast9_blockwise_matches_filter_plus_select():
    """The fused blockwise top-K extracts the same keypoint set as the
    scatter-back formulation (order may differ for equal scores)."""
    rng = np.random.RandomState(5)
    a = rng.randint(0, 255, (48, 64)).astype(np.int32)
    img = _img(a)
    pos, score, valid = fast9(img, 10, k=64, blockwise=True, block_size=8)
    s = fast9_score_image(img, 10)
    s = blockwise_maxima_filter(s, 8)
    pos2, score2, valid2 = select_keypoints(s, 64)
    got = {(int(r), int(c), int(sc)) for (r, c), sc, v in
           zip(np.asarray(pos), np.asarray(score), np.asarray(valid)) if v}
    want = {(int(r), int(c), int(sc)) for (r, c), sc, v in
            zip(np.asarray(pos2), np.asarray(score2), np.asarray(valid2))
            if v}
    assert got == want


def test_chamfer_doubling_equals_sweeps_bitwise():
    """The TPU-native log-doubling chamfer must equal the reference-shaped
    two-raster-sweep recurrence BITWISE (all values are small integers in
    f32) for every metric instance."""
    from vpp_tpu.algorithms.distance_transform import (
        chamfer_distance_transform)
    rng = np.random.RandomState(3)
    # d5_7_11 also runs the thin-image edge case (its knight moves scale
    # past the row extent during doubling)
    for metric, shapes in (("d4", [((37, 53), 0.01)]),
                           ("d8", [((37, 53), 0.01)]),
                           ("d3_4", [((37, 53), 0.01)]),
                           ("d5_7_11", [((37, 53), 0.01),
                                        ((7, 90), 0.02)])):
        for shape, p in shapes:
            m = rng.rand(*shape) < p
            if not m.any():
                m[3, 5] = True
            a = chamfer_distance_transform(jnp.asarray(m), metric,
                                           method="sweeps")
            b = chamfer_distance_transform(jnp.asarray(m), metric,
                                           method="doubling")
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
