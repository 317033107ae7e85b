"""Loop-construct and expression semantics — mirrors reference
tests/pixel_wise.cc, block_wise.cc, sum.cc, window.cc, liie.cc."""

import jax.numpy as jnp
import numpy as np

from vpp_tpu.core import from_array, make_box2d
from vpp_tpu.ops import (C4, C8, C9, P1, P2, V, argmax, argmin, avg,
                         block_wise, evaluate, if_, max_, min_, pixel_wise,
                         relative_access, row_wise, scan_bottom_to_top,
                         scan_left_to_right, scan_right_to_left,
                         scan_top_to_bottom, sum_, sum_of, window_stack,
                         rgb_to_graylevel, graylevel_to_rgb, hsv_to_rgb)


def _img(arr, border=0, mode="zero"):
    return from_array(jnp.asarray(arr), border=border, border_mode=mode)


# --- pixel_wise --------------------------------------------------------------

def test_pixel_wise_add():
    a = _img(np.arange(12, dtype=np.float32).reshape(3, 4))
    b = _img(np.ones((3, 4), np.float32))
    out = pixel_wise(a, b) | (lambda x, y: x + y)
    np.testing.assert_array_equal(out.to_numpy(),
                                  np.arange(12).reshape(3, 4) + 1)


def test_pixel_wise_coords():
    box = make_box2d(3, 4)
    out = pixel_wise(box) | (lambda p: p[0] * 10 + p[1])
    expect = np.add.outer(np.arange(3) * 10, np.arange(4))
    np.testing.assert_array_equal(out.to_numpy(), expect)


def test_pixel_wise_stencil():
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    img = _img(arr, border=1, mode="zero")
    out = pixel_wise(relative_access(img)) | (
        lambda n: n(0, -1) + n(0, 1) + n(-1, 0) + n(1, 0))
    expect = np.zeros_like(arr)
    padded = np.pad(arr, 1)
    expect = (padded[1:-1, :-2] + padded[1:-1, 2:] + padded[:-2, 1:-1]
              + padded[2:, 1:-1])
    np.testing.assert_array_equal(out.to_numpy(), expect)


def test_block_wise_scalar_per_block():
    arr = np.arange(64, dtype=np.float32).reshape(8, 8)
    img = _img(arr)
    sums = block_wise((4, 4), img) | (
        lambda blk, valid: jnp.sum(jnp.where(valid, blk, 0)))
    expect = arr.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).sum(axis=(2, 3))
    np.testing.assert_array_equal(np.asarray(sums), expect)


def test_block_wise_ragged_edges():
    arr = np.ones((5, 7), np.float32)
    img = _img(arr)
    counts = block_wise((4, 4), img) | (
        lambda blk, valid: jnp.sum(jnp.where(valid, blk, 0)))
    np.testing.assert_array_equal(np.asarray(counts),
                                  [[16, 12], [4, 3]])


def test_block_wise_image_output():
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    img = _img(arr)
    out = block_wise((2, 2), img) | (lambda blk, valid: blk * 2)
    np.testing.assert_array_equal(out.to_numpy(), arr * 2)


def test_row_wise():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    sums = row_wise(_img(arr)) | (lambda row: jnp.sum(row))
    np.testing.assert_array_equal(np.asarray(sums), arr.sum(axis=1))


# --- directional scans (pixel_wise.cc:33-61 traversal contracts) -------------

def test_scan_left_to_right_column_index():
    # recurrence o = o(left) + 1 starting at -1 → o == column index
    arr = np.zeros((3, 5), np.float32)

    def fn(carry, col):
        out = carry + 1
        return out, out

    _, out = scan_left_to_right(fn, jnp.full((3,), -1.0), _img(arr))
    expect = np.tile(np.arange(5, dtype=np.float32), (3, 1))
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_scan_right_to_left_reverse_index():
    def fn(carry, col):
        out = carry + 1
        return out, out

    _, out = scan_right_to_left(fn, jnp.full((3,), -1.0),
                                _img(np.zeros((3, 5), np.float32)))
    expect = np.tile(np.arange(4, -1, -1, dtype=np.float32), (3, 1))
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_scan_top_to_bottom_prefix_sum():
    arr = np.ones((4, 3), np.float32)

    def fn(carry, row):
        s = carry + row
        return s, s

    _, out = scan_top_to_bottom(fn, jnp.zeros((3,)), _img(arr))
    expect = np.cumsum(arr, axis=0)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_scan_bottom_to_top():
    arr = np.ones((4, 3), np.float32)

    def fn(carry, row):
        s = carry + row
        return s, s

    _, out = scan_bottom_to_top(fn, jnp.zeros((3,)), _img(arr))
    expect = np.cumsum(arr[::-1], axis=0)[::-1]
    np.testing.assert_array_equal(np.asarray(out), expect)


# --- reductions (sum.cc pattern) ---------------------------------------------

def test_reductions():
    arr = np.arange(12, dtype=np.int32).reshape(3, 4)
    img = _img(arr, border=2)  # border must not pollute reductions
    assert int(sum_(img)) == arr.sum()
    assert int(min_(img)) == 0
    assert int(max_(img)) == 11
    np.testing.assert_allclose(float(avg(img)), arr.mean())
    np.testing.assert_array_equal(np.asarray(argmin(img)), [0, 0])
    np.testing.assert_array_equal(np.asarray(argmax(img)), [2, 3])


# --- windows (window.cc) -----------------------------------------------------

def test_window_offsets():
    assert len(C4) == 4 and len(C8) == 8 and len(C9) == 9
    assert (0, 0) not in C4 and (0, 0) not in C8 and (0, 0) in C9


def test_window_stack_erosion():
    arr = np.full((4, 4), 9.0, np.float32)
    arr[2, 2] = 1.0
    img = _img(arr, border=1, mode="closest")
    eroded = window_stack(img, C9).min(axis=0)
    assert np.asarray(eroded)[2, 2] == 1.0
    assert np.asarray(eroded)[1, 1] == 1.0
    assert np.asarray(eroded)[0, 0] == 9.0


# --- LIIE expression language (liie.cc capability) ---------------------------

def test_expr_eval():
    A = _img(np.arange(6, dtype=np.float32).reshape(2, 3))
    B = _img(np.ones((2, 3), np.float32))
    out = evaluate(P1 + 2 * P2, A, B)
    np.testing.assert_array_equal(out.to_numpy(),
                                  np.arange(6).reshape(2, 3) + 2)


def test_expr_value_of_and_if():
    A = _img(np.arange(6, dtype=np.float32).reshape(2, 3))
    out = evaluate(if_(V(A) > 2)(1.0)(0.0))
    np.testing.assert_array_equal(out.to_numpy(),
                                  (np.arange(6).reshape(2, 3) > 2) * 1.0)


def test_expr_global_reduction():
    A = _img(np.arange(6, dtype=np.float32).reshape(2, 3))
    assert float(evaluate(sum_of(P1 * P1), A)) == float((np.arange(6) ** 2).sum())


# --- colorspace (colorspace_conversions.cc) ----------------------------------

def test_rgb_to_graylevel_roundtrip():
    rgb = np.zeros((2, 2, 3), np.int32)
    rgb[0, 0] = [30, 60, 90]
    img = _img(rgb)
    gray = rgb_to_graylevel(img)
    assert int(gray.interior[0, 0]) == 60
    back = graylevel_to_rgb(gray)
    assert back.data.shape == (2, 2, 3)
    np.testing.assert_array_equal(np.asarray(back.data[0, 0]), [60, 60, 60])


def test_hsv_to_rgb_primaries():
    np.testing.assert_array_equal(np.asarray(hsv_to_rgb(0, 1.0, 1.0)),
                                  [255, 0, 0])
    np.testing.assert_array_equal(np.asarray(hsv_to_rgb(120, 1.0, 1.0)),
                                  [0, 255, 0])
    np.testing.assert_array_equal(np.asarray(hsv_to_rgb(240, 1.0, 1.0)),
                                  [0, 0, 255])
