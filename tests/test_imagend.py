"""imageNd / image3d container tests — the invariants of reference
tests/imageNd.cc and tests/image3d.cc (geometry, subimage aliasing
semantics, interpolation) restated functionally."""

import numpy as np
import jax.numpy as jnp

from vpp_tpu.core import (BoxNd, ImageNd, from_array_nd, image3d, imagend,
                          make_box3d, make_boxNd)


def test_image3d_geometry():
    # image3d(10, 20, 30): nslices/nrows/ncols (tests/image3d.cc)
    img1 = image3d(10, 20, 30, dtype=jnp.int32)
    img2 = imagend((10, 20, 30), dtype=jnp.int32)
    assert img1.domain() == img2.domain()
    assert img1.shape == (10, 20, 30)
    assert img1.domain().shape == (10, 20, 30)


def test_image3d_content_and_subimage():
    s, r, c = np.meshgrid(np.arange(6), np.arange(7), np.arange(8),
                          indexing="ij")
    vals = (s * r * c).astype(np.int32)
    img = from_array_nd(jnp.asarray(vals))
    # img(s, r, c) == s*r*c
    assert int(img(3, 4, 5)) == 3 * 4 * 5
    # subimage: s1(i,j,k) == img(p1 + (i,j,k))  (tests/image3d.cc)
    box = BoxNd((2, 3, 4), (5, 6, 7))
    sub = img | box
    assert sub.shape == (4, 4, 4)
    for off in [(0, 0, 0), (0, 1, 1), (1, 1, 1), (2, 2, 2)]:
        assert int(sub(*off)) == int(img(2 + off[0], 3 + off[1],
                                         4 + off[2]))


def test_imagend_border_and_shift():
    a = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    img = from_array_nd(a, border=1, border_mode="closest")
    assert img.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(img.interior), np.asarray(a))
    # shifted view reads into the closest-filled border
    sh = img.shifted(0, 0, -1)
    np.testing.assert_array_equal(np.asarray(sh[:, :, 1:]),
                                  np.asarray(a[:, :, :-1]))
    np.testing.assert_array_equal(np.asarray(sh[:, :, 0]),
                                  np.asarray(a[:, :, 0]))


def test_imagend_trilinear_interpolation():
    # 2x2x2 corner cube: value at the centre is the mean of the corners
    vals = np.zeros((2, 2, 2), np.float32)
    vals[1, 1, 1] = 8.0
    img = from_array_nd(jnp.asarray(vals))
    centre = img.linear_interpolate(jnp.asarray([0.5, 0.5, 0.5]))
    assert abs(float(centre) - 1.0) < 1e-6      # 8/2^3
    corner = img.linear_interpolate(jnp.asarray([1.0, 1.0, 1.0]))
    assert abs(float(corner) - 8.0) < 1e-6


def test_boxnd_grow_shrink_has():
    b = make_box3d(4, 5, 6)
    assert b.shape == (4, 5, 6)
    g = b.grow(2)
    assert g.p1 == (-2, -2, -2) and g.shape == (8, 9, 10)
    assert g.shrink(2) == b
    assert b.has((0, 0, 0)) and b.has((3, 4, 5))
    assert not b.has((4, 0, 0))
    assert make_boxNd((4, 5, 6)) == b
