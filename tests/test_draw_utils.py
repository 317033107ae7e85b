"""Tests: draw primitives + profiler."""

import numpy as np
import jax.numpy as jnp

from vpp_tpu.core import from_array
from vpp_tpu.draw import draw_line, draw_square, draw_trajectories, \
    plot_color
from vpp_tpu.utils import Profiler


def test_plot_color_blend_and_clip():
    img = from_array(jnp.zeros((10, 10, 3), jnp.float32))
    pts = jnp.array([[2, 3], [50, 50], [-1, 0]])    # 2 out of bounds
    out = plot_color(img, pts, (255, 0, 0))
    a = np.asarray(out.data)
    assert tuple(a[2, 3]) == (255, 0, 0)
    assert a.sum() == 255.0                          # only one pixel touched
    # alpha blending
    out2 = plot_color(out, jnp.array([[2, 3]]), (0, 255, 0),
                      alpha=jnp.array([0.5]))
    assert np.allclose(np.asarray(out2.data)[2, 3], [127.5, 127.5, 0])


def test_draw_line_covers_bresenham_pixels():
    img = from_array(jnp.zeros((16, 16), jnp.float32))
    out = draw_line(img, (2, 2), (2, 12), 7.0)
    a = np.asarray(out.data)
    assert (a[2, 2:13] == 7.0).all()
    assert a.sum() == 7.0 * 11
    # diagonal hits every row and column once
    out2 = draw_line(img, (0, 0), (15, 15), 1.0)
    d = np.asarray(out2.data)
    assert np.trace(d) == 16.0 and d.sum() == 16.0


def test_draw_square():
    img = from_array(jnp.zeros((12, 12), jnp.float32))
    filled = np.asarray(draw_square(img, (5, 5), 2, 3.0).data)
    assert (filled[3:8, 3:8] == 3.0).all() and filled.sum() == 3.0 * 25
    outline = np.asarray(draw_square(img, (5, 5), 2, 3.0,
                                     fill=False).data)
    assert outline.sum() == 3.0 * 16 and outline[5, 5] == 0


def test_draw_trajectories_runs():
    img = from_array(jnp.zeros((32, 32, 3), jnp.float32))
    traj = jnp.zeros((4, 5, 2), jnp.float32)
    traj = traj.at[0].set(jnp.array([[5., 5.], [5., 9.], [5., 13.],
                                     [0., 0.], [0., 0.]]))
    out = draw_trajectories(img, traj, jnp.array([3, 0, 0, 0]),
                            jnp.array([True, False, False, False]))
    a = np.asarray(out.data)
    assert a[5, 5:14].sum() > 0          # track rendered
    assert a[20:].sum() == 0             # dead tracks not rendered


def test_profiler_tree_report():
    import time
    prof = Profiler()
    with prof("frame"):
        with prof("inner"):
            time.sleep(0.01)
        with prof("inner"):
            time.sleep(0.01)
    rep = prof.report()
    assert "frame" in rep and "inner" in rep
    node = prof.root.children["frame"].children["inner"]
    assert node.ncalls == 2
    assert node.duration >= 0.02
