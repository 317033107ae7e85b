"""Image-space Hough track rendering (the hough_extruder paint subtree)."""

import numpy as np
import jax.numpy as jnp

from vpp_tpu.core import from_array
from vpp_tpu.algorithms.hough import hough_accumulator, hough_top_k
from vpp_tpu.algorithms.hough_tracker import (HoughTrackerConfig,
                                              HoughTrackerState,
                                              hough_tracker_init,
                                              hough_tracker_update)
from vpp_tpu.draw.hough_paint import (draw_line_tracks, paint_hough_video,
                                      track_support_points)

H, W = 96, 128


def _line_img(col=60, val=255.0):
    a = np.zeros((H, W), np.float32)
    a[:, col] = val
    return from_array(jnp.asarray(a), border=3, border_mode="zero")


def _tracked_state(cols=(60,)):
    cfg = HoughTrackerConfig(capacity=8, m_first_lines=4,
                             acc_threshold=10.0, grad_threshold=40.0)
    st = hough_tracker_init(cfg)
    for i, c in enumerate([cols[0] - 2, cols[0] - 1] + list(cols)):
        st, _ = hough_tracker_update(st, _line_img(col=c), cfg)
    return st, cfg


def test_track_support_points_on_line():
    img = _line_img()
    acc = hough_accumulator(img, grad_threshold=40.0)
    pk = hough_top_k(acc, 1)
    pts, ok = track_support_points(
        img, pk.theta_idx.astype(jnp.float32),
        pk.rho_idx.astype(jnp.float32), jnp.array([True]), k=32)
    okn = np.asarray(ok[0])
    assert okn.sum() >= 16
    # support points hug the vertical line's edge columns
    cols = np.asarray(pts[0])[okn][:, 1]
    assert np.all(np.abs(cols - 60) <= 2), cols


def test_paint_decays_and_paints():
    st, cfg = _tracked_state()
    acc_shape = (cfg.t_theta,
                 int(np.ceil(np.sqrt(H * H + W * W))))
    paint = jnp.zeros((H, W, 4), jnp.float32).at[..., 3].set(200.0)
    out = paint_hough_video(paint, st, acc_shape)
    out = np.asarray(out)
    # global alpha decay applies everywhere that was not repainted
    far = out[:, :20, 3]
    np.testing.assert_allclose(far, 200.0 * 0.97, rtol=1e-5)
    assert int(np.asarray(st.age > 0).sum()) >= 1
    # a moving track paints near its line (its recent columns)
    painted = (out[..., 3] > 200) | (out[..., :3].sum(-1) > 0)
    band = painted[:, 55:66]
    assert band.any()


def test_draw_line_tracks_renders_segment():
    st, cfg = _tracked_state()
    acc_shape = (cfg.t_theta, int(np.ceil(np.sqrt(H * H + W * W))))
    frame = jnp.zeros((H, W, 3), jnp.uint8)
    out = np.asarray(draw_line_tracks(frame, st, acc_shape))
    assert out.dtype == np.uint8
    # the live track's near-vertical line gets coloured pixels in-band
    band = out[:, 55:66].astype(np.int32).sum()
    assert band > 0
    # nothing painted far away
    assert out[:, :30].sum() == 0
