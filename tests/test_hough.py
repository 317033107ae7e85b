"""Tests: dense Hough transform, peaks, UKF, hough line tracker —
synthetic lines with known (ρ, θ), algebraic filter invariants."""

import numpy as np
import jax.numpy as jnp

from vpp_tpu.core import from_array
from vpp_tpu.algorithms.hough import (accumulator_to_lines,
                                      hough_accumulator, hough_lines,
                                      hough_peaks, hough_top_k,
                                      line_endpoints, sobel_gradients)
from vpp_tpu.algorithms.ukf import (ukf_init,
                                    ukf_predict_update_rho_theta)
from vpp_tpu.algorithms.hough_tracker import (HoughTrackerConfig,
                                              hough_tracker_init,
                                              hough_tracker_update)


def _line_image(h=96, w=128, row=40, thickness=2, value=200.0):
    """Horizontal bright band on dark background -> θ = π/2, ρ = row."""
    a = np.zeros((h, w), np.float32)
    a[row:row + thickness] = value
    return from_array(jnp.asarray(a), border=3, border_mode="mirror")


def test_sobel_on_step_edge():
    img = _line_image()
    gy, gx = sobel_gradients(img)
    gy = np.asarray(gy)
    gx = np.asarray(gx)
    # horizontal edge: gy strong at the band edges, gx ~ 0 inside
    assert np.abs(gy[39:43]).max() > 100
    assert np.abs(gx[:, 5:-5]).max() == 0


def test_hough_detects_horizontal_line():
    img = _line_image(row=40)
    acc = hough_accumulator(img, t_theta=181, grad_threshold=40.0)
    peaks = hough_peaks(acc, 2)
    theta, rho = accumulator_to_lines(peaks, acc.shape, img.shape)
    th0 = float(theta[0])
    rho0 = float(rho[0])
    # normal of a horizontal line points vertically: θ ≈ π/2
    assert abs(th0 - np.pi / 2) < 0.1
    # ρ = y for a horizontal line at that row (edges at 39.5/41.5)
    assert abs(rho0 - 40.5) < 3.0


def test_hough_two_lines_exclusion():
    h, w = 96, 128
    a = np.zeros((h, w), np.float32)
    a[30:32] = 200.0
    a[70:72] = 200.0
    img = from_array(jnp.asarray(a), border=3, border_mode="mirror")
    peaks, theta, rho, acc = hough_lines(img, 2, t_theta=181,
                                         exclusion_rho=15)
    rhos = sorted(float(r) for r in np.asarray(rho))
    assert abs(rhos[0] - 31) < 4 and abs(rhos[1] - 71) < 4
    # top_k without exclusion collapses onto the stronger ridge cells
    tk = hough_top_k(acc, 2)
    assert np.asarray(tk.votes).min() > 0


def test_line_endpoints_on_line():
    theta = jnp.array([np.pi / 2])
    rho = jnp.array([40.0])
    p1, p2 = line_endpoints(theta, rho, (96, 128))
    p1 = np.asarray(p1)[0]
    p2 = np.asarray(p2)[0]
    # both endpoints lie on y = 40
    assert abs(p1[0] - 40) < 1e-4 and abs(p2[0] - 40) < 1e-4


def test_ukf_converges_to_static_measurement():
    st = ukf_init(jnp.array([10.0, 0.5, 0, 0, 0]))
    z = jnp.array([20.0, 1.0])
    for _ in range(60):
        st = ukf_predict_update_rho_theta(st, z, 1.0)
    # steady-state convergence toward the constant measurement
    assert abs(float(st.x[0]) - 20.0) < 1.5
    assert abs(float(st.x[1]) - 1.0) < 0.15
    # covariance stays symmetric positive-ish
    P = np.asarray(st.P)
    assert np.allclose(P, P.T, atol=1e-3)


def test_hough_tracker_tracks_moving_line():
    cfg = HoughTrackerConfig(t_theta=181, m_first_lines=4, capacity=8,
                             acc_threshold=10.0)
    st = hough_tracker_init(cfg)
    rows = [40, 42, 44, 46]
    for r in rows:
        img = _line_image(row=r)
        st, peaks = hough_tracker_update(st, img, cfg)
    age = np.asarray(st.age)
    assert age.max() >= len(rows)          # one track survived all frames
    i = int(age.argmax())
    # the surviving track follows the moving line (ρ grows with the row)
    t_theta, rho_bins = 181, int(np.ceil(np.hypot(96, 128)))
    diag = np.hypot(96, 128)
    rho_pix = float(st.rho[i]) * 2 * diag / (rho_bins - 1) - diag
    assert abs(rho_pix - 47) < 5
    assert int(st.traj_n[i]) >= 3


def test_hough_tracker_coasts_and_dies():
    cfg = HoughTrackerConfig(t_theta=181, m_first_lines=2, capacity=4,
                             acc_threshold=10.0,
                             max_frames_without_update=2)
    st = hough_tracker_init(cfg)
    st, _ = hough_tracker_update(st, _line_image(row=40), cfg)
    assert np.asarray(st.age).max() == 1
    blank = from_array(jnp.zeros((96, 128), jnp.float32), border=3)
    st, _ = hough_tracker_update(st, blank, cfg)
    assert np.asarray(st.age).max() == 2   # coasting
    st, _ = hough_tracker_update(st, blank, cfg)
    st, _ = hough_tracker_update(st, blank, cfg)
    assert np.asarray(st.age).max() == 0   # died after the budget


def test_hough_peaks_clustered_two_lines():
    """Clustered local-maxima peaks (Hough_Lines_Parallel_Kmeans
    capability) find both lines and suppress in-window duplicates."""
    from vpp_tpu.algorithms.hough import hough_peaks_clustered
    h, w = 96, 128
    a = np.zeros((h, w), np.float32)
    a[30:32] = 200.0
    a[70:72] = 200.0
    img = from_array(jnp.asarray(a), border=3, border_mode="mirror")
    acc = hough_accumulator(img, t_theta=181, grad_threshold=40.0)
    peaks = hough_peaks_clustered(acc, 6, threshold=10.0)
    theta, rho = accumulator_to_lines(peaks, acc.shape, img.shape)
    got = sorted(float(r) for r, v in zip(rho, peaks.valid) if v)
    # both bands found (each contributes edges near rows 30 and 70),
    # no two peaks within the suppression window of each other
    assert any(abs(g - 30.5) < 4 for g in got), got
    assert any(abs(g - 70.5) < 4 for g in got), got


def test_hough_sparse_revote_masks_other_lines():
    """Sparse re-vote along a known line sees only that line's votes
    (Hough_Lines_Parallel_Sparse capability)."""
    from vpp_tpu.algorithms.hough import (hough_peaks_clustered,
                                          hough_sparse_revote)
    h, w = 96, 128
    a = np.zeros((h, w), np.float32)
    a[30:32] = 200.0
    a[70:72] = 200.0
    img = from_array(jnp.asarray(a), border=3, border_mode="mirror")
    # re-vote only around the row-30 line: θ = π/2, ρ = 30.5
    theta = jnp.asarray([np.pi / 2], jnp.float32)
    rho = jnp.asarray([30.5], jnp.float32)
    acc = hough_sparse_revote(img, theta, rho, jnp.asarray([True]),
                              band=5.0, t_theta=181)
    peaks = hough_peaks_clustered(acc, 4, threshold=10.0)
    th2, rho2 = accumulator_to_lines(peaks, acc.shape, img.shape)
    got = [float(r) for r, v in zip(rho2, peaks.valid) if v]
    assert got, "line under the mask must be found"
    assert all(abs(g - 30.5) < 6 for g in got), got


def test_hough_adaptive_threshold_reaches_band():
    """adap_thresold capability: threshold adapts until the local-maxima
    count is inside the target band."""
    from vpp_tpu.algorithms.hough import (_local_maxima_mask,
                                          hough_adaptive_threshold)
    rng = np.random.RandomState(0)
    # noisy accumulator with many weak maxima
    acc = jnp.asarray(rng.rand(181, 160).astype(np.float32) * 100)
    th, n = hough_adaptive_threshold(acc, target_lo=5, target_hi=40,
                                     th0=1.0, max_calls=5,
                                     nms_theta=4, nms_rho=4)
    n0 = int(jnp.sum(_local_maxima_mask(acc, 4, 4, jnp.float32(1.0))))
    assert n0 > 40          # started out of band
    assert int(n) <= 40 or float(th) > 1.0   # moved toward the band


def test_hough_mxu_matches_scatter():
    """The chunked one-hot MXU formulation (rank-1 tent factorisation of
    the 4 bilinear votes) must match the scatter accumulator up to bf16
    weight rounding (round-5 1080p speedup: 58.8 -> 15.0 ms on v5e)."""
    from vpp_tpu.algorithms.hough import (hough_accumulator,
                                          hough_accumulator_mxu)
    rng = np.random.RandomState(3)
    img = from_array(jnp.asarray(rng.rand(96, 128).astype(np.float32)
                                 * 255), border=3, border_mode="mirror")
    a = np.asarray(hough_accumulator(img, t_theta=63))
    b = np.asarray(hough_accumulator_mxu(img, t_theta=63, chunk=512))
    assert np.abs(a - b).max() / a.max() < 5e-3
    # magnitude votes + mask path too
    mask = np.zeros((96, 128), np.uint8)
    mask[20:70, 30:100] = 1
    a = np.asarray(hough_accumulator(img, t_theta=63,
                                     vote_weight="magnitude",
                                     pixel_mask=jnp.asarray(mask)))
    b = np.asarray(hough_accumulator_mxu(img, t_theta=63, chunk=512,
                                         vote_weight="magnitude",
                                         pixel_mask=jnp.asarray(mask)))
    assert np.abs(a - b).max() / a.max() < 5e-3


def test_hough_pallas_matches_scatter_interpret():
    """The Pallas in-VMEM kernel in interpreter mode (the TPU run is
    exercised by benchmarks/micro.py on chip)."""
    from vpp_tpu.algorithms.hough import hough_accumulator
    from vpp_tpu.algorithms.hough_pallas import hough_accumulator_pallas
    rng = np.random.RandomState(4)
    img = from_array(jnp.asarray(rng.rand(64, 96).astype(np.float32)
                                 * 255), border=3, border_mode="mirror")
    a = np.asarray(hough_accumulator(img, t_theta=63))
    b = np.asarray(hough_accumulator_pallas(img, t_theta=63,
                                            interpret=True))
    assert np.abs(a - b).max() / a.max() < 5e-3
