"""Pyramidal Lucas-Kanade sparse flow — batched over keypoints.

Capability parity with the reference's two LK entry points:

* ``lk_match_point_square_win<WS>`` (reference pyrlk/lk.hh:40-175): per
  keypoint — accumulate the 2x2 gradient matrix G over a winsize² window of
  bilinearly-sampled Scharr gradients, reject if min eigenvalue of G/n is
  below ``min_ev``, then Newton iterations ``v += G⁻¹ · b`` on the temporal
  difference, and a normalised-SAD residual.
* ``pyrlk_match`` (pyrlk/pyrlk_match.hh:14-55): coarse→fine over the
  pyramid, translation doubled between levels, keypoints killed when the
  residual exceeds ``max_err`` or the match leaves the image.
* ``lucas_kanade`` (lucas_kanade/lucas_kanade.hpp:134-184): same math with
  runtime winsize and a flow-result interface.

TPU-native design: the reference's ``omp parallel for`` over keypoints
becomes one ``vmap`` — every keypoint advances in lockstep through a fixed
iteration count with convergence *masking* (a converged keypoint keeps its
value; no early exit, branchless). The 2x2 solves are closed-form; window
gathers are batched bilinear samples. One jitted program per pyramid
geometry. Residual note: our error divides by winsize² where the reference
accidentally divides by 2·winsize² (lk.hh:151-173 reuses its ``cpt``
counter), so thresholds here are 2x the reference's numerically.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.image import Image2d, from_array
from ..core.interp import bilinear
from ..core.keypoints import Keypoints, kp_move_all
from .pyramid import Pyramid, pyramid
from .scharr import scharr

_BIG = np.float32(3.4e38)


def _window_offsets(winsize: int) -> jax.Array:
    hws = winsize // 2
    o = jnp.arange(-hws, hws + 1, dtype=jnp.float32)
    dr, dc = jnp.meshgrid(o, o, indexing="ij")
    return jnp.stack([dr.ravel(), dc.ravel()], axis=-1)  # (ws², 2)


def _extract_patches_tl(data: jax.Array, centers_f: jax.Array,
                        size: int) -> Tuple[jax.Array, jax.Array]:
    """(N, size, size) integer-aligned patches around float ``centers_f``
    (buffer coords) + the actual top-left used (clamped into the
    buffer). One-hot MXU extraction (core.interp.extract_patches_at_tl)
    — the 12 per-call patch extractions were ~10 of pyrlk's 12 ms on
    v5e as scalar-unit gathers; the matmul form is exact and ~8x
    faster."""
    from ..core.interp import extract_patches_at_tl
    h, w = data.shape
    half = size // 2
    tl = jnp.stack([jnp.round(centers_f[:, 0]).astype(jnp.int32) - half,
                    jnp.round(centers_f[:, 1]).astype(jnp.int32) - half],
                   axis=-1)
    tl = jnp.clip(tl, 0, jnp.array([h - size, w - size]))
    return extract_patches_at_tl(data, tl, size), tl


def _sample_windows_local(patches: jax.Array, s_r: jax.Array,
                          s_c: jax.Array, ws: int) -> jax.Array:
    """(N, ws, ws) windows sampled bilinearly INSIDE (N, P, P) patches.

    ``s_r``/``s_c``: per-keypoint float start offsets (patch coords) of
    the window's top-left sample. A select-over-static-shifts sum — two
    or fewer nonzero terms per keypoint, all arithmetic elementwise, NO
    gathers — so it can run inside an iteration loop for free (a
    per-iteration bilinear gather measured ~5 ms for 1024x121 samples on
    chip; this form is fused VPU work)."""
    n, pp, _ = patches.shape
    k = pp - ws + 1                          # candidate integer shifts
    isr = jnp.clip(jnp.floor(s_r), 0, k - 2 if k > 1 else 0)
    isc = jnp.clip(jnp.floor(s_c), 0, k - 2 if k > 1 else 0)
    fr = jnp.clip(s_r - isr, 0.0, 1.0)
    fc = jnp.clip(s_c - isc, 0.0, 1.0)
    isr = isr.astype(jnp.int32)
    isc = isc.astype(jnp.int32)

    rows = jnp.zeros((n, ws, pp), patches.dtype)
    for kk in range(k):
        wgt = (jnp.where(isr == kk, 1.0 - fr, 0.0)
               + jnp.where(isr == kk - 1, fr, 0.0))
        rows = rows + patches[:, kk:kk + ws, :] * wgt[:, None, None]
    out = jnp.zeros((n, ws, ws), patches.dtype)
    for kk in range(k):
        wgt = (jnp.where(isc == kk, 1.0 - fc, 0.0)
               + jnp.where(isc == kk - 1, fc, 0.0))
        out = out + rows[:, :, kk:kk + ws] * wgt[:, None, None]
    return out


def lk_match_batch(A: Image2d, B: Image2d, Ag: Image2d, p: jax.Array,
                   tr_prediction: jax.Array, *, winsize: int,
                   min_ev: float, niterations: int,
                   convergence_delta: float
                   ) -> Tuple[jax.Array, jax.Array]:
    """Batched lk_match_point_square_win.

    p, tr_prediction: (N, 2) float32 in interior coords of A/B.
    Returns (flow (N, 2), err (N,)); err = +inf for rejected keypoints.

    TPU shape: each keypoint gathers its template / gradient / search
    patches ONCE (three vmapped dynamic-slices per level); the Newton
    iterations then sample windows inside the local patches with
    ``_sample_windows_local`` — zero gathers in the loop (the previous
    per-iteration full-image bilinear gathers cost ~340 ms per VGA call;
    this form is ~20x faster). The search patch allows ±``pad`` px of
    within-level travel beyond the prediction; a keypoint that tries to
    leave it samples the patch edge and is killed by the residual gate
    (the reference's unbounded descent would have lost such a point to
    ``max_err`` anyway)."""
    hws = winsize // 2
    n = p.shape[0]
    h, w = A.shape
    ba, bb, bg = A.border, B.border, Ag.border
    cnt = jnp.float32(winsize * winsize)

    v0 = p + tr_prediction
    # within-level travel budget; shrinks on tiny pyramid levels so the
    # patch always fits the buffer
    hb_b, wb_b = B.data.shape
    pad = max(1, min(12, (min(hb_b, wb_b) - winsize - 2) // 2))
    pt = winsize + 2                          # template/gradient patch
    pb = winsize + 2 * pad + 2                # search patch

    # template + gradient patches around p (top-left tracked for locals)
    ap, a_tl = _extract_patches_tl(A.data, p + ba, pt)
    gp_r, g_tl = _extract_patches_tl(Ag.data[..., 0], p + bg, pt)
    gp_c, _ = _extract_patches_tl(Ag.data[..., 1], p + bg, pt)
    s_r = (p[:, 0] + ba) - a_tl[:, 0].astype(jnp.float32) - hws
    s_c = (p[:, 1] + ba) - a_tl[:, 1].astype(jnp.float32) - hws
    as_ = _sample_windows_local(ap, s_r, s_c, winsize).reshape(n, -1)
    sg_r = (p[:, 0] + bg) - g_tl[:, 0].astype(jnp.float32) - hws
    sg_c = (p[:, 1] + bg) - g_tl[:, 1].astype(jnp.float32) - hws
    gr = _sample_windows_local(gp_r, sg_r, sg_c, winsize).reshape(n, -1)
    gc = _sample_windows_local(gp_c, sg_r, sg_c, winsize).reshape(n, -1)

    # G = [[Σgr², Σgrgc], [Σgrgc, Σgc²]]  (lk.hh:53-72)
    a11 = jnp.sum(gr * gr, axis=1)
    a12 = jnp.sum(gr * gc, axis=1)
    a22 = jnp.sum(gc * gc, axis=1)
    # min eigenvalue of symmetric 2x2 / cnt  (lk.hh:74-81)
    tr_g = (a11 + a22) / cnt
    det_part = jnp.sqrt(jnp.maximum(
        ((a11 - a22) / cnt) ** 2 + 4 * (a12 / cnt) ** 2, 0.0))
    min_eig = 0.5 * (tr_g - det_part)
    ok = min_eig >= min_ev

    det = a11 * a22 - a12 * a12
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    i11 = a22 * inv_det
    i12 = -a12 * inv_det
    i22 = a11 * inv_det

    # search patches around the PREDICTION (travel happens around v0)
    bp, b_tl = _extract_patches_tl(B.data, v0 + bb, pb)
    b_tl_f = b_tl.astype(jnp.float32)

    def window_at(v):
        sr = (v[:, 0] + bb) - b_tl_f[:, 0] - hws
        sc = (v[:, 1] + bb) - b_tl_f[:, 1] - hws
        return _sample_windows_local(bp, sr, sc, winsize).reshape(n, -1)

    def body(_, carry):
        v, active = carry
        bs = window_at(v)
        dt = as_ - bs                          # (N, W2)
        bk1 = jnp.sum(gr * dt, axis=1)
        bk2 = jnp.sum(gc * dt, axis=1)
        nk1 = i11 * bk1 + i12 * bk2
        nk2 = i12 * bk1 + i22 * bk2
        step = jnp.stack([nk1, nk2], axis=-1)
        v_new = jnp.where(active[:, None], v + step, v)
        still = jnp.sqrt(nk1 ** 2 + nk2 ** 2) >= convergence_delta
        return v_new, active & still

    v, _ = jax.lax.fori_loop(0, niterations, body,
                             (v0, ok & jnp.ones(n, bool)))

    in_domain = ((v[:, 0] >= 0) & (v[:, 0] <= h - 1) &
                 (v[:, 1] >= 0) & (v[:, 1] <= w - 1))
    in_patch = (jnp.abs(v - v0) <= pad).all(axis=1)

    # normalised SAD residual (lk.hh:149-173)
    avg = jnp.mean(as_, axis=1, keepdims=True)
    stddev = jnp.mean(jnp.abs(as_ - avg), axis=1)
    err = jnp.sum(jnp.abs(as_ - window_at(v)), axis=1) / (
        cnt * jnp.maximum(stddev, 1e-6))
    err = jnp.where(ok & in_domain & in_patch, err, _BIG)
    return v - p, err


def oriented_lk_match_batch(A: Image2d, B: Image2d, Ag: Image2d,
                            p: jax.Array, tr_prediction: jax.Array, *,
                            match_direction1: jax.Array,
                            match_direction2: jax.Array,
                            winsize: int, min_ev: float,
                            niterations: int, convergence_delta: float,
                            max_step_norm: float = 2.0
                            ) -> Tuple[jax.Array, jax.Array]:
    """Batched oriented_lk_match_point_square_win (reference
    pyrlk/lk.hh:178-317): LK with the sampling window rotated into a
    per-keypoint match direction and descent steps clamped to
    ``max_step_norm``.

    The template window is rotated by ``match_direction1`` (the window's
    column axis; rows follow the perpendicular), the search window by
    ``match_direction2`` — the reference uses this to track oriented
    structures (lines) whose aperture direction differs between frames.
    The gradient matrix G comes from the un-rotated window, exactly like
    the reference (lk.hh:195-215). Directions: (N, 2) unit (row, col).

    Returns (flow (N, 2), err (N,)); err = +inf for rejected keypoints.
    Like ``lk_match_batch``, err divides by winsize² where the reference
    divides by 2·winsize² (its reused ``cpt``), so thresholds are 2x.
    """
    offs = _window_offsets(winsize)           # (W2, 2) (dr, dc)
    n = p.shape[0]
    h, w = A.shape
    ba, bb, bg = A.border, B.border, Ag.border

    def rotate(dirs: jax.Array) -> jax.Array:
        """(N, W2, 2) offsets r*my + c*mx with mx=dirs, my=perp(mx)."""
        mx = dirs.astype(jnp.float32)
        my = jnp.stack([-mx[:, 1], mx[:, 0]], axis=-1)
        return (offs[None, :, 0, None] * my[:, None, :]
                + offs[None, :, 1, None] * mx[:, None, :])

    # G from the un-rotated window (lk.hh:195-215)
    pts = p[:, None, :] + offs[None]
    g = bilinear(Ag.data, pts + bg)
    gr0, gc0 = g[..., 0], g[..., 1]
    a11 = jnp.sum(gr0 * gr0, axis=1)
    a12 = jnp.sum(gr0 * gc0, axis=1)
    a22 = jnp.sum(gc0 * gc0, axis=1)
    cnt = jnp.float32(offs.shape[0])
    tr_g = (a11 + a22) / cnt
    det_part = jnp.sqrt(jnp.maximum(
        ((a11 - a22) / cnt) ** 2 + 4 * (a12 / cnt) ** 2, 0.0))
    min_eig = 0.5 * (tr_g - det_part)
    ok = min_eig >= min_ev

    det = a11 * a22 - a12 * a12
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    i11 = a22 * inv_det
    i12 = -a12 * inv_det
    i22 = a11 * inv_det

    # template samples + gradients at the direction1-rotated window
    # (lk.hh:236-251)
    r1 = rotate(match_direction1)
    pts1 = p[:, None, :] + r1
    as_ = bilinear(A.data, pts1 + ba)          # (N, W2)
    g1 = bilinear(Ag.data, pts1 + bg)
    gr, gc = g1[..., 0], g1[..., 1]

    r2 = rotate(match_direction2)              # search window offsets

    def body(_, carry):
        v, active = carry
        bs = bilinear(B.data, v[:, None, :] + r2 + bb)
        dt = as_ - bs
        bk1 = jnp.sum(gr * dt, axis=1)
        bk2 = jnp.sum(gc * dt, axis=1)
        nk1 = i11 * bk1 + i12 * bk2
        nk2 = i12 * bk1 + i22 * bk2
        nrm = jnp.sqrt(nk1 ** 2 + nk2 ** 2)
        # step-norm clamp (lk.hh:280-284)
        scale = jnp.where(nrm > max_step_norm,
                          max_step_norm / jnp.maximum(nrm, 1e-12), 1.0)
        step = jnp.stack([nk1 * scale, nk2 * scale], axis=-1)
        v_new = jnp.where(active[:, None], v + step, v)
        still = nrm >= convergence_delta
        return v_new, active & still

    v0 = p + tr_prediction
    v, _ = jax.lax.fori_loop(0, niterations, body,
                             (v0, ok & jnp.ones(n, bool)))

    in_domain = ((v[:, 0] >= 0) & (v[:, 0] <= h - 1) &
                 (v[:, 1] >= 0) & (v[:, 1] <= w - 1))

    avg = jnp.mean(as_, axis=1, keepdims=True)
    stddev = jnp.mean(jnp.abs(as_ - avg), axis=1)
    bs = bilinear(B.data, v[:, None, :] + r2 + bb)
    err = jnp.sum(jnp.abs(as_ - bs), axis=1) / (
        cnt * jnp.maximum(stddev, 1e-6))
    err = jnp.where(ok & in_domain, err, _BIG)
    return v - p, err


def gradient_pyramid(pyr: Pyramid) -> Pyramid:
    """Scharr on level 0, then filtered/subsampled down
    (lucas_kanade.hpp:151-157: scharr + propagate_level0)."""
    g0 = scharr(pyr[0])
    gpyr = pyramid(from_array(g0.interior, border=3, border_mode="mirror"),
                   nlevels=len(pyr), factor=pyr.factor)
    return gpyr


def pyrlk_match(pyr_prev: Pyramid, pyr_grad: Pyramid, pyr_next: Pyramid,
                kps: Keypoints, *, winsize: int = 11, min_ev: float = 1e-4,
                max_err: float = 2.0, niterations: int = 21,
                convergence_delta: float = 0.1,
                min_scale: int = 0) -> Keypoints:
    """Coarse→fine LK over all keypoint slots (pyrlk_match.hh:14-55).

    Keypoints whose final residual exceeds ``max_err`` (or that leave the
    image) die; survivors move by the estimated flow.
    """
    nscales = len(pyr_prev)
    k = kps.capacity
    tr = jnp.zeros((k, 2), jnp.float32)
    dist = jnp.zeros((k,), jnp.float32)
    for s in range(nscales - 1, min_scale - 1, -1):
        tr = tr * pyr_prev.factor
        scale = float(2 ** s)
        flow, err = lk_match_batch(
            pyr_prev[s], pyr_next[s], pyr_grad[s],
            kps.position / scale, tr, winsize=winsize, min_ev=min_ev,
            niterations=niterations, convergence_delta=convergence_delta)
        # adopt the level's flow only when it matched (pyrlk_match.hh:37-40).
        # NOTE: like the reference, ``dist`` is *overwritten* every level
        # (pyrlk_match.hh:41 ``dist = match.second``), so the final kill
        # below tests only the finest processed level's residual — a coarse
        # level's failure alone does not kill the keypoint (its flow is
        # simply not adopted). Verified against a scalar transcription in
        # tests/test_lk.py::test_pyrlk_level_kill_semantics.
        tr = jnp.where((err < max_err)[:, None], flow, tr)
        dist = err
    h, w = pyr_prev[0].shape
    final = kps.position + tr
    ok = ((dist <= max_err) & (final[:, 0] >= 0) & (final[:, 0] <= h - 1)
          & (final[:, 1] >= 0) & (final[:, 1] <= w - 1))
    return kp_move_all(kps, final, ok)


def lucas_kanade(i1: Image2d, i2: Image2d, keypoints: jax.Array, *,
                 niterations: int = 21, winsize: int = 11, nscales: int = 3,
                 min_ev: float = 1e-4, convergence_delta: float = 0.1,
                 prediction: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """Named-option LK (lucas_kanade.hpp:134-184): builds the three pyramids
    internally and returns (flow (N,2), dist (N,)) for (N,2) float keypoint
    positions — the reference's ``_flow`` callback becomes a return value."""
    border = max(3, winsize // 2)
    p_prev = pyramid(i1, nscales, border=border)
    p_next = pyramid(i2, nscales, border=border)
    p_grad = gradient_pyramid(p_prev)
    n = keypoints.shape[0]
    tr = (jnp.zeros((n, 2), jnp.float32) if prediction is None
          else prediction.astype(jnp.float32) / float(2 ** nscales))
    dist = jnp.zeros((n,), jnp.float32)
    for s in range(nscales - 1, -1, -1):
        tr = tr * 2.0
        scale = float(2 ** s)
        flow, err = lk_match_batch(
            p_prev[s], p_next[s], p_grad[s], keypoints / scale, tr,
            winsize=winsize, min_ev=min_ev, niterations=niterations,
            convergence_delta=convergence_delta)
        tr = flow
        dist = err
    return tr, dist
