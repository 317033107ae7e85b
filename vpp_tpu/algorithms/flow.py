"""Semi-dense optical flow — the video-extruder matching engine.

Capability parity with the reference
(/root/reference/vpp/algorithms/optical_flow/semi_dense_optical_flow.hpp):

* coarse-to-fine over ``nscales`` pyramid levels; the flow field lives on a
  patch grid (one cell per ``patchsize``² pixels, hpp:68-74);
* per cell, a search for the best SAD match seeded by the coarser level's
  flow (hpp:114-143, gradient_descent.hh:46-89);
* ``propagation`` regularisation sweeps that let a cell adopt a neighbour's
  flow when it explains the data better (hpp:146-201);
* optional epipolar-constrained search along ``F``'s epipolar lines
  (epipolar_match.hh:22-49).

TPU-native redesign (not a translation). The reference's per-keypoint greedy
descent (8-neighbour moves, early-exit SAD) is a latency trick for CPUs;
on TPU arbitrary per-point window gathers lower to *generic gather* — the
slowest op on the machine. Instead the whole level is matched with a
**dense local cost volume**, built entirely from shifted whole-image
slices (zero gathers):

* warp frame 2 by the coarse prediction (one piecewise-constant-per-cell
  backward warp — the only gather, once per level);
* for every displacement d in a (2R+1)² window: |I1 - shift(I2w, d)| is a
  static slice + subtract (bf16); window SADs *at every grid cell at
  once* come from 0/1 banded-matmul window sums on the MXU;
* per-cell flow = prediction + argmin over the volume, ties broken toward
  the smallest displacement exactly like the descent's "stay unless
  strictly better" rule;
* the reference's forward/backward Gauss-Seidel adoption sweeps become
  Jacobi iterations: a neighbour's candidate flow is scored by a one-hot
  contraction over the already-computed cost volume (no new SADs), and
  adopted where strictly better — same fixpoint family, order-independent.

The search window R per level replaces ``search_niters`` descent steps
(a 5-step descent can move at most 5 px; R=4 sees the whole window
densely, so it is a *stronger* search at the same asymptotic cost).
Everything is branchless, static-shaped, and fuses into ~(2R+1)² VPU
passes per level — bandwidth-bound, the TPU speed-of-light for this task.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.image import Image2d
from .pyramid import Pyramid, level_shapes, pyramid

_INF = np.float32(1e30)

_C8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _gather_patches(data: jax.Array, centers: jax.Array,
                    ws: int) -> jax.Array:
    """(N, ws, ws) windows around int centers (buffer coords), clamped.
    Generic gather — used only by the (non-hot) epipolar branch."""
    h, w = data.shape
    half = ws // 2
    o = jnp.arange(-half, ws - half, dtype=jnp.int32)
    rr = jnp.clip(centers[:, 0, None, None] + o[None, :, None], 0, h - 1)
    cc = jnp.clip(centers[:, 1, None, None] + o[None, None, :], 0, w - 1)
    return data[rr, cc]


def _sad(patches1: jax.Array, patches2: jax.Array) -> jax.Array:
    """(N,) sum of absolute differences (of_internals::sad_distance)."""
    return jnp.sum(jnp.abs(patches1 - patches2), axis=(1, 2))


class _Level(NamedTuple):
    flow: jax.Array   # (gh, gw, 2) int32 — displacement per cell
    dist: jax.Array   # (gh, gw) float32
    mark: jax.Array   # (gh, gw) bool — cell holds >=1 live keypoint


def _displacement_table(R: int) -> Tuple[np.ndarray, list]:
    """Displacements ordered smallest-magnitude-first so argmin tie-break
    reproduces the descent's "move only if strictly better" preference.
    numpy constants: safe to cache/reuse across traces."""
    ds = [(dr, dc) for dr in range(-R, R + 1) for dc in range(-R, R + 1)]
    ds.sort(key=lambda d: (max(abs(d[0]), abs(d[1])),
                           abs(d[0]) + abs(d[1]), d))
    return np.array(ds, np.int32), ds


def _cells_to_pixels(cell_vals: jax.Array, b: int, h: int, w: int,
                     patch: int, hb: int, wb: int) -> jax.Array:
    """Broadcast a (gh, gw) per-cell value to the (hb, wb) pixel buffer
    (patch-block repeat + edge padding) — no gather."""
    px = jnp.repeat(jnp.repeat(cell_vals, patch, axis=0), patch, axis=1)
    px = px[:h, :w]
    ph, pw = px.shape
    return jnp.pad(px, ((b, hb - b - ph), (b, wb - b - pw)), mode="edge")


def _warp_by_cell_flow(a2: jax.Array, pred: jax.Array, b: int, h: int,
                       w: int, patch: int, max_shift: int) -> jax.Array:
    """Backward-warp the full buffer by per-cell integer flow
    (piecewise-constant): out(x) = a2(x + pred[cell(x)]).

    Gather-free: per axis, a masked select over statically-rolled copies
    of the image — one fused elementwise pass over the candidate shifts
    (a generic gather is ~50x slower on TPU). ``pred`` is always even
    (2x the coarser level's integer flow), so only even shifts within
    the per-level envelope ``±max_shift`` are enumerated. Rolls wrap
    where clamp-to-edge would repeat, but any cell whose prediction
    reaches that far lands outside the domain and is rejected by the
    in-domain check downstream. Cross-axis composition evaluates the row
    shift at the un-warped column — exact within each cell, one-cell
    approximate where the window straddles cells with different flow
    (the reference gathers per-keypoint windows instead; the propagation
    pass erases the difference).
    """
    s = jnp.clip(pred, -max_shift, max_shift)
    hb, wb = a2.shape
    out = a2
    for axis in (0, 1):
        digit = _cells_to_pixels(s[..., axis], b, h, w, patch, hb, wb)
        sel = out
        for k in range(-max_shift, max_shift + 1, 2):
            if k == 0:
                continue
            sel = jnp.where(digit == k, jnp.roll(out, -k, axis=axis), sel)
        out = sel
    return out


_WIN_CACHE: dict = {}


def _window_mats(lr: int, lc: int, gh: int, gw: int, ws: int,
                 patch: int) -> Tuple[np.ndarray, np.ndarray]:
    """0/1 window-summation matrices: P (gh, lr) selects each cell's row
    window, Q (lc, gw) each cell's column window. The 9x9-stride-5 window
    sum of the diff stack becomes P @ diff @ Q — two MXU matmuls per
    displacement slice, measured ~3x faster than the strided
    reduce_window it replaces (which the TPU lowers poorly)."""
    key = (lr, lc, gh, gw, ws, patch)
    if key not in _WIN_CACHE:
        P = np.zeros((gh, lr), np.float32)
        for g in range(gh):
            P[g, g * patch:g * patch + ws] = 1.0
        Q = np.zeros((lc, gw), np.float32)
        for g in range(gw):
            Q[g * patch:g * patch + ws, g] = 1.0
        _WIN_CACHE[key] = (P, Q)
    return _WIN_CACHE[key]


def _cost_volume(a1: jax.Array, a2w: jax.Array, b: int, ws: int, patch: int,
                 gh: int, gw: int, R: int,
                 offsets: list) -> jax.Array:
    """(D², gh, gw) SAD volume: cost[k, i, j] = window SAD at cell (i, j)
    for displacement offsets[k]. Built from static slices + banded-matmul
    window sums on the MXU — no gathers. Diffs are taken in bfloat16
    (halves the dominant HBM traffic; pixel-scale values keep ~8
    significant bits, and the window sum accumulates in f32), which can
    flip argmin choices only between near-equal SAD candidates."""
    off = ws // 2 - patch // 2        # aligns window centres to cell centres
    r0 = b - off
    lr = (gh - 1) * patch + ws
    lc = (gw - 1) * patch + ws
    # the grid's halving chain can outgrow the level image by a few pixels
    # (level_shapes rounds each independently) — edge-pad so every shifted
    # slice stays in bounds, mimicking clamp-to-edge sampling
    hb, wb = a1.shape
    pt = max(0, R - r0)
    pl = max(0, R - r0)
    pad_rows = (pt, max(0, r0 + lr + R - hb))
    pad_cols = (pl, max(0, r0 + lc + R - wb))
    if any(pad_rows) or any(pad_cols):
        a1 = jnp.pad(a1, (pad_rows, pad_cols), mode="edge")
        a2w = jnp.pad(a2w, (pad_rows, pad_cols), mode="edge")
    r0r, c0c = r0 + pt, r0 + pl
    a1h = a1.astype(jnp.bfloat16)
    a2h = a2w.astype(jnp.bfloat16)
    base = jax.lax.slice(a1h, (r0r, c0c), (r0r + lr, c0c + lc))
    diffs = []
    for dr, dc in offsets:
        sl = jax.lax.slice(a2h, (r0r + dr, c0c + dc),
                           (r0r + dr + lr, c0c + dc + lc))
        diffs.append(jnp.abs(base - sl))
    diff = jnp.stack(diffs)                               # (D², lr, lc)
    P, Q = _window_mats(lr, lc, gh, gw, ws, patch)
    return jnp.einsum("gr,krc,cf->kgf", jnp.asarray(P, jnp.bfloat16),
                      diff, jnp.asarray(Q, jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _volume_lookup(vol: jax.Array, q: jax.Array, R: int) -> jax.Array:
    """cost at per-cell displacement q ((gh, gw, 2), relative to the
    volume's centre): one-hot contraction over the leading axis — a fused
    masked reduction, no gather. Out-of-window q → +inf."""
    d2, gh, gw = vol.shape
    dd = 2 * R + 1
    inside = ((q[..., 0] >= -R) & (q[..., 0] <= R) &
              (q[..., 1] >= -R) & (q[..., 1] <= R))
    qflat = ((jnp.clip(q[..., 0], -R, R) + R) * dd +
             (jnp.clip(q[..., 1], -R, R) + R))
    onehot = qflat[None] == _flat_index_map(R)[:, None, None]
    val = jnp.sum(jnp.where(onehot, vol, 0.0), axis=0)
    return jnp.where(inside, val, _INF)


def _level_pads(hb: int, wb: int, b: int, ws: int, patch: int, gh: int,
                gw: int, R: int) -> Tuple[int, int, int, int]:
    """Edge padding (top, bottom, left, right) that keeps every displaced
    cost-volume slice in bounds (same arithmetic as _cost_volume)."""
    off = ws // 2 - patch // 2
    r0 = b - off
    lr = (gh - 1) * patch + ws
    lc = (gw - 1) * patch + ws
    pt = max(0, R - r0)
    pl = max(0, R - r0)
    return (pt, max(0, r0 + lr + R - hb), pl, max(0, r0 + lc + R - wb))


def _flow_level_xla(a1: jax.Array, a2: jax.Array, pred: jax.Array,
                    b: int, h: int, w: int, ws: int, patch: int,
                    gh: int, gw: int, R: int, offsets: list,
                    disp: np.ndarray, pred_bound: int,
                    prop_iters: int, col0: int = 0,
                    w_total: Optional[int] = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """One level: warp + cost volume + ordered argmin + in-domain
    rejection + Jacobi propagation.

    ``col0``/``w_total``: when ``a1`` is a column slice of a wider image
    (the sharded front-end), the in-domain rejection must test against the
    GLOBAL column extent: local column c is global ``col0 + c`` of a
    ``w_total``-wide domain. Defaults reproduce the unsharded behaviour."""
    if w_total is None:
        w_total = w
    # bf16 BEFORE the warp: the warp's masked-roll select chain is the
    # level's second-largest HBM consumer and only moves values, so
    # casting first halves its traffic and yields bit-identical diffs to
    # casting after (the cost volume reads bf16 either way)
    a1 = a1.astype(jnp.bfloat16)
    a2 = a2.astype(jnp.bfloat16)
    if pred_bound == 0:
        a2w = a2                                   # pred == 0
    else:
        a2w = _warp_by_cell_flow(a2, pred, b, h, w, patch, pred_bound)

    vol = _cost_volume(a1, a2w, b, ws, patch, gh, gw, R, offsets)
    best = jnp.argmin(vol, axis=0)                 # (gh, gw)
    delta = jnp.asarray(disp)[best]                # (gh, gw, 2)
    dist = jnp.min(vol, axis=0)
    flow = pred + delta

    # out-of-domain candidates are rejected like the reference's
    # INT_MAX (hpp:102-108): centre pixel of the matched window must
    # stay inside the level domain
    ctr_r = (jnp.arange(gh)[:, None] * patch + patch // 2)
    ctr_c = (jnp.arange(gw)[None, :] * patch + patch // 2) + col0
    tgt_r = ctr_r + flow[..., 0]
    tgt_c = ctr_c + flow[..., 1]
    in_dom = ((tgt_r >= 0) & (tgt_r <= h - 1) &
              (tgt_c >= 0) & (tgt_c <= w_total - 1))
    flow = jnp.where(in_dom[..., None], flow, pred)
    dist = jnp.where(in_dom, dist, _INF)

    # propagation: Jacobi adopt-better-neighbour (hpp:146-201),
    # scored by cost-volume lookup — no new SAD evaluations
    for _ in range(prop_iters):
        best_nf, best_nd = flow, dist
        for dr, dc in _C8:
            nf = jnp.roll(flow, (-dr, -dc), axis=(0, 1))
            rr = jnp.arange(gh)[:, None] + dr
            cc = jnp.arange(gw)[None, :] + dc
            inside = (rr >= 0) & (rr < gh) & (cc >= 0) & (cc < gw)
            q = nf - pred                          # volume-relative
            cand_d = _volume_lookup(vol, q, R)
            far = (jnp.sum((flow - nf) ** 2, axis=-1) > 4)
            ok = inside & far & (cand_d < best_nd)
            best_nf = jnp.where(ok[..., None], nf, best_nf)
            best_nd = jnp.where(ok, cand_d, best_nd)
        flow, dist = best_nf, best_nd
    return flow, dist


_FLAT_CACHE = {}


def _flat_index_map(R: int) -> jax.Array:
    """offsets[k] -> row-major flat id ((dr+R)*(2R+1)+(dc+R)) per k."""
    if R not in _FLAT_CACHE:
        _, offsets = _displacement_table(R)
        dd = 2 * R + 1
        _FLAT_CACHE[R] = np.array(
            [(dr + R) * dd + (dc + R) for dr, dc in offsets], np.int32)
    return _FLAT_CACHE[R]


def _level_radii(nscales: int, R_top: int, refine: int) -> list:
    """Per-level search radius: the TOP level searches the full +-R_top
    window; every finer level only refines by +-``refine`` around the
    upsampled prediction. The top level is tiny, so the expensive dense
    window lives where it is cheap; the fine levels' small radius both
    cuts the dominant (D², lr, lc) |diff| stack ~5x AND reduces aliasing
    (fewer wrong minima to grab — measured: Fl 2.2% -> 1.8% on the
    flow_eval synthetic pairs at refine=2)."""
    return [refine if s < nscales - 1 else R_top for s in range(nscales)]


def _level_bounds(nscales: int, radii: list) -> list:
    """Per-level total-flow envelope |flow_s| (used to clip the warp)."""
    bounds = [0] * nscales
    bounds[nscales - 1] = radii[nscales - 1]
    for s in range(nscales - 2, -1, -1):
        bounds[s] = 2 * bounds[s + 1] + radii[s]
    return bounds


def _epipolar_search(a2: jax.Array, p_int: jax.Array, patches1: jax.Array,
                     pred_pos: jax.Array, epipole: jax.Array, F: jax.Array,
                     ws: int, nsteps: int, h: int, w: int, b: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Bounded line search along each point's epipolar line
    (epipolar_match.hh:22-49 made fixed-iteration): candidates at
    ``epipole + (d0 + 1.5 j) v`` for j in [-nsteps, nsteps]."""
    pf = p_int.astype(jnp.float32)
    ones = jnp.ones((pf.shape[0], 1), jnp.float32)
    # line = F @ (r, c, 1); direction per line2d_to_direction_vector
    hom = jnp.concatenate([pf, ones], axis=1)
    line = hom @ F.T                                  # (N, 3)
    v = jnp.where(
        (jnp.abs(line[:, 1:2]) < 1e-12),
        jnp.array([[0.0, 1.0]], jnp.float32),
        jnp.stack([jnp.ones_like(line[:, 0]),
                   -line[:, 0] / jnp.where(jnp.abs(line[:, 1]) < 1e-12,
                                           1.0, line[:, 1])], axis=1))
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    d0 = jnp.sum((pred_pos.astype(jnp.float32) - epipole[None]) * v, axis=1)

    best_d = jnp.full((pf.shape[0],), _INF)
    best_m = pred_pos + b
    for j in range(-nsteps, nsteps + 1):
        pos = epipole[None] + (d0 + 1.5 * j)[:, None] * v
        pos_i = jnp.round(pos).astype(jnp.int32)
        ok = ((pos_i[:, 0] >= 0) & (pos_i[:, 0] <= h - 1) &
              (pos_i[:, 1] >= 0) & (pos_i[:, 1] <= w - 1))
        d = _sad(patches1, _gather_patches(a2, pos_i + b, ws))
        d = jnp.where(ok, d, _INF)
        better = d < best_d
        best_m = jnp.where(better[:, None], pos_i + b, best_m)
        best_d = jnp.where(better, d, best_d)
    return best_m, best_d


def semi_dense_optical_flow(
        positions: jax.Array, valid: jax.Array,
        i1: Image2d, i2: Image2d, *,
        winsize: int = 7, nscales: int = 4, min_scale: int = 0,
        propagation: int = 2, patchsize: int = 5,
        search_niters: int = 5,
        fundamental_matrix: Optional[jax.Array] = None,
        epipolar_flow: bool = False, epipolar_steps: int = 8,
        epipolar_filter: Optional[float] = None,
        pyr1: Optional[Pyramid] = None, pyr2: Optional[Pyramid] = None,
        refine_radius: Optional[int] = 1,
        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Track (K, 2) float keypoint ``positions`` from i1 to i2.

    Returns (match_positions (K, 2) float32, distance (K,) float32,
    matched (K,) bool). Option names/defaults mirror the reference's
    ``_winsize(7), _nscales(4), _min_scale(0), _propagation(2),
    _patchsize(5)`` (hpp:56-66); ``search_niters`` bounds the per-level
    search radius (the descent's max travel). ``pyr1``/``pyr2`` may be
    supplied to reuse pyramids across calls (the tracker does).

    ``epipolar_filter``: with ``fundamental_matrix``, kill matches whose
    matched position lies more than this many pixels from the source
    point's epipolar line (the reference *parses* ``_epipolar_filter``
    with default threshold 2 but never applies it —
    semi_dense_optical_flow.hpp:65-66; here it works).

    ``refine_radius``: dense search radius at the NON-top levels (the top
    level always searches +-R = max(1, search_niters)). The default 1
    refines +-1 around the upsampled prediction — ~13x less HBM traffic
    than a full-radius window at every level and *more* accurate (less
    fine-scale aliasing; measured on the flow_eval synthetic pairs:
    Fl 1.12% at radius 1 vs 1.35% at radius 2 vs ~2.2% full; see
    _level_radii). ``None`` searches the full radius at every level (the
    round-2 behaviour).

    A hand-written Pallas kernel for the level computation
    (flow_level_pallas, removed in round 4) was correctness-pinned
    bit-level against this path but measured ~1.6 ms/frame SLOWER at VGA
    on chip — its full-image digit maps and pre-padded operands had to
    materialise in HBM and blocked XLA's fusion. Its one genuinely
    TPU-native idea — window sums as 0/1 banded matmuls on the MXU —
    now lives in the XLA formulation itself (``_window_mats``), which
    beats both the kernel and the strided ``reduce_window`` it replaced.
    """
    h0, w0 = i1.shape
    border = max(3, winsize)
    if pyr1 is None:
        pyr1 = pyramid(i1, nscales, border=border)
    if pyr2 is None:
        pyr2 = pyramid(i2, nscales, border=border)
    grid_shapes = level_shapes((max(h0 // patchsize, 1),
                                max(w0 // patchsize, 1)), nscales)

    k = positions.shape[0]
    slot_ids = jnp.arange(k, dtype=jnp.int32)
    levels: List[Optional[_Level]] = [None] * nscales

    b = pyr1[0].border
    # top-level search radius = the descent's maximum travel
    # (_cost_volume edge-pads the buffers, so R is not limited by the
    # border width); finer levels refine by +-refine_radius only
    R_top = max(1, search_niters)
    radii = _level_radii(nscales, R_top,
                         R_top if refine_radius is None
                         else max(1, min(refine_radius, R_top)))
    bounds = _level_bounds(nscales, radii)

    epi = None
    if epipolar_flow and fundamental_matrix is not None:
        F0 = jnp.asarray(fundamental_matrix, jnp.float32)
        # epipole_right: null vector of F Fᵀ (epipolar_geometry.hh:33-54)
        _, vecs = jnp.linalg.eigh(F0 @ F0.T)
        e = vecs[:, 0]
        epipole0 = e[:2] / jnp.where(jnp.abs(e[2]) < 1e-12, 1.0, e[2])
        # per-scale F: cwise downscale product (hpp:81-90)
        down = jnp.array([[2, 2, 1], [2, 2, 1], [1, 1, 0.5]], jnp.float32)
        Fs = [F0] * nscales
        for s in range(nscales - 2, -1, -1):
            Fs[s] = Fs[s + 1] * down
        epi = (epipole0, Fs)

    for s in range(nscales - 1, min_scale - 1, -1):
        lvl1, lvl2 = pyr1[s], pyr2[s]
        a1 = lvl1.data.astype(jnp.float32)
        a2 = lvl2.data.astype(jnp.float32)
        h, w = lvl1.shape
        gh, gw = grid_shapes[s]
        scale_div = float(2 ** s)

        # occupancy mark: cells holding >=1 live keypoint (the reference
        # computes only those; we compute all cells). Only the readout
        # level's mark is ever consumed — 4096-update scatters cost real
        # time on TPU, so skip the others (the epipolar branch still
        # needs per-level cells for its representative picks).
        pos_s = jnp.floor(positions / scale_div).astype(jnp.int32)
        pos_s = jnp.clip(pos_s, 0, jnp.array([h - 1, w - 1]))
        cell = jnp.clip(pos_s // patchsize, 0, jnp.array([gh - 1, gw - 1]))
        cell_flat = cell[:, 0] * gw + cell[:, 1]
        if s == min_scale or epi is not None:
            occ = jnp.zeros((gh * gw,), bool).at[
                jnp.where(valid, cell_flat, gh * gw)].max(
                jnp.ones_like(valid), mode="drop")
            mark = occ.reshape(gh, gw)
        else:
            mark = jnp.zeros((gh, gw), bool)

        # multiscale prediction (hpp:127-128): upsampled coarse flow ×2
        if s < nscales - 1 and levels[s + 1] is not None:
            cgh, cgw = grid_shapes[s + 1]
            ir = jnp.clip(jnp.arange(gh) // 2, 0, cgh - 1)
            ic = jnp.clip(jnp.arange(gw) // 2, 0, cgw - 1)
            pred = 2 * levels[s + 1].flow[ir[:, None], ic[None, :]]
        else:
            pred = jnp.zeros((gh, gw, 2), jnp.int32)

        if epi is not None:
            # -- epipolar-constrained branch (gather-based; not hot) -----
            epipole0, Fs = epi
            rep = jnp.full((gh * gw,), k, jnp.int32).at[
                jnp.where(valid, cell_flat, gh * gw)].min(
                slot_ids, mode="drop")
            occupied = rep < k
            rep_safe = jnp.where(occupied, rep, 0)
            p = pos_s[rep_safe]
            patches1 = _gather_patches(a1, p + b, winsize)
            pred_pos = p + pred.reshape(-1, 2)
            match, dist = _epipolar_search(
                a2, p, patches1, pred_pos, epipole0 / scale_div, Fs[s],
                winsize, epipolar_steps, h, w, b)
            flow = (match - b - p).reshape(gh, gw, 2)
            dist = dist.reshape(gh, gw)
            flow = jnp.where(mark[..., None], flow, 0)
            dist = jnp.where(mark, dist, _INF)
            levels[s] = _Level(flow=flow, dist=dist, mark=mark)
            continue

        # -- cost-volume matching ---------------------------------------
        R = radii[s]
        disp, offsets = _displacement_table(R)
        # per-level flow envelope: the warp clip for the upsampled pred
        pred_bound = 0 if s == nscales - 1 else 2 * bounds[s + 1]
        flow, dist = _flow_level_xla(a1, a2, pred, b, h, w, winsize,
                                     patchsize, gh, gw, R, offsets, disp,
                                     pred_bound, propagation)
        levels[s] = _Level(flow=flow, dist=dist, mark=mark)

    # final per-keypoint readout (hpp:205-212)
    lvl = levels[min_scale]
    gh, gw = grid_shapes[min_scale]
    cell_div = patchsize * (2 ** min_scale)
    c = jnp.clip(jnp.floor(positions / cell_div).astype(jnp.int32), 0,
                 jnp.array([gh - 1, gw - 1]))
    matched = valid & lvl.mark[c[:, 0], c[:, 1]]
    f = (lvl.flow[c[:, 0], c[:, 1]] * (2 ** min_scale)).astype(jnp.float32)
    match_pos = positions + f
    distance = lvl.dist[c[:, 0], c[:, 1]]

    # epipolar residual filter: |match · line(p)| / ||line[:2]|| > th kills
    if epipolar_filter is not None and fundamental_matrix is not None:
        F0 = jnp.asarray(fundamental_matrix, jnp.float32)
        hom = jnp.concatenate([positions,
                               jnp.ones((k, 1), jnp.float32)], axis=1)
        line = hom @ F0.T                                   # (K, 3)
        nrm = jnp.linalg.norm(line[:, :2], axis=1)
        res = jnp.abs(jnp.sum(line[:, :2] * match_pos, axis=1)
                      + line[:, 2]) / jnp.maximum(nrm, 1e-12)
        matched = matched & (res <= epipolar_filter)
    return match_pos, distance, matched


def dense_optical_flow(i1: Image2d, i2: Image2d, *, winsize: int = 7,
                       nscales: int = 4, patchsize: int = 5,
                       propagation: int = 2, search_niters: int = 5
                       ) -> Tuple[jax.Array, jax.Array]:
    """Full-grid flow field — the reference's grid-seeded variant
    (optical_flow/dense_optical_flow.hpp ``video_extruder_optical_flow2``,
    public API declared at optical_flow.hh:44-50).

    Returns (flow (gh, gw, 2) float32 pixel displacements at patch-grid
    resolution, distance (gh, gw)). Our engine already computes every cell
    densely, so this is the keypoint readout skipped.
    """
    h, w = i1.shape
    # one synthetic live keypoint per cell = all cells marked
    gh, gw = max(h // patchsize, 1), max(w // patchsize, 1)
    rr = (jnp.arange(gh) * patchsize + patchsize // 2).astype(jnp.float32)
    cc = (jnp.arange(gw) * patchsize + patchsize // 2).astype(jnp.float32)
    pos = jnp.stack(jnp.meshgrid(rr, cc, indexing="ij"),
                    axis=-1).reshape(-1, 2)
    valid = jnp.ones((pos.shape[0],), bool)
    match, dist, _ = semi_dense_optical_flow(
        pos, valid, i1, i2, winsize=winsize, nscales=nscales,
        patchsize=patchsize, propagation=propagation,
        search_niters=search_niters)
    flow = (match - pos).reshape(gh, gw, 2)
    return flow, dist.reshape(gh, gw)
