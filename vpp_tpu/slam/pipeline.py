"""End-to-end SLAM engine: tracker -> keyframes -> triangulation ->
sliding-window BA (+ pose graph, relocalization, checkpointing).

The reference only *declares* this capability — its SfM context stubs
``triangulation()`` and ``bundle_adjustement()`` with empty bodies
(/root/reference/vpp/algorithms/line_tracker_4_sfm/sfm/structure_from_motion.hh:25-35,55-56).
This module is the TPU-native realisation (BASELINE configs 4-5).

TPU-native design — everything is slot-parallel and static-shape:

* the **keypoint slot index IS the landmark id**: the tracker's
  fixed-capacity slots (core/keypoints.py) bind 1:1 to rows of the
  landmark table, so there is no association bookkeeping at all;
* **keyframes live in a ring** of static size R — the ring is the
  sliding BA window; a keyframe's ring column holds every slot's pixel
  observation at that keyframe, so the observation matrix (N, R) *is*
  a ``BATracks`` problem with ``obs_pose[n, j] = j``;
* slot lifecycle is handled by an age handshake: a slot's observation
  row survives only while the tracker kept the same particle alive
  through every frame between keyframes (age arithmetic, no ids);
* new landmarks triangulate from their oldest + newest ring
  observations (vmapped DLT, algorithms/geometry.py) gated by parallax
  and reprojection sanity; keyframe poses come from a batched
  Gauss-Newton PnP against the live map; the window refines with
  ``ba_solve_tracks`` (optionally landmark-sharded over a mesh);
* one ``slam_step`` is a single jitted program (keyframe work behind
  ``lax.cond``); a clip runs under ``lax.scan`` (``slam_run``).

Monocular bootstrap: the first two keyframe poses pin the gauge and the
scale (they are taken from ``bootstrap_poses``, e.g. an external odometry
prior or ground truth in tests — the classic stereo/known-baseline init).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..algorithms.geometry import triangulate_ls
from ..algorithms.video_extruder import (VideoExtruderConfig,
                                         VideoExtruderState,
                                         video_extruder_init,
                                         video_extruder_update)
from ..core.image import Image2d, from_array
from ..core.interp import extract_patches
from .ba import (BATracks, ba_solve_tracks, project, proj_jacobians,
                 track_residuals)
from .se3 import se3_exp, se3_inverse

_HUGE = 1e30


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Static pipeline knobs. ``tracker.capacity`` is also the landmark
    table size; ``ring`` is the sliding-window length (BA poses)."""
    intrinsics: Tuple[float, float, float, float]   # fx, fy, cx, cy
    keyframe_period: int = 4
    ring: int = 8
    ba_iters: int = 3
    ba_huber: float = 4.0
    ba_lam0: float = 1e-4
    ba_linalg: str = "chol"            # window-BA solver flavour:
    #                                    "chol" (closed-form landmark
    #                                    inverses + Cholesky pose solve,
    #                                    ~1 ms/iter faster on TPU, safe
    #                                    for parallax-gated windows) or
    #                                    "lu" (pivoted; robust at the
    #                                    near-singular tail / M >= 128 —
    #                                    see ba.ba_solve_tracks)
    prune_reproj: float = 1.5          # post-BA obs outlier gate (px)
    subpix_refine: bool = False        # sub-pixel obs chain (KLT vs the
    #                                    previous keyframe's patch).
    #                                    Opt-in: measured on the eval
    #                                    sequences (round 4), the chain
    #                                    LOWERS per-observation error
    #                                    (median 1.67 vs 2.18 px) but
    #                                    worsens ATE (0.093 -> 0.198 on
    #                                    forward+yaw): translation-only
    #                                    KLT on scale-changing patches
    #                                    adds a small radially-correlated
    #                                    bias that BA cannot average
    #                                    away, while integer quantisation
    #                                    is iid and does. An affine KLT
    #                                    would remove the bias.
    min_parallax: float = 3.0          # px between first/last obs
    max_reproj: float = 3.0            # px acceptance after triangulation
    pnp_iters: int = 6
    history: int = 64                  # keyframe trajectory capacity
    desc_patch: int = 7                # relocalization descriptor patch
    # --- landmark archive + loop closure + recovery (pose graph) -------
    archive_size: int = 1024           # retired-landmark ring capacity
    lc_slots: int = 8                  # loop-closure edge ring capacity
    lc_min_inliers: int = 12           # matches needed to accept a closure
    lc_max_err: float = 1.5            # mean reproj gate for a closure (px)
    lc_min_gap: int = 12               # frames: archive entries older than
    #                                    this count as "revisited"
    lc_search_radius: float = 8.0      # px claim radius around projection
    lc_appearance_gate: float = 0.35   # SAD fraction of descriptor energy
    rec_max_err: float = 6.0           # recovery-PnP acceptance (px) —
    #                                    looser than the closure gate: a
    #                                    lost tracker prefers a coarse fix
    #                                    over none at all
    pg_lost_w: float = 0.05            # odometry edge weight at a lost /
    #                                    recovered keyframe (its relative
    #                                    pose is dead-reckoned or jumped —
    #                                    the smoother should place loop
    #                                    corrections exactly there)
    lc_dcs_c: float = 0.3              # DCS kernel scale (SE3 units) for
    #                                    robust closure reweighting
    lc_vote_range: float = 1.2         # consensus-vote span (scene units):
    #                                    the translation-correction
    #                                    histogram covers ±this; set to the
    #                                    largest drift a closure should
    #                                    recover from
    pose_graph_iters: int = 8
    min_tracked: int = 10              # live-landmark PnP starvation gate
    enable_recovery: bool = True       # static: run the archive PnP
    #                                    (tracking recovery + loop-closure
    #                                    measurement) every keyframe.
    #                                    False compiles it out — the
    #                                    matched "tracking+BA" benchmark
    #                                    configuration (the reference has
    #                                    no such machinery to compare
    #                                    against); archive WRITES remain,
    #                                    so relocalize() stays usable.
    tracker: VideoExtruderConfig = dataclasses.field(
        default_factory=lambda: VideoExtruderConfig(
            capacity=512, detect_k=256, nscales=3, winsize=9,
            keypoint_spacing=10, detector_period=1))


@struct.dataclass
class SlamState:
    tracker: VideoExtruderState
    kf_pose: jax.Array      # (R, 4, 4) ring of keyframe poses (cam<-world)
    kf_valid: jax.Array     # (R,) bool
    obs_uv: jax.Array       # (N, R, 2) pixel obs per slot x ring column
    obs_valid: jax.Array    # (N, R) bool
    lm_X: jax.Array         # (N, 3) landmark positions
    lm_valid: jax.Array     # (N,) bool
    lm_desc: jax.Array      # (N, P*P) patch descriptor (latest keyframe)
    desc_ctr: jax.Array     # (N, 2) float32 integer centre lm_desc was
    #                         cut at (anchors the sub-pixel obs chain)
    age_at_kf: jax.Array    # (N,) tracker age at the last keyframe
    n_keyframes: jax.Array  # () int32
    hist_pose: jax.Array    # (H, 4, 4) global keyframe trajectory
    hist_frame: jax.Array   # (H,) int32 frame id per keyframe (-1 empty)
    # --- landmark archive (loop closure / recovery map) ----------------
    arch_X: jax.Array       # (A, 3) archived landmark positions (world)
    arch_desc: jax.Array    # (A, P*P) descriptor at archive time
    arch_frame: jax.Array   # (A,) int32 frame id archived at (-1 empty)
    arch_ptr: jax.Array     # () int32 ring write pointer
    arch_of_slot: jax.Array  # (N,) int32 slot -> archive row (-1 none)
    # --- pose-graph edges ----------------------------------------------
    pg_T: jax.Array         # (H, 4, 4) odometry edge k-1 -> k (rel pose)
    pg_w: jax.Array         # (H,) odometry edge weight (down-weighted at
    #                         lost/recovered keyframes)
    lc_j: jax.Array         # (L,) int32 loop-closure target keyframe
    lc_T: jax.Array         # (L, 4, 4) measured absolute pose constraint
    lc_w: jax.Array         # (L,) float32 edge weight (0 = empty)
    lc_ptr: jax.Array       # () int32 ring write pointer


def slam_init(cfg: SlamConfig,
              bootstrap_poses: Optional[jax.Array] = None) -> SlamState:
    """``bootstrap_poses``: (2, 4, 4) poses of the first two keyframes
    (pins gauge + monocular scale). Defaults to identity for both — a
    degenerate choice kept only for shape-compatible initialisation."""
    n = cfg.tracker.capacity
    r = cfg.ring
    eye = jnp.broadcast_to(jnp.eye(4), (r, 4, 4))
    kf_pose = eye
    if bootstrap_poses is not None:
        kf_pose = kf_pose.at[0:2].set(bootstrap_poses)
    return SlamState(
        tracker=video_extruder_init(cfg.tracker),
        kf_pose=kf_pose,
        kf_valid=jnp.zeros((r,), bool),
        obs_uv=jnp.zeros((n, r, 2), jnp.float32),
        obs_valid=jnp.zeros((n, r), bool),
        lm_X=jnp.zeros((n, 3), jnp.float32),
        lm_valid=jnp.zeros((n,), bool),
        lm_desc=jnp.zeros((n, cfg.desc_patch ** 2), jnp.float32),
        desc_ctr=jnp.zeros((n, 2), jnp.float32),
        age_at_kf=jnp.zeros((n,), jnp.int32),
        n_keyframes=jnp.int32(0),
        hist_pose=jnp.broadcast_to(jnp.eye(4), (cfg.history, 4, 4)),
        hist_frame=jnp.full((cfg.history,), -1, jnp.int32),
        arch_X=jnp.zeros((cfg.archive_size, 3), jnp.float32),
        arch_desc=jnp.zeros((cfg.archive_size, cfg.desc_patch ** 2),
                            jnp.float32),
        arch_frame=jnp.full((cfg.archive_size,), -1, jnp.int32),
        arch_ptr=jnp.int32(0),
        arch_of_slot=jnp.full((n,), -1, jnp.int32),
        pg_T=jnp.broadcast_to(jnp.eye(4), (cfg.history, 4, 4)),
        pg_w=jnp.ones((cfg.history,), jnp.float32),
        lc_j=jnp.zeros((cfg.lc_slots,), jnp.int32),
        lc_T=jnp.broadcast_to(jnp.eye(4), (cfg.lc_slots, 4, 4)),
        lc_w=jnp.zeros((cfg.lc_slots,), jnp.float32),
        lc_ptr=jnp.int32(0))


def pnp_gn(T0: jax.Array, X: jax.Array, uv: jax.Array, valid: jax.Array,
           intr: jax.Array, *, iters: int = 6, huber: float = 4.0,
           lam: float = 1e-4) -> Tuple[jax.Array, jax.Array]:
    """Single-pose Gauss-Newton PnP from masked 2D-3D matches.

    Returns (pose (4,4), mean |residual| over valid matches). Branchless:
    with < 4 valid matches the damped 6x6 system stays near-singular-free
    and the pose simply keeps its prior.
    """
    nvalid = jnp.maximum(jnp.sum(valid), 1)

    def body(T, _):
        # analytic Jacobian of the exp(δ)·T retraction (ba.proj_jacobians;
        # was jacfwd-through-se3_exp — same values, far fewer HLOs on the
        # keyframe hot path)
        pred, J, _ = proj_jacobians(T, X, intr)
        r = pred - uv                                          # (N, 2)
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))
        w = jnp.where(valid, w, 0.0)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nri,nrj->ij", Jw, J) + lam * jnp.eye(6)
        b = -jnp.einsum("nri,nr->i", Jw, r)
        # H is damped-PD: Cholesky skips LU's pivoting (cheaper on TPU)
        L = jax.scipy.linalg.cholesky(H, lower=True)
        delta = jax.scipy.linalg.cho_solve((L, True), b)
        return se3_exp(delta) @ T, None

    T, _ = jax.lax.scan(body, T0, None, length=iters)
    r = project(T, X, intr) - uv
    err = jnp.sum(jnp.where(valid, jnp.linalg.norm(r, axis=-1), 0.0)
                  ) / nvalid
    return T, err


def _refine_obs_subpix(frame: Image2d, pos: jax.Array, templ: jax.Array,
                       valid: jax.Array, patch: int,
                       iters: int = 4) -> Tuple[jax.Array, jax.Array]:
    """Sub-pixel KLT alignment of each slot's current position against its
    stored first-observation template (lm_desc) — forward-additive GN on
    pure translation, vmapped over slots.

    The tracker's semi-dense flow is integer-resolution; raw positions
    would put ~0.5 px of quantisation noise into every BA observation.
    Aligning to the FIRST observation's template is drift-free, and any
    constant per-template offset is absorbed by the landmark position.
    Returns (refined (N, 2), ok (N,)) — ok False where alignment diverged.
    """
    from ..core.interp import extract_patches_bilinear
    b = frame.border
    data = frame.data.astype(jnp.float32)
    # central-difference gradient buffer (2 full-image ops per keyframe)
    gr = jnp.gradient(data, axis=0)
    gc = jnp.gradient(data, axis=1)
    grad = jnp.stack([gr, gc], axis=-1)
    t = templ.reshape(templ.shape[0], patch, patch)

    def body(p, _):
        smp = extract_patches_bilinear(data, p + b, patch)       # (N,P,P)
        g = extract_patches_bilinear(grad, p + b, patch)         # (N,P,P,2)
        r = smp - t
        g1, g2 = g[..., 0], g[..., 1]
        a11 = jnp.sum(g1 * g1, axis=(1, 2))
        a12 = jnp.sum(g1 * g2, axis=(1, 2))
        a22 = jnp.sum(g2 * g2, axis=(1, 2))
        b1 = jnp.sum(g1 * r, axis=(1, 2))
        b2 = jnp.sum(g2 * r, axis=(1, 2))
        det = a11 * a22 - a12 * a12
        inv = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)
        step = -jnp.stack([(a22 * b1 - a12 * b2) * inv,
                           (a11 * b2 - a12 * b1) * inv], axis=-1)
        step = jnp.clip(step, -1.0, 1.0)
        return p + step, None

    refined, _ = jax.lax.scan(body, pos, None, length=iters)
    drift = jnp.linalg.norm(refined - pos, axis=1)
    # appearance-residual gate: a patch that no longer matches its
    # template (rotation/scale change the translation-only model cannot
    # fit) would contribute a BIASED displacement, and that bias is
    # correlated across slots (the whole image rotates/scales together) —
    # far more damaging to BA than the iid quantisation noise the chain
    # removes. Measured: without this gate a forward+yaw sequence's ATE
    # doubled; with it both eval sequences improve.
    smp = extract_patches_bilinear(data, refined + b, patch)
    sad = jnp.sum(jnp.abs(smp - t), axis=(1, 2))
    energy = jnp.maximum(jnp.sum(jnp.abs(t), axis=(1, 2)), 1.0)
    ok = valid & (drift <= 0.75) & (sad < 0.08 * energy)
    return jnp.where(ok[:, None], refined, pos), ok


def _projection_matrix(T: jax.Array, intr: jax.Array) -> jax.Array:
    """(3, 4) P = K [R|t] in (x=col, y=row) convention."""
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    K = K.at[0, 0].set(intr[0]).at[1, 1].set(intr[1])
    K = K.at[0, 2].set(intr[2]).at[1, 2].set(intr[3])
    return K @ T[:3]


def _det_shift_patches(frame: Image2d, pos: jax.Array,
                       patch: int) -> jax.Array:
    """(9, K, patch²) patches around each detection at the 9 ±1-px
    shifts — the appearance-gate templates of ``_map_vote_pnp``, hoisted
    so one extraction pass serves every map-PnP call on the frame
    (recovery + loop closure share the same detections).

    ONE (patch+2)² extraction per detection; the 9 shifted patches are
    static subviews of it (same pixels as 9 shifted extractions, ~5x
    less one-hot-matmul gather work)."""
    big = extract_patches(frame.data, pos + frame.border, patch + 2)
    qs = []
    for drr in (0, 1, 2):               # row shift drr-1 ∈ {-1, 0, +1}
        for dcc in (0, 1, 2):
            sub = big[:, drr:drr + patch, dcc:dcc + patch]
            qs.append(sub.reshape(-1, patch * patch))
    return jnp.stack(qs)


def _map_vote_pnp(X: jax.Array, desc: jax.Array, base: jax.Array,
                  pos: jax.Array, valid: jax.Array, frame: Image2d,
                  cfg: SlamConfig, T_prior: jax.Array, intr: jax.Array,
                  *, rounds: int = 2, det_patches: jax.Array = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drift-robust PnP of a frame's FAST detections against ANY landmark
    map (``X`` (A, 3) world positions, ``desc`` (A, P²) descriptors,
    ``base`` (A,) usable-entry mask) — the one matching routine behind
    tracking recovery, loop-closure measurement and relocalization.

    Stages (all branchless):

    1. **iterated translation-consensus vote** (``rounds``x): every map
       entry projects under the current pose estimate and pairs with its
       4 nearest detections within ``3x lc_search_radius`` (drift moves
       projections beyond the tight radius; several candidates per entry
       remove the nearest-neighbour bias toward "confirm the prior").
       Each pair votes for the camera-translation correction
       dt ≈ (uv - pred) * z / f — correct pairs agree on dt regardless
       of depth, aliased pairs scatter. The 3x3-smoothed histogram peak
       (a deterministic scatter-add stand-in for RANSAC) shifts the pose;
       iterating re-centres the candidate sets, converging through
       drifts much larger than the map's feature spacing.
    2. **one Huber GN PnP** on the final round's peak-consistent pairs,
       appearance-gated (min-over-±1px-shift SAD vs the entry's
       descriptor). No tight re-association afterwards: with a residual
       pose error of a few px, nearest-claim re-association latches onto
       feature-spacing aliases and drags the pose back toward the prior
       (measured on the loop scenario: it cost ~0.15 m of accuracy).

    Returns (T, err, n): pose, mean Huber-PnP reprojection error, and the
    number of DISTINCT detections among the inlier pairs."""
    fx, fy = intr[0], intr[1]
    posf = pos.astype(jnp.float32)
    a_n = X.shape[0]
    rows = jnp.arange(a_n)
    Xh = jnp.concatenate([X, jnp.ones((a_n, 1))], axis=1)
    energy = jnp.maximum(jnp.sum(jnp.abs(desc), axis=1), 1.0)
    R_wide = 3.0 * cfg.lc_search_radius
    C = 4
    NB = 33
    bmax = float(cfg.lc_vote_range)
    step = 2.0 * bmax / (NB - 1)

    def vote_round(Tp):
        pred = project(Tp[None], X, intr)                    # (A, 2)
        d2 = jnp.sum((pred[:, None] - posf[None]) ** 2, axis=-1)
        d2 = jnp.where(valid[None], d2, _HUGE)
        js, dss = [], []
        d2c = d2
        for _ in range(C):
            j = jnp.argmin(d2c, axis=1)
            dss.append(jnp.min(d2c, axis=1))
            js.append(j)
            d2c = d2c.at[rows, j].set(_HUGE)
        js = jnp.stack(js, axis=1)                           # (A, C)
        ds = jnp.stack(dss, axis=1)
        cand_uv = posf[js]                                   # (A, C, 2)
        z = (Xh @ Tp.T)[:, 2]
        txc = (cand_uv[..., 1] - pred[:, None, 1]) * z[:, None] / fx
        tyc = (cand_uv[..., 0] - pred[:, None, 0]) * z[:, None] / fy
        m = base[:, None] & (ds <= R_wide ** 2) & (z[:, None] > 0.1)
        bx = jnp.clip(jnp.round((txc + bmax) / step).astype(jnp.int32),
                      0, NB - 1)
        by = jnp.clip(jnp.round((tyc + bmax) / step).astype(jnp.int32),
                      0, NB - 1)
        votes = jnp.zeros((NB * NB,), jnp.float32).at[
            jnp.where(m, by * NB + bx, NB * NB).reshape(-1)].add(
            1.0, mode="drop").reshape(NB, NB)
        vp = jnp.pad(votes, 1)
        sm = sum(vp[i:i + NB, jj:jj + NB]
                 for i in range(3) for jj in range(3))
        pk = jnp.argmax(sm.reshape(-1))
        # zero eligible votes: the all-zero histogram's argmax is bin 0 =
        # (-lc_vote_range, -lc_vote_range), which would shift the prior
        # pose by that every round — keep dt = 0 instead (pairs stay
        # empty, so downstream inl is all-False and the PnP keeps the
        # prior; callers gate on the returned inlier count)
        any_votes = sm.reshape(-1)[pk] > 0
        tx0 = jnp.where(any_votes,
                        (pk % NB).astype(jnp.float32) * step - bmax, 0.0)
        ty0 = jnp.where(any_votes,
                        (pk // NB).astype(jnp.float32) * step - bmax, 0.0)
        dd = jnp.where(m, (txc - tx0) ** 2 + (tyc - ty0) ** 2, _HUGE)
        return Tp.at[0, 3].add(tx0).at[1, 3].add(ty0), js, cand_uv, dd

    T = T_prior
    for _ in range(rounds):
        T, js, cand_uv, dd = vote_round(T)

    cb = jnp.argmin(dd, axis=1)
    db = jnp.min(dd, axis=1)
    uv1 = cand_uv[rows, cb]
    j1 = js[rows, cb]
    inl = base & (db <= (2.0 * step) ** 2)
    # appearance gate on the chosen pairs (min-over-shift SAD). The
    # geometric consensus has already filtered hard, so the gate runs at
    # 2x the claim-time threshold — it only needs to reject gross
    # appearance mismatches, not arbitrate between near-identical
    # features (a tight gate here measured ~3x fewer inliers with a
    # prior-consistent survivor bias).
    if det_patches is None:
        det_patches = _det_shift_patches(frame, pos, cfg.desc_patch)
    best = jnp.full((a_n,), _HUGE)
    for s in range(det_patches.shape[0]):
        q = det_patches[s][j1]                       # (A, P²) row gather
        best = jnp.minimum(best, jnp.sum(jnp.abs(q - desc), axis=1))
    inl = inl & (best < 2.0 * cfg.lc_appearance_gate * energy)

    T1, _ = pnp_gn(T, X, uv1, inl, intr,
                   iters=cfg.pnp_iters, huber=cfg.ba_huber)
    # annealed polish on the SAME pair set (re-associating at a tight
    # radius here measurably dragged the pose back toward feature-spacing
    # aliases — see the stage-1 docstring)
    T1, err = pnp_gn(T1, X, uv1, inl, intr,
                     iters=cfg.pnp_iters, huber=cfg.ba_huber / 2)
    q_n = posf.shape[0]
    seen = jnp.zeros((q_n,), bool).at[
        jnp.where(inl, j1, q_n)].max(True, mode="drop")
    return T1, err, jnp.sum(seen)


def _archive_pnp(state: SlamState, frame2: Image2d, cfg: SlamConfig,
                 T_prior: jax.Array, intr: jax.Array,
                 min_frame_gap: int) -> Tuple[jax.Array, jax.Array,
                                              jax.Array]:
    """PnP of the current frame against the landmark ARCHIVE (retired
    map) via ``_map_vote_pnp``.

    ``min_frame_gap``: archive entries at least this many frames old form
    the *revisit* match set — the loop-closure measurement (fresh entries
    share the current odometry drift and would just confirm it); all
    entries form the *recovery* set.

    Returns ((T_rec, err_rec, n_rec), (T_lc, err_lc, n_lc)): PnP against
    the full set (tracking recovery) and against the revisit set (loop
    closure). One FAST detection pass serves both; counts are DISTINCT
    matched detections."""
    from ..algorithms.fast import fast9

    pos, score, valid = fast9(frame2, cfg.tracker.detector_th,
                              k=cfg.tracker.detect_k, blockwise=True,
                              block_size=cfg.tracker.keypoint_spacing)
    cur_frame = state.tracker.frame_id
    filled = state.arch_frame >= 0
    old_enough = filled & (state.arch_frame <= cur_frame - min_frame_gap)

    # one patch-extraction pass serves both PnP calls (the expensive
    # image gathers are per-detection, not per-map-entry)
    det_patches = _det_shift_patches(frame2, pos, cfg.desc_patch)
    T_rec, err_rec, n_rec = _map_vote_pnp(
        state.arch_X, state.arch_desc, filled, pos, valid, frame2, cfg,
        T_prior, intr, det_patches=det_patches)
    T_lc, err_lc, n_lc = _map_vote_pnp(
        state.arch_X, state.arch_desc, old_enough, pos, valid, frame2,
        cfg, T_prior, intr, det_patches=det_patches)
    return ((T_rec, err_rec, n_rec), (T_lc, err_lc, n_lc))


def _do_keyframe(state: SlamState, frame2: Image2d, cfg: SlamConfig,
                 mesh=None, axis: str = "lm") -> SlamState:
    """Keyframe work: obs write -> PnP pose -> triangulate -> window BA.

    Traced under ``jax.default_matmul_precision("highest")``: TPU f32
    matmuls default to bf16 passes, and the back-end's SE(3) chain
    products / normal-equation assembly visibly degrade under them
    (measured at VGA: keyframe ATE 0.70 vs 0.05 for the f64 scalar CPU
    engine on the same clip). The tracker front-end stays at the fast
    default — its SAD cost volumes are integer-valued and robust.
    """
    with jax.default_matmul_precision("highest"):
        return _do_keyframe_inner(state, frame2, cfg, mesh, axis)


def _do_keyframe_inner(state: SlamState, frame2: Image2d, cfg: SlamConfig,
                       mesh=None, axis: str = "lm") -> SlamState:
    intr = jnp.asarray(cfg.intrinsics, jnp.float32)
    kps = state.tracker.keypoints
    n, r = state.obs_valid.shape
    kf = state.n_keyframes               # index of the NEW keyframe
    col = kf % r

    # --- slot continuity (age handshake) -----------------------------
    # the slot must have been alive at the previous keyframe
    # (age_at_kf > 0): a slot that was dead there and respawned on the
    # very next frame reaches age == 0 + period too, which would keep the
    # dead particle's template/landmark bound to the new particle
    first_kf = kf == 0
    continuous = jnp.where(
        first_kf, jnp.zeros((n,), bool),
        kps.alive & (state.age_at_kf > 0)
        & (kps.age == state.age_at_kf + cfg.keyframe_period))
    # broken slots lose their history (their particle died/respawned)
    obs_valid = state.obs_valid & continuous[:, None]
    lm_valid = state.lm_valid & continuous

    # --- sub-pixel observations (KLT chain off the previous keyframe) --
    # The tracker's semi-dense flow is integer-resolution; raw positions
    # would put ~0.5 px of quantisation noise into every BA observation.
    # Aligning against the PREVIOUS keyframe's patch (lm_desc, cut at the
    # known integer centre desc_ctr) measures the inter-keyframe motion
    # of that content precisely; accumulating it onto the previous
    # refined observation removes the quantisation without the
    # template-ageing parallax bias that anchoring to the BIRTH template
    # accrued (the round-3 design, which shipped disabled for that
    # reason). The residual error is a slow KLT random walk, reset
    # whenever a slot respawns.
    prev_col = jnp.where(kf >= 1, (kf - 1) % r, 0)
    if cfg.subpix_refine:
        refined, ref_ok = _refine_obs_subpix(
            frame2, kps.position, state.lm_desc, continuous & kps.alive,
            cfg.desc_patch)
        chain = state.obs_uv[:, prev_col] + (refined - state.desc_ctr)
        near = jnp.max(jnp.abs(chain - kps.position), axis=1) <= 1.5
        ok_chain = continuous & ref_ok & near
        obs_pos = jnp.where(ok_chain[:, None], chain,
                            jnp.where(continuous[:, None], kps.position,
                                      jnp.round(kps.position)))
    else:
        # new rows observe at the integer centre their template is cut at
        obs_pos = jnp.where(continuous[:, None], kps.position,
                            jnp.round(kps.position))

    # --- pose estimate for this keyframe (PnP on live landmarks) ------
    T_prior = state.kf_pose[prev_col]
    T_pnp, _ = pnp_gn(T_prior, state.lm_X, obs_pos,
                      lm_valid & kps.alive, intr,
                      iters=cfg.pnp_iters, huber=cfg.ba_huber)

    # --- tracking-lost recovery + loop-closure measurement -------------
    # one FAST pass against the landmark archive serves both: the full
    # match set re-localises a starved tracker (blackout/occlusion), the
    # old-entries-only set measures a revisit (loop closure)
    if cfg.enable_recovery:
        (T_rec, err_rec, n_rec), (T_lc, err_lc, n_lc) = _archive_pnp(
            state, frame2, cfg, T_prior, intr, cfg.lc_min_gap)
    else:                      # compiled out: no recovery, no closures
        T_rec = T_lc = T_prior
        err_rec = err_lc = jnp.float32(0.0)
        n_rec = n_lc = jnp.int32(0)
    n_tracked = jnp.sum(lm_valid & kps.alive)
    rec_ok = (n_rec >= cfg.lc_min_inliers) & (err_rec < cfg.rec_max_err)
    lost = n_tracked < cfg.min_tracked
    T_pnp = jnp.where(lost & rec_ok, T_rec, T_pnp)

    # bootstrap: keyframes 0 and 1 keep their preset (gauge/scale) poses
    T_new = jnp.where(kf < 2, state.kf_pose[col], T_pnp)

    kf_pose = state.kf_pose.at[col].set(T_new)
    kf_valid = state.kf_valid.at[col].set(True)

    # --- write this keyframe's observations ---------------------------
    # the overwritten ring column belonged to the evicted keyframe
    obs_valid = obs_valid.at[:, col].set(kps.alive)
    obs_uv = state.obs_uv.at[:, col].set(obs_pos)

    # descriptors for relocalization: refresh every live slot so the map
    # always carries its LATEST appearance (patch content around a feature
    # evolves with parallax; a briefly-lost camera matches against what
    # the map looked like moments ago, not at each track's birth)
    ctr = jnp.round(kps.position).astype(jnp.int32) + frame2.border
    patches = extract_patches(frame2.data, ctr, cfg.desc_patch)
    desc = patches.reshape(n, -1).astype(jnp.float32)
    lm_desc = jnp.where(kps.alive[:, None], desc, state.lm_desc)
    desc_ctr = jnp.where(kps.alive[:, None],
                         jnp.round(kps.position), state.desc_ctr)

    # --- triangulate new landmarks ------------------------------------
    # oldest valid ring column per slot (in keyframe order, the ring
    # holds keyframes kf-r+1..kf; walk from oldest to newest)
    ages = jnp.arange(r - 1, -1, -1)     # offsets back from current kf
    kf_ids = kf - ages                                    # ascending
    cols = kf_ids % r
    valid_cols = (kf_ids >= 0) & kf_valid[cols]
    obs_at = obs_valid[:, cols] & valid_cols[None]        # (N, R) ordered
    first_ord = jnp.argmax(obs_at, axis=1)                # first True
    has_two = (jnp.sum(obs_at, axis=1) >= 2) & obs_at[
        jnp.arange(n), first_ord]
    first_col = cols[first_ord]
    uv0 = obs_uv[jnp.arange(n), first_col]                # (N, 2) row,col
    uv1 = obs_pos
    # ROTATION-COMPENSATED parallax: raw |uv1 - uv0| counts the
    # rotation-induced flow too, so under yaw the gate passes points
    # with pure-rotation "parallax" whose rays are near-parallel — their
    # DLT solutions are garbage the reprojection gate then rejects,
    # starving the map (measured: 21 landmarks on a 120-frame
    # forward+yaw run). Predict uv0's position under the RELATIVE
    # ROTATION alone (ray through uv0, rotated by R_rel, reprojected);
    # the residual against uv1 is the translation-induced parallax that
    # actually conditions triangulation.
    T0 = kf_pose[first_col]                               # (N, 4, 4)
    R_rel = jnp.einsum("ij,nkj->nik", T_new[:3, :3], T0[:, :3, :3])
    ray = jnp.stack([(uv0[:, 1] - intr[2]) / intr[0],
                     (uv0[:, 0] - intr[3]) / intr[1],
                     jnp.ones((n,))], axis=1)             # (N, 3) cam0
    rot = jnp.einsum("nij,nj->ni", R_rel, ray)
    zr = jnp.where(jnp.abs(rot[:, 2]) < 1e-6, 1e-6, rot[:, 2])
    uv_rot = jnp.stack([intr[1] * rot[:, 1] / zr + intr[3],
                        intr[0] * rot[:, 0] / zr + intr[2]], axis=1)
    parallax = jnp.linalg.norm(uv1 - uv_rot, axis=1)
    want = (kps.alive & has_two & ~lm_valid
            & (parallax >= cfg.min_parallax) & (first_col != col))

    P1 = jax.vmap(lambda c: _projection_matrix(kf_pose[c], intr))(
        first_col)                                        # (N, 3, 4)
    P2 = _projection_matrix(T_new, intr)
    X = triangulate_ls(P1, jnp.broadcast_to(P2, (n, 3, 4)),
                       uv0[:, ::-1], uv1[:, ::-1])        # (x=col, y=row)

    # acceptance: in front of both cameras + reprojection sanity
    z1 = jax.vmap(lambda T, x: (T @ jnp.append(x, 1.0))[2])(
        kf_pose[first_col], X)
    z2 = jax.vmap(lambda x: (T_new @ jnp.append(x, 1.0))[2])(X)
    re0 = jnp.linalg.norm(project(kf_pose[first_col], X, intr) - uv0,
                          axis=1)
    re1 = jnp.linalg.norm(project(T_new[None], X, intr) - uv1, axis=1)
    good = want & (z1 > 0.05) & (z2 > 0.05) & (re0 < cfg.max_reproj) & (
        re1 < cfg.max_reproj)
    lm_X = jnp.where(good[:, None], X, state.lm_X)
    lm_valid = lm_valid | good

    # --- sliding-window bundle adjustment ------------------------------
    # fix the two oldest valid keyframes in the ring (gauge + scale)
    first2_ord = jnp.argsort(jnp.where(valid_cols, jnp.arange(r), r))[:2]
    fixed = jnp.zeros((r,), bool).at[cols[first2_ord]].set(True)
    fixed = fixed & kf_valid
    obs_pose = jnp.broadcast_to(jnp.arange(r)[None], (n, r))
    ba_obs_valid = obs_valid & lm_valid[:, None] & kf_valid[None]
    prob = BATracks(poses=kf_pose, landmarks=lm_X,
                    obs_pose=obs_pose.astype(jnp.int32),
                    obs_uv=obs_uv, obs_valid=ba_obs_valid,
                    intrinsics=intr, fixed_poses=fixed)
    enough = jnp.sum(ba_obs_valid) >= 12
    solved, _ = ba_solve_tracks(prob, iters=cfg.ba_iters,
                                huber=cfg.ba_huber, lam0=cfg.ba_lam0,
                                mesh=mesh, axis=axis, ring_layout=True,
                                linalg=cfg.ba_linalg)
    kf_pose = jnp.where(enough, solved.poses, kf_pose)
    lm_X = jnp.where(enough, solved.landmarks, lm_X)

    # post-BA outlier pruning: an observation that still reprojects worse
    # than ``prune_reproj`` px is a bad track (a particle that jumped to a
    # different feature while staying "alive") — drop it so it cannot
    # keep biasing the window
    res = track_residuals(solved._replace(poses=kf_pose, landmarks=lm_X),
                          ring_layout=True)
    bad = (jnp.linalg.norm(res, axis=-1) > cfg.prune_reproj) & ba_obs_valid
    obs_valid = jnp.where(enough, obs_valid & ~bad, obs_valid)

    # --- archive new landmarks (the loop-closure / recovery map) -------
    # every freshly triangulated landmark is written once into the
    # archive ring with its descriptor + frame id; unlike the live table
    # its slot is never recycled by the tracker, so the camera can find
    # it again after drift or blackout. Archived AFTER the window BA so
    # the stored position is the refined one, not the raw DLT.
    a_cap = state.arch_X.shape[0]
    # refresh entries whose slot is still live (BA keeps improving them)
    ref_idx = jnp.where(lm_valid & (state.arch_of_slot >= 0),
                        state.arch_of_slot, a_cap)
    arch_X = state.arch_X.at[ref_idx].set(lm_X, mode="drop")
    # then append the freshly triangulated ones
    a_off = jnp.cumsum(good.astype(jnp.int32)) - 1
    a_idx = jnp.where(good, (state.arch_ptr + a_off) % a_cap, a_cap)
    arch_X = arch_X.at[a_idx].set(lm_X, mode="drop")
    arch_desc = state.arch_desc.at[a_idx].set(desc, mode="drop")
    arch_frame = state.arch_frame.at[a_idx].set(
        state.tracker.frame_id, mode="drop")
    arch_ptr = (state.arch_ptr + jnp.sum(good)) % a_cap
    arch_of_slot = jnp.where(
        good, jnp.minimum(a_idx, a_cap - 1).astype(jnp.int32),
        jnp.where(lm_valid, state.arch_of_slot, -1))
    # ring-wrap invalidation: an append that overwrites an archive row
    # still referenced by an older live slot would let that slot's next
    # refresh scatter corrupt the new entry's position — clear any
    # pointer whose row was just overwritten by someone else
    overwritten = jnp.zeros((a_cap,), bool).at[a_idx].set(True,
                                                          mode="drop")
    stale = ((arch_of_slot >= 0) & ~good
             & overwritten[jnp.clip(arch_of_slot, 0, a_cap - 1)])
    arch_of_slot = jnp.where(stale, -1, arch_of_slot)

    # --- trajectory history -------------------------------------------
    # write the new keyframe + refresh every keyframe still in the ring
    # (BA just moved them); out-of-capacity ids drop
    hcap = state.hist_pose.shape[0]
    hist_frame = state.hist_frame.at[
        jnp.where(kf < hcap, kf, hcap)].set(
        state.tracker.frame_id, mode="drop")
    in_ring = valid_cols & (kf_ids >= 0) & (kf_ids < hcap)
    hist_pose = state.hist_pose.at[
        jnp.where(in_ring, kf_ids, hcap)].set(kf_pose[cols], mode="drop")
    hist_pose = hist_pose.at[
        jnp.where(kf < hcap, kf, hcap)].set(kf_pose[col], mode="drop")

    # --- pose-graph edges ----------------------------------------------
    # odometry: BA-refined relative pose k-1 -> k, refreshed while both
    # ends are in the ring (the write at eviction time is final)
    oldest = kf - (r - 1)
    pair_ok = (valid_cols & (kf_ids - 1 >= jnp.maximum(oldest, 0))
               & (kf_ids >= 1) & (kf_ids < hcap))
    prev_cols = (kf_ids - 1) % r
    rel = jax.vmap(lambda a, b: se3_inverse(a) @ b)(
        kf_pose[prev_cols], kf_pose[cols])
    pg_T = state.pg_T.at[
        jnp.where(pair_ok, kf_ids, hcap)].set(rel, mode="drop")
    # odometry confidence: a lost keyframe's pose is dead-reckoned (or a
    # recovery jump) — its incoming relative edge carries no real
    # odometry. Down-weighting it lets the smoother place loop-closure
    # corrections AT the break instead of bending healthy segments.
    pg_w = state.pg_w.at[jnp.where(kf < hcap, kf, hcap)].set(
        jnp.where(lost, cfg.pg_lost_w, 1.0), mode="drop")

    # loop closure: accept the revisit PnP as an absolute-pose edge when
    # enough OLD archive entries agree (an edge from the gauge node 0)
    lc_cap = state.lc_w.shape[0]
    lc_good = ((kf >= 2) & (kf < hcap)
               & (n_lc >= cfg.lc_min_inliers) & (err_lc < cfg.lc_max_err))
    li = jnp.where(lc_good, state.lc_ptr % lc_cap, lc_cap)
    lc_j = state.lc_j.at[li].set(kf, mode="drop")
    lc_T = state.lc_T.at[li].set(T_lc, mode="drop")
    # measurement-covariance weight: inlier support scales confidence up,
    # the PnP's residual scales it down quadratically — a closure whose
    # matches disagree by several px (a mixed pre-/post-drift archive
    # set) is nearly ignored, a tight one counts like a few odometry
    # edges (w=1 each). The 1.5 px pivot is the map-noise floor: archive
    # positions carry ~0.3 triangulation noise, so even a perfect pose
    # measurement leaves ~1-2 px of reprojection residual.
    w_lc = (jnp.minimum(n_lc.astype(jnp.float32) / 8.0, 4.0)
            * (1.5 / jnp.maximum(err_lc, 1.5)) ** 2)
    lc_w = state.lc_w.at[li].set(w_lc, mode="drop")
    lc_ptr = state.lc_ptr + lc_good.astype(jnp.int32)

    # --- pose-graph smoothing over the keyframe history ----------------
    # The graph is a SMOOTHER on hist_pose: odometry chain + absolute
    # revisit constraints, anchored at node 0. It does not feed back into
    # the live window (the window keeps its internally-BA-consistent
    # drifting frame; hist carries the globally-corrected trajectory) —
    # the design the reference stubs at structure_from_motion.hh:55-56.
    #
    # Incremental policy (round 5): the FULL double solve (GN to
    # convergence, then the DCS robust re-solve) runs only on keyframes
    # that accept a NEW closure — that is when the constraint set gains
    # information. Every other keyframe runs a cheap 2-iteration refresh
    # so the in-ring history entries just overwritten from the (drifting)
    # window frame get pulled back onto the smoothed trajectory; the
    # history is already near-converged there, so 2 GN iterations with
    # DCS weights computed from the CURRENT residuals suffice. Before
    # this, every keyframe after the first closure paid 2x8 iterations of
    # a dense (6H)^2 solve — ~30 ms/keyframe at history=64 on v5e,
    # dominating the whole engine.
    from .pose_graph import (PoseGraph, pose_graph_residuals,
                             pose_graph_solve)

    def build_graph(hist, lcw):
        k_ids2 = jnp.arange(hcap)
        odo_valid = (k_ids2 >= 1) & (k_ids2 <= jnp.minimum(kf, hcap - 1))
        n0 = hist[0]
        lcz = jax.vmap(lambda t: se3_inverse(n0) @ t)(lc_T)
        return PoseGraph(
            poses=hist,
            edge_i=jnp.concatenate([jnp.maximum(k_ids2 - 1, 0),
                                    jnp.zeros((lc_cap,), jnp.int32)]),
            edge_j=jnp.concatenate([k_ids2, lc_j]),
            edge_T=jnp.concatenate([pg_T, lcz]),
            edge_w=jnp.concatenate([pg_w, lcw]),
            edge_valid=jnp.concatenate([odo_valid, lc_w > 0]),
            fixed=(k_ids2 == 0) | (k_ids2 > jnp.minimum(kf, hcap - 1)))

    def dcs_weights(g):
        # DCS (switchable-constraint style): a closure inconsistent with
        # the jointly-optimised graph is an outlier measurement — scale
        # its weight by the Dynamic Covariance Scaling kernel of its
        # residual under the given poses
        res = pose_graph_residuals(g)[hcap:]
        rr = jnp.sum(res * res, axis=-1)
        c2 = jnp.float32(cfg.lc_dcs_c ** 2)
        return jnp.minimum(1.0, 2.0 * c2 / (c2 + rr))

    def solve_full(hist):
        g = build_graph(hist, lc_w)
        solved, _ = pose_graph_solve(g, iters=cfg.pose_graph_iters)
        s = dcs_weights(g._replace(poses=solved.poses))
        g2 = build_graph(solved.poses, lc_w * s)
        solved2, _ = pose_graph_solve(g2, iters=cfg.pose_graph_iters)
        return solved2.poses

    def solve_refresh(hist):
        s = dcs_weights(build_graph(hist, lc_w))
        solved, _ = pose_graph_solve(build_graph(hist, lc_w * s),
                                     iters=2)
        return solved.poses

    # with recovery compiled out no closure can ever be accepted (n_lc
    # is the constant 0, so lc_good is False and lc_w stays all-zero) —
    # both cond branches below are identities; skip them STATICALLY so
    # the matched configuration neither traces the smoother nor, under
    # ``vmap`` (stream batching, where a cond lowers to executing both
    # branches), pays for it every keyframe
    if cfg.enable_recovery:
        hist_pose = jax.lax.cond(
            lc_good, solve_full,
            lambda h: jax.lax.cond(jnp.any(lc_w > 0), solve_refresh,
                                   lambda hh: hh, h),
            hist_pose)

    return state.replace(
        kf_pose=kf_pose, kf_valid=kf_valid, obs_uv=obs_uv,
        obs_valid=obs_valid, lm_X=lm_X, lm_valid=lm_valid,
        lm_desc=lm_desc, desc_ctr=desc_ctr, age_at_kf=kps.age,
        n_keyframes=kf + 1, hist_pose=hist_pose, hist_frame=hist_frame,
        arch_X=arch_X, arch_desc=arch_desc, arch_frame=arch_frame,
        arch_ptr=arch_ptr, arch_of_slot=arch_of_slot, pg_T=pg_T,
        pg_w=pg_w, lc_j=lc_j, lc_T=lc_T, lc_w=lc_w, lc_ptr=lc_ptr)


def slam_step(state: SlamState, frame1: Image2d, frame2: Image2d,
              cfg: SlamConfig, mesh=None, axis: str = "lm",
              pyr1=None, pyr2=None) -> SlamState:
    """One frame: track, and on keyframe frames run the back-end."""
    tracker = video_extruder_update(state.tracker, frame1, frame2,
                                    cfg.tracker, pyr1=pyr1, pyr2=pyr2)
    state = state.replace(tracker=tracker)
    is_kf = tracker.frame_id % cfg.keyframe_period == 0
    return jax.lax.cond(
        is_kf, lambda s: _do_keyframe(s, frame2, cfg, mesh=mesh,
                                      axis=axis),
        lambda s: s, state)


def slam_run(frames: jax.Array, cfg: SlamConfig,
             bootstrap_poses: Optional[jax.Array] = None,
             mesh=None, axis: str = "lm", collect_tracks: bool = False):
    """Whole-clip SLAM under one ``lax.scan`` (frames (T, H, W)).

    With ``collect_tracks`` returns (state, (positions (T, K, 2),
    alive (T, K))) — the per-frame tracker history, for evaluation
    harnesses (evaluation/slam_eval.py)."""
    from ..algorithms.pyramid import pyramid as build_pyramid
    b = max(3, cfg.tracker.winsize)
    state = slam_init(cfg, bootstrap_poses)

    def pad(fr):
        return from_array(fr, border=b, border_mode="mirror")

    def step(carry, fr2):
        st, f1_data, pyr1 = carry
        f1 = Image2d(data=f1_data, border=b)
        f2 = pad(fr2)
        pyr2 = build_pyramid(f2, cfg.tracker.nscales, border=b)
        st = slam_step(st, f1, f2, cfg, mesh=mesh, axis=axis,
                       pyr1=pyr1, pyr2=pyr2)
        out = ((st.tracker.keypoints.position, st.tracker.keypoints.alive)
               if collect_tracks else None)
        return (st, f2.data, pyr2), out

    f0 = pad(frames[0])
    pyr0 = build_pyramid(f0, cfg.tracker.nscales, border=b)
    (final, _, _), hist = jax.lax.scan(step, (state, f0.data, pyr0),
                                       frames)
    return (final, hist) if collect_tracks else final


def slam_run_streams(frames: jax.Array, cfg: SlamConfig,
                     bootstrap_poses: jax.Array) -> SlamState:
    """``slam_run`` over S INDEPENDENT clips at once on one chip —
    frames (S, T, H, W), bootstrap_poses (S, 2, 4, 4); returns the
    batched final SlamState (leading axis S).

    The aggregate-throughput (serving) configuration: at small
    geometries a single stream cannot fill the chip — per-op fixed
    overheads dominate (QVGA: ~0.6 ms/frame regardless of work) — but S
    vmapped streams amortise every op's overhead S ways, the TPU answer
    to multi-camera / multi-clip serving. The CPU engine gains nothing
    from the same trick (its cores are already saturated by one stream),
    so per-chip throughput scales ~linearly in S until the chip fills.

    Restructured without ``lax.cond``: under ``vmap`` a cond lowers to
    executing BOTH branches every frame, which would run the whole
    back-end per frame. Keyframe cadence is identical across streams
    (frame index, not data, decides it), so the clip is processed in
    chunks of ``keyframe_period`` tracker steps with the keyframe work
    ALWAYS run at chunk end — the exact cadence ``slam_run`` implements
    with a cond (tracker.frame_id % period == 0). Requires
    T % keyframe_period == 0 and ``enable_recovery=False`` (the
    smoother's data-dependent double-solve stays cond-gated on the full
    engine; see ``_do_keyframe``)."""
    from ..algorithms.pyramid import pyramid as build_pyramid
    period = cfg.keyframe_period
    if frames.shape[1] % period != 0:
        raise ValueError(
            f"slam_run_streams needs T % keyframe_period == 0, got "
            f"T={frames.shape[1]}, period={period}")
    if cfg.enable_recovery:
        raise ValueError(
            "slam_run_streams requires enable_recovery=False (the "
            "closure smoother is cond-gated, which under vmap would "
            "execute on every keyframe)")
    b = max(3, cfg.tracker.winsize)

    def one(clip, boot):
        state = slam_init(cfg, boot)

        def pad(fr):
            return from_array(fr, border=b, border_mode="mirror")

        def tracker_step(carry, fr2):
            st, f1_data, pyr1 = carry
            f1 = Image2d(data=f1_data, border=b)
            f2 = pad(fr2)
            pyr2 = build_pyramid(f2, cfg.tracker.nscales, border=b)
            tracker = video_extruder_update(st.tracker, f1, f2,
                                            cfg.tracker, pyr1=pyr1,
                                            pyr2=pyr2)
            return (st.replace(tracker=tracker), f2.data, pyr2), None

        def chunk_step(carry, chunk):          # chunk (period, H, W)
            # keyframes fire when tracker.frame_id % period == 0 and
            # frame_id starts at -1 — i.e. after the FIRST tracker step
            # of each period (frame_id 0, period, 2*period, ...)
            carry, _ = tracker_step(carry, chunk[0])
            st, f_data, pyr = carry
            st = _do_keyframe(st, Image2d(data=f_data, border=b), cfg)
            carry, _ = jax.lax.scan(tracker_step, (st, f_data, pyr),
                                    chunk[1:])
            return carry, None

        f0 = pad(clip[0])
        pyr0 = build_pyramid(f0, cfg.tracker.nscales, border=b)
        chunks = clip.reshape((-1, period) + clip.shape[1:])
        (final, _, _), _ = jax.lax.scan(chunk_step,
                                        (state, f0.data, pyr0), chunks)
        return final

    return jax.vmap(one)(frames, bootstrap_poses)


# ---------------------------------------------------------------------------
# Relocalization: descriptor match against the live map + PnP.
# ---------------------------------------------------------------------------

def relocalize(state: SlamState, frame: Image2d, cfg: SlamConfig,
               detect_th: int = 10
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Recover the camera pose of ``frame`` from the LIVE map alone (the
    briefly-lost-tracking scenario). Same map-agnostic routine as the
    archive recovery/loop-closure path (``_map_vote_pnp``): iterated
    translation-consensus voting over FAST detections, then Huber GN PnP
    on the appearance-gated peak-consistent pairs.

    Returns (pose (4, 4), mean reprojection error of the matches, number
    of distinct inlier detections). Gate on the count: with zero eligible
    matches the pose is simply the prior keyframe pose and the error
    reads 0 — ``n >= cfg.lc_min_inliers`` is the acceptance test the
    archive-recovery path uses. The map's descriptors carry its most
    recent appearance, so this recovers poses near the current keyframe;
    long-absence relocalization would need viewpoint-invariant
    descriptors (future work)."""
    from ..algorithms.fast import fast9

    intr = jnp.asarray(cfg.intrinsics, jnp.float32)
    pos, score, valid = fast9(frame, detect_th, k=cfg.tracker.detect_k,
                              blockwise=True,
                              block_size=cfg.tracker.keypoint_spacing)
    colp = jnp.where(state.n_keyframes > 0,
                     (state.n_keyframes - 1) % cfg.ring, 0)
    T_prior = state.kf_pose[colp]
    T, err, n = _map_vote_pnp(state.lm_X, state.lm_desc, state.lm_valid,
                              pos, valid, frame, cfg, T_prior, intr)
    return T, err, n


def keyframe_trajectory(state: SlamState) -> Tuple[jax.Array, jax.Array]:
    """(n, 4, 4) optimized keyframe poses + their frame ids (host use).

    ``n = min(n_keyframes, SlamConfig.history)``: the history buffer has
    static capacity, keyframes beyond it are not retained. A run that
    overflows gets a loud warning rather than a silently short (and
    misaligned) trajectory."""
    n_kf = int(state.n_keyframes)
    cap = state.hist_pose.shape[0]
    if n_kf > cap:
        import warnings
        warnings.warn(
            f"keyframe_trajectory: {n_kf} keyframes exceed the history "
            f"capacity {cap}; returning the first {cap} (raise "
            "SlamConfig.history to keep the full trajectory)",
            stacklevel=2)
    n = min(n_kf, cap)
    return state.hist_pose[:n], state.hist_frame[:n]


def ate_rmse(est: jax.Array, gt: jax.Array) -> jax.Array:
    """Absolute trajectory error (camera-centre RMSE, no alignment —
    the gauge is pinned by the bootstrap poses)."""
    c_est = jax.vmap(lambda T: -T[:3, :3].T @ T[:3, 3])(est)
    c_gt = jax.vmap(lambda T: -T[:3, :3].T @ T[:3, 3])(gt)
    return jnp.sqrt(jnp.mean(jnp.sum((c_est - c_gt) ** 2, axis=1)))
