"""Temporal tracking of Hough-space line peaks (the hough_extruder).

Capability parity with
/root/reference/vpp/algorithms/hough_extruder/feature_matching_hough.hh/.hpp
and track.hh/.hpp:

* per frame: run the dense Hough transform, take the ``m_first`` peaks
  with (ρ, θ) exclusion radii (feature_matching_hough.hpp:64-90);
* data association tracks ↔ peaks by Hough-space distance
  (compute_distance_hough_space, .hpp:755-765) combined with an
  appearance term — correlation of accumulator neighbourhoods
  (.hpp:818-974, Pearson variant);
* matched tracks update (ρ, θ) + appearance; unmatched tracks survive up
  to ``max_frames_without_update`` frames (track.hh:47-48), optionally
  coasting on a UKF prediction (the With_Kalman_Filter mode);
* unmatched peaks give birth to new tracks; a Hough-space trajectory ring
  is kept per track (the reference's draw_trajectories_hough feed).

TPU-native design: tracks live in a fixed-capacity masked slot array (a
pytree), peaks in a fixed-size list; association is a small dense cost
matrix + ``m`` greedy argmin iterations under ``fori_loop`` — all static
shapes, one jitted program per frame; the UKF bank advances via ``vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..core.image import Image2d
from .hough import HoughLines, hough_accumulator, hough_peaks
from .ukf import UKFState, ukf_init, ukf_predict, ukf_update, \
    rho_theta_measurement

_INF = np.float32(1e30)


@dataclasses.dataclass(frozen=True)
class HoughTrackerConfig:
    """Static knobs; names follow line_tracker_4_sfm/symbols.hh."""
    t_theta: int = 255
    m_first_lines: int = 8
    rayon_exclusion_theta: int = 5
    rayon_exclusion_rho: int = 10
    acc_threshold: float = 30.0
    grad_threshold: float = 40.0
    max_dist_rho: float = 20.0          # gating radii for association
    max_dist_theta: float = 8.0
    appearance_radius: int = 4          # accumulator patch half-width
    appearance_weight: float = 0.5
    max_frames_without_update: int = 5  # _nombre_max_frame_without_update
    capacity: int = 32                  # track slot budget
    traj_len: int = 15
    with_kalman_filter: bool = False


@struct.dataclass
class HoughTrackerState:
    rho: jax.Array        # (C,) float32 accumulator-col units
    theta: jax.Array      # (C,) float32 accumulator-row units
    votes: jax.Array      # (C,)
    age: jax.Array        # (C,) int32; 0 = dead
    fwu: jax.Array        # (C,) frames without update
    appearance: jax.Array  # (C, P, P) accumulator patches
    traj: jax.Array       # (C, L, 2) (theta, rho) ring, newest first
    traj_n: jax.Array     # (C,) int32
    ukf_x: jax.Array      # (C, 5)
    ukf_P: jax.Array      # (C, 5, 5)
    frame_id: jax.Array   # ()


def hough_tracker_init(cfg: HoughTrackerConfig) -> HoughTrackerState:
    c = cfg.capacity
    p = 2 * cfg.appearance_radius + 1
    return HoughTrackerState(
        rho=jnp.zeros((c,), jnp.float32),
        theta=jnp.zeros((c,), jnp.float32),
        votes=jnp.zeros((c,), jnp.float32),
        age=jnp.zeros((c,), jnp.int32),
        fwu=jnp.zeros((c,), jnp.int32),
        appearance=jnp.zeros((c, p, p), jnp.float32),
        traj=jnp.zeros((c, cfg.traj_len, 2), jnp.float32),
        traj_n=jnp.zeros((c,), jnp.int32),
        ukf_x=jnp.zeros((c, 5), jnp.float32),
        ukf_P=jnp.tile(jnp.eye(5, dtype=jnp.float32)[None], (c, 1, 1)),
        frame_id=jnp.int32(-1))


def _acc_patches(acc: jax.Array, theta_idx: jax.Array, rho_idx: jax.Array,
                 radius: int) -> jax.Array:
    """(N, P, P) accumulator neighbourhoods (appearance model,
    feature_matching_hough.hpp:818-974). θ axis wraps, ρ clamps."""
    t_theta, rho_bins = acc.shape
    o = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    tt = (theta_idx[:, None, None] + o[None, :, None]) % t_theta
    rr = jnp.clip(rho_idx[:, None, None] + o[None, None, :], 0,
                  rho_bins - 1)
    return acc[tt, rr]


def _pearson(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pearson correlation of flattened patch pairs (batched)."""
    af = a.reshape(a.shape[0], -1)
    bf = b.reshape(b.shape[0], -1)
    am = af - af.mean(axis=1, keepdims=True)
    bm = bf - bf.mean(axis=1, keepdims=True)
    num = jnp.sum(am * bm, axis=1)
    den = jnp.sqrt(jnp.sum(am * am, axis=1) * jnp.sum(bm * bm, axis=1))
    return num / jnp.maximum(den, 1e-9)


def hough_tracker_update(st: HoughTrackerState, frame: Image2d,
                         cfg: HoughTrackerConfig
                         ) -> Tuple[HoughTrackerState, HoughLines]:
    """One tracker step (feature_matching_hough_update_* capability)."""
    c = cfg.capacity
    m = cfg.m_first_lines
    t_theta = cfg.t_theta

    acc = hough_accumulator(frame, t_theta=t_theta,
                            grad_threshold=cfg.grad_threshold)
    peaks = hough_peaks(acc, m,
                        exclusion_theta=cfg.rayon_exclusion_theta,
                        exclusion_rho=cfg.rayon_exclusion_rho,
                        acc_threshold=cfg.acc_threshold)
    peak_app = _acc_patches(acc, peaks.theta_idx, peaks.rho_idx,
                            cfg.appearance_radius)

    alive = st.age > 0
    # -- association cost: Hough-space distance + appearance ---------------
    dth = jnp.abs(st.theta[:, None] - peaks.theta_idx[None].astype(
        jnp.float32))
    dth = jnp.minimum(dth, t_theta - dth)             # circular θ
    drh = jnp.abs(st.rho[:, None] - peaks.rho_idx[None].astype(jnp.float32))
    gate = (dth <= cfg.max_dist_theta) & (drh <= cfg.max_dist_rho)
    space = dth / cfg.max_dist_theta + drh / cfg.max_dist_rho
    # appearance: 1 - pearson(track patch, peak patch), pairwise
    ta = st.appearance.reshape(c, -1)
    pa = peak_app.reshape(m, -1)
    tam = ta - ta.mean(axis=1, keepdims=True)
    pam = pa - pa.mean(axis=1, keepdims=True)
    num = tam @ pam.T
    den = jnp.sqrt(jnp.sum(tam * tam, axis=1)[:, None] *
                   jnp.sum(pam * pam, axis=1)[None, :])
    corr = num / jnp.maximum(den, 1e-9)
    cost = space + cfg.appearance_weight * (1.0 - corr)
    cost = jnp.where(gate & alive[:, None] & peaks.valid[None, :],
                     cost, _INF)

    # -- greedy one-to-one assignment (m iterations) -----------------------
    def assign_body(_, carry):
        cst, track_of_peak = carry
        flat = jnp.argmin(cst)
        ti, pi = flat // m, flat % m
        ok = cst[ti, pi] < _INF
        track_of_peak = jnp.where(
            ok, track_of_peak.at[pi].set(ti.astype(jnp.int32)),
            track_of_peak)
        cst = jnp.where(ok, cst.at[ti, :].set(_INF).at[:, pi].set(_INF),
                        cst)
        return cst, track_of_peak

    _, track_of_peak = jax.lax.fori_loop(
        0, m, assign_body, (cost, jnp.full((m,), -1, jnp.int32)))

    # per-track view: which peak (or -1)
    peak_of_track = jnp.full((c,), -1, jnp.int32)
    safe_t = jnp.where(track_of_peak >= 0, track_of_peak, c)
    peak_of_track = jnp.zeros((c,), jnp.int32).at[safe_t].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop") \
        + jnp.full((c,), 0)
    has_match = jnp.zeros((c,), bool).at[safe_t].set(
        jnp.ones((m,), bool), mode="drop")
    pk = jnp.where(has_match, peak_of_track, 0)

    new_rho_det = peaks.rho_idx[pk].astype(jnp.float32)
    new_th_det = peaks.theta_idx[pk].astype(jnp.float32)

    # -- UKF bank: predict all, update matched (hh:54-71) ------------------
    if cfg.with_kalman_filter:
        def step_one(x, P, z, matched):
            s0 = UKFState(x=x, P=P)
            s1, sp = ukf_predict(s0, 1.0)
            Rm = jnp.diag(jnp.array([9.0, 2.0], jnp.float32))
            s2 = ukf_update(s1, sp, z, rho_theta_measurement, Rm)
            xo = jnp.where(matched, s2.x, s1.x)
            Po = jnp.where(matched, s2.P, s1.P)
            return xo, Po

        z = jnp.stack([new_rho_det, new_th_det], axis=-1)
        ukf_x, ukf_P = jax.vmap(step_one)(st.ukf_x, st.ukf_P, z, has_match)
        coast_rho = ukf_x[:, 0]
        coast_th = ukf_x[:, 1]
    else:
        ukf_x, ukf_P = st.ukf_x, st.ukf_P
        coast_rho, coast_th = st.rho, st.theta

    matched = alive & has_match
    coasting = alive & ~has_match & \
        (st.fwu < cfg.max_frames_without_update)
    survive = matched | coasting

    rho = jnp.where(matched, new_rho_det,
                    jnp.where(coasting, coast_rho, st.rho))
    theta = jnp.where(matched, new_th_det,
                      jnp.where(coasting, coast_th, st.theta))
    votes = jnp.where(matched, peaks.votes[pk], st.votes)
    age = jnp.where(survive, st.age + 1, 0)
    fwu = jnp.where(matched, 0, jnp.where(coasting, st.fwu + 1, st.fwu))
    appearance = jnp.where(matched[:, None, None], peak_app[pk],
                           st.appearance)
    if cfg.with_kalman_filter:
        # seed filter state on fresh matches
        ukf_x = ukf_x.at[:, 0].set(jnp.where(matched, rho, ukf_x[:, 0]))
        ukf_x = ukf_x.at[:, 1].set(jnp.where(matched, theta, ukf_x[:, 1]))

    # -- births: unmatched valid peaks into dead slots ---------------------
    unmatched_peak = peaks.valid & (track_of_peak < 0)
    dead = ~survive
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    cand_rank = jnp.cumsum(unmatched_peak.astype(jnp.int32)) - 1
    n_cand = jnp.sum(unmatched_peak.astype(jnp.int32))
    cand_by_rank = jnp.zeros((m,), jnp.int32).at[
        jnp.where(unmatched_peak, cand_rank, m)].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    take = dead & (dead_rank < n_cand)
    src = cand_by_rank[jnp.clip(dead_rank, 0, m - 1)]
    rho = jnp.where(take, peaks.rho_idx[src].astype(jnp.float32), rho)
    theta = jnp.where(take, peaks.theta_idx[src].astype(jnp.float32), theta)
    votes = jnp.where(take, peaks.votes[src], votes)
    age = jnp.where(take, 1, age)
    fwu = jnp.where(take, 0, fwu)
    appearance = jnp.where(take[:, None, None], peak_app[src], appearance)
    ukf_x = ukf_x.at[:, 0].set(jnp.where(take, rho, ukf_x[:, 0]))
    ukf_x = ukf_x.at[:, 1].set(jnp.where(take, theta, ukf_x[:, 1]))

    # -- Hough-space trajectory ring ---------------------------------------
    live = age > 0
    head = jnp.stack([theta, rho], axis=-1)[:, None, :]
    shifted = jnp.concatenate([head, st.traj[:, :-1]], axis=1)
    traj = jnp.where(live[:, None, None], shifted, st.traj)
    traj_n = jnp.where(live,
                       jnp.where(take | (age == 1), 1,
                                 jnp.minimum(st.traj_n + 1, cfg.traj_len)),
                       0)

    out = HoughTrackerState(rho=rho, theta=theta, votes=votes, age=age,
                            fwu=fwu, appearance=appearance, traj=traj,
                            traj_n=traj_n, ukf_x=ukf_x, ukf_P=ukf_P,
                            frame_id=st.frame_id + 1)
    return out, peaks
