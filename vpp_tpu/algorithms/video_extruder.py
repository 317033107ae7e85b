"""video_extruder — the flagship point tracker.

Capability parity with the reference pipeline
(/root/reference/vpp/algorithms/video_extruder/video_extruder.hpp:23-135):

per frame: (1) track all keypoints with semi-dense optical flow, move or
kill; (2) merge particles that converged to the same spacing-grid cell,
oldest wins; (3) kill points whose FAST score dropped below 3; (4) every
``detector_period`` frames, detect new FAST keypoints outside the occupancy
mask (blockwise, one per ``keypoint_spacing`` block) and spawn them;
(5) append positions to trajectories, trimmed to ``max_trajectory_length``.

TPU-native design: the context is an immutable pytree
(fixed-capacity keypoints + a (K, L, 2) trajectory ring + frame id); one
``video_extruder_update`` is a single jitted program, and a whole clip runs
under ``lax.scan``. Dynamic-size operations of the reference map to masks:
merge = scatter-max of ages over the spacing grid; occupancy mask = scatter
+ 3x3 dilation at grid resolution; spawn = compaction-free slot fill.
The reference's compact()+sync_attributes bookkeeping disappears entirely —
trajectories live in slot-parallel arrays that never need permuting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.image import Image2d, from_array
from ..core.keypoints import (Keypoints, keypoints_empty, kp_add,
                              kp_kill_where, kp_move_all)
from .fast import fast9, fast9_score
from .flow import semi_dense_optical_flow


@dataclasses.dataclass(frozen=True)
class VideoExtruderConfig:
    """Static knobs; names/defaults mirror video_extruder.hpp:35-41."""
    detector_th: int = 10
    keypoint_spacing: int = 10
    detector_period: int = 5
    max_trajectory_length: int = 15
    nscales: int = 3
    winsize: int = 9
    propagation: int = 2
    patchsize: int = 5
    capacity: int = 2048           # keypoint slot budget
    detect_k: int = 1024           # per-detection candidate budget


@struct.dataclass
class VideoExtruderState:
    keypoints: Keypoints
    traj: jax.Array       # (K, L, 2) float32, newest first
    traj_len: jax.Array   # (K,) int32
    frame_id: jax.Array   # () int32


def video_extruder_init(cfg: VideoExtruderConfig) -> VideoExtruderState:
    """video_extruder_init (video_extruder.hpp:15-20)."""
    k, length = cfg.capacity, cfg.max_trajectory_length + 1
    return VideoExtruderState(
        keypoints=keypoints_empty(k),
        traj=jnp.zeros((k, length, 2), jnp.float32),
        traj_len=jnp.zeros((k,), jnp.int32),
        frame_id=jnp.int32(-1))


def _merge_collided(kps: Keypoints, shape: Tuple[int, int],
                    spacing: int) -> Keypoints:
    """Oldest particle per spacing cell survives (hpp:60-84); equal-age
    collisions all survive, like the reference's tie case."""
    h, w = shape
    gh, gw = max(h // spacing, 1), max(w // spacing, 1)
    cell_r = jnp.clip((kps.position[:, 0] / spacing).astype(jnp.int32),
                      0, gh - 1)
    cell_c = jnp.clip((kps.position[:, 1] / spacing).astype(jnp.int32),
                      0, gw - 1)
    flat = cell_r * gw + cell_c
    age = jnp.where(kps.alive, kps.age, 0)
    cell_max = jnp.zeros((gh * gw,), jnp.int32).at[flat].max(age)
    lose = kps.alive & (age < cell_max[flat])
    return kp_kill_where(kps, lose)


def _occupancy_mask(kps: Keypoints, shape: Tuple[int, int],
                    spacing: int) -> jax.Array:
    """1 where detection is allowed: the reference blanks ±spacing around
    each live keypoint (hpp:96-109); at grid granularity that is a 3x3
    dilation of the occupied cells."""
    h, w = shape
    gh, gw = -(-h // spacing), -(-w // spacing)
    cell_r = jnp.clip((kps.position[:, 0] / spacing).astype(jnp.int32),
                      0, gh - 1)
    cell_c = jnp.clip((kps.position[:, 1] / spacing).astype(jnp.int32),
                      0, gw - 1)
    occ = jnp.zeros((gh, gw), bool).at[cell_r, cell_c].max(kps.alive)
    occ_p = jnp.pad(occ, 1)
    dil = jnp.zeros((gh, gw), bool)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            dil = dil | occ_p[dr:dr + gh, dc:dc + gw]
    mask = ~dil
    full = jnp.repeat(jnp.repeat(mask, spacing, axis=0), spacing, axis=1)
    return full[:h, :w].astype(jnp.uint8)


def video_extruder_update(state: VideoExtruderState, frame1: Image2d,
                          frame2: Image2d,
                          cfg: VideoExtruderConfig,
                          pyr1=None, pyr2=None) -> VideoExtruderState:
    """One tracker step (video_extruder.hpp:23-135). frame1/frame2 are
    grayscale images with border >= max(3, winsize). ``pyr1``/``pyr2`` may
    carry prebuilt pyramids (the scan driver reuses frame2's pyramid as the
    next step's frame1 pyramid, halving pyramid work)."""
    kps = state.keypoints
    frame_id = state.frame_id + 1
    h, w = frame2.shape

    # 1. Track (hpp:43-56).
    match_pos, dist, matched = semi_dense_optical_flow(
        kps.position, kps.alive, frame1, frame2,
        winsize=cfg.winsize, nscales=cfg.nscales,
        propagation=cfg.propagation, patchsize=cfg.patchsize,
        pyr1=pyr1, pyr2=pyr2)
    in_dom = ((match_pos[:, 0] >= 0) & (match_pos[:, 0] <= h - 1) &
              (match_pos[:, 1] >= 0) & (match_pos[:, 1] <= w - 1))
    kps = kp_move_all(kps, match_pos, matched & in_dom)

    # 2. Merge collided particles (hpp:60-84).
    kps = _merge_collided(kps, (h, w), cfg.keypoint_spacing)

    # 3. Cull low-score points (hpp:87-91). Full score map + one gather:
    # measured 0.20 ms at VGA vs 0.64 ms for per-keypoint circle
    # sampling (a 17-sample gather per slot is slower than scoring every
    # pixel on the VPU — lockstep beats pointer-chasing on TPU).
    score_img = fast9_score(frame2, cfg.detector_th)
    pos_i = jnp.clip(jnp.round(kps.position).astype(jnp.int32), 0,
                     jnp.array([h - 1, w - 1]))
    sc = score_img[pos_i[:, 0], pos_i[:, 1]]
    kps = kp_kill_where(kps, kps.alive & (sc < 3))

    # 4. Periodic detection of new keypoints (hpp:94-120).
    def detect(kps: Keypoints) -> Keypoints:
        mask = _occupancy_mask(kps, (h, w), cfg.keypoint_spacing)
        pos, score, valid = fast9(frame2, cfg.detector_th, k=cfg.detect_k,
                                  blockwise=True,
                                  block_size=cfg.keypoint_spacing,
                                  mask=mask)
        return kp_add(kps, pos.astype(jnp.float32), valid)

    kps = jax.lax.cond(frame_id % cfg.detector_period == 0,
                       detect, lambda s: s, kps)

    # 5. Trajectories (hpp:123-133): newest-first ring, slot-parallel.
    is_new = kps.age == 1
    alive = kps.alive
    shifted = jnp.concatenate([kps.position[:, None, :],
                               state.traj[:, :-1]], axis=1)
    traj = jnp.where(alive[:, None, None], shifted, state.traj)
    # a newly spawned keypoint starts a fresh trajectory
    traj_len = jnp.where(alive,
                         jnp.where(is_new, 1,
                                   jnp.minimum(state.traj_len + 1,
                                               cfg.max_trajectory_length)),
                         0)
    return VideoExtruderState(keypoints=kps, traj=traj, traj_len=traj_len,
                              frame_id=frame_id)


def video_extruder_run(frames: jax.Array, cfg: VideoExtruderConfig,
                       border: Optional[int] = None):
    """Track a whole (T, H, W) grayscale clip under one ``lax.scan``.

    Returns (final_state, per-frame (positions, alive) history). This is the
    reference's foreach_videoframe demo loop (examples/video_extruder.cc:44-73)
    as a single compiled program.
    """
    b = border if border is not None else max(3, cfg.winsize)
    state = video_extruder_init(cfg)

    from .pyramid import pyramid as build_pyramid

    def pad(fr):
        return from_array(fr, border=b, border_mode="mirror")

    def step(carry, fr2):
        state, fr1_data, pyr1 = carry
        f1 = Image2d(data=fr1_data, border=b)
        f2 = pad(fr2)
        # frame2's pyramid becomes next step's frame1 pyramid: each frame's
        # pyramid is built exactly once per clip
        pyr2 = build_pyramid(f2, cfg.nscales, border=b)
        new_state = video_extruder_update(state, f1, f2, cfg,
                                          pyr1=pyr1, pyr2=pyr2)
        out = (new_state.keypoints.position, new_state.keypoints.alive)
        return (new_state, f2.data, pyr2), out

    f0 = pad(frames[0])
    pyr0 = build_pyramid(f0, cfg.nscales, border=b)
    (final_state, _, _), hist = jax.lax.scan(step, (state, f0.data, pyr0),
                                             frames)
    return final_state, hist
