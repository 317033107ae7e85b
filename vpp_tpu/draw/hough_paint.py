"""Image-space rendering of Hough line tracks — the hough_extruder paint
subtree.

Capability parity with the reference's visualisation cluster:

* ``paint_hough_video`` (paint.hh:18-80): a persistent RGBA paint buffer
  whose alpha decays 0.97x per frame; each live track paints its current
  image-space segment with a direction-coded HSV colour and a
  speed-scaled alpha — the "light trail" video effect.
* ``draw_line_tracks`` (draw_trajectories_hough.hh:99-145,
  draw_trajectories_hough_V1): render every live track's current (θ, ρ)
  line as a segment in a per-track stable colour, alpha-faded by
  staleness (frames without update), plus a c9-style marker at the
  line's centre point.
* ``track_support_points`` (track.hh:14-110 per-line point lists /
  gradient images): recover, for each track, the edge pixels whose
  gradient votes land within the track's (θ, ρ) exclusion window — the
  reference stores these lists incrementally during voting; here they
  are reconstructed in one vectorised pass (a fixed-capacity top-k by
  gradient magnitude per track, TPU-shaped).

TPU-native: everything is batched over the track slots and rendered with
masked scatter plots (draw/draw.py); no per-track Python loops at trace
time beyond the static slot capacity.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..algorithms.hough import line_endpoints, sobel_gradients
from ..core.image import Image2d
from ..ops.color import hsv_to_rgb


def _pixel_votes(img: Image2d, t_theta: int, rho_bins: int,
                 grad_threshold: float):
    """Per-pixel (θ_bin, ρ_bin, |grad|, is_edge) — the accumulator's vote
    discretisation (algorithms/hough.py:hough_accumulator) without the
    scatter."""
    h, w = img.shape
    gy, gx = sobel_gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    edge = mag > grad_threshold
    theta = jnp.arctan2(gy, gx)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    rho = cc * jnp.cos(theta) + rr * jnp.sin(theta)
    diag = math.sqrt(h * h + w * w)
    rho_n = (rho + diag) * (rho_bins - 1) / (2 * diag)
    th_n = theta * (t_theta - 1) / jnp.pi
    return th_n, rho_n, mag, edge


def track_support_points(img: Image2d, theta_idx: jax.Array,
                         rho_idx: jax.Array, valid: jax.Array, *,
                         k: int = 64, t_theta: int = 255,
                         rho_bins: int | None = None,
                         grad_threshold: float = 40.0,
                         radius_theta: float = 5.0,
                         radius_rho: float = 10.0
                         ) -> Tuple[jax.Array, jax.Array]:
    """Per-track image point lists: the ``k`` strongest edge pixels whose
    gradient vote falls within (±radius_theta, ±radius_rho) accumulator
    bins of each track's (θ_idx, ρ_idx).

    Returns (points (C, k, 2) int32 row/col, ok (C, k) bool). θ distance
    is non-circular (tracks hugging the θ = 0/π seam list only the
    near-side support; the reference's per-track lists share this
    window-based behaviour)."""
    h, w = img.shape
    if rho_bins is None:
        rho_bins = int(math.ceil(math.sqrt(h * h + w * w)))
    th_n, rho_n, mag, edge = _pixel_votes(img, t_theta, rho_bins,
                                          grad_threshold)
    thf = th_n.reshape(-1)
    rhf = rho_n.reshape(-1)
    score = jnp.where(edge, mag, 0.0).reshape(-1)

    def per_track(ti, ri, v):
        m = (v & (jnp.abs(thf - ti) <= radius_theta)
             & (jnp.abs(rhf - ri) <= radius_rho))
        s = jnp.where(m, score, 0.0)
        top, idx = jax.lax.top_k(s, k)
        ok = top > 0
        pts = jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.int32)
        return pts, ok

    return jax.vmap(per_track)(theta_idx.astype(jnp.float32),
                               rho_idx.astype(jnp.float32), valid)


def _track_lines(state, acc_shape: Tuple[int, int],
                 img_shape: Tuple[int, int]):
    """(θ radians, ρ pixels) of each track slot (accumulator units →
    image units, algorithms/hough.py:accumulator_to_lines)."""
    t_theta, rho_bins = acc_shape
    h, w = img_shape
    diag = math.sqrt(h * h + w * w)
    theta = state.theta * jnp.pi / (t_theta - 1)
    rho = state.rho * 2 * diag / (rho_bins - 1) - diag
    return theta, rho


def paint_hough_video(paint: jax.Array, state, acc_shape: Tuple[int, int],
                      *, decay: float = 0.97, n_samples: int = 128,
                      speed_scale: float = 10.0) -> jax.Array:
    """One frame of the trail-paint effect (paint.hh:18-80).

    ``paint``: (H, W, 4) float32 RGBA buffer (alpha in [0, 255]); returns
    the updated buffer. Every frame the whole buffer's alpha decays by
    ``decay``; each live track then paints ``n_samples`` points along its
    current image-space segment in an HSV colour coded by its (θ, ρ)
    trajectory direction, alpha scaled by min(1, speed / speed_scale) —
    fast-moving lines leave bright trails, parked lines fade out."""
    h, w = paint.shape[:2]
    paint = paint.at[..., 3].multiply(decay)

    theta, rho = _track_lines(state, acc_shape, (h, w))
    p1, p2 = line_endpoints(theta, rho, (h, w))          # (C, 2) each

    # direction + speed in trajectory (θ, ρ) space, over up to 10 steps
    c = state.traj.shape[0]
    steps = jnp.minimum(jnp.maximum(state.traj_n - 1, 0), 10)
    older = state.traj[jnp.arange(c), jnp.clip(steps, 0,
                                               state.traj.shape[1] - 1)]
    delta = state.traj[:, 0] - older                     # (C, 2)
    speed = jnp.linalg.norm(delta, axis=-1)
    hue = (jnp.arctan2(delta[..., 0], delta[..., 1]) + jnp.pi) * (180.0
                                                                  / jnp.pi)
    color = hsv_to_rgb(hue, 1.0, 1.0).astype(jnp.float32)  # (C, 3)
    alpha = jnp.minimum(1.0, speed / speed_scale)
    live = (state.age > 0) & (state.traj_n >= 2)

    # sample points along each segment, plot with per-point alpha blend
    t = jnp.linspace(0.0, 1.0, n_samples)[None, :, None]
    pts = jnp.round(p1[:, None] * (1 - t) + p2[:, None] * t
                    ).astype(jnp.int32)                  # (C, S, 2)
    ok = (live[:, None] & (pts[..., 0] >= 0) & (pts[..., 0] < h)
          & (pts[..., 1] >= 0) & (pts[..., 1] < w))
    r = jnp.where(ok, pts[..., 0], h).reshape(-1)
    cc = jnp.where(ok, pts[..., 1], 0).reshape(-1)
    col = jnp.broadcast_to(color[:, None], pts.shape[:2] + (3,)
                           ).reshape(-1, 3)
    a = jnp.broadcast_to(alpha[:, None], pts.shape[:2]).reshape(-1)
    rgb = paint[..., :3].at[r, cc].set(col, mode="drop")
    av = paint[..., 3].at[r, cc].max(255.0 * a, mode="drop")
    return jnp.concatenate([rgb, av[..., None]], axis=-1)


_PALETTE_HUES = jnp.arange(32, dtype=jnp.float32) * 137.5 % 360.0


def draw_line_tracks(img: jax.Array, state, acc_shape: Tuple[int, int],
                     *, n_samples: int = 256, max_fwu: int = 5
                     ) -> jax.Array:
    """Render live tracks onto an (H, W, 3) uint8 frame
    (draw_trajectories_hough_V1 capability): each track's current line
    in its stable slot colour (golden-angle hue palette), alpha-faded by
    frames-without-update, plus a 3x3 marker at the segment centre."""
    h, w = img.shape[:2]
    c = state.age.shape[0]
    theta, rho = _track_lines(state, acc_shape, (h, w))
    p1, p2 = line_endpoints(theta, rho, (h, w))
    hues = _PALETTE_HUES[jnp.arange(c) % 32]
    color = hsv_to_rgb(hues, 1.0, 1.0).astype(jnp.float32)
    fade = jnp.clip(1.0 - state.fwu.astype(jnp.float32) / (max_fwu + 1),
                    0.2, 1.0)
    live = state.age > 0

    t = jnp.linspace(0.0, 1.0, n_samples)[None, :, None]
    pts = jnp.round(p1[:, None] * (1 - t) + p2[:, None] * t
                    ).astype(jnp.int32)
    ok = (live[:, None] & (pts[..., 0] >= 0) & (pts[..., 0] < h)
          & (pts[..., 1] >= 0) & (pts[..., 1] < w))
    r = jnp.where(ok, pts[..., 0], h).reshape(-1)
    cc = jnp.where(ok, pts[..., 1], 0).reshape(-1)
    a = jnp.broadcast_to(fade[:, None], pts.shape[:2]).reshape(-1)
    col = jnp.broadcast_to(color[:, None], pts.shape[:2] + (3,)
                           ).reshape(-1, 3)
    base = img.astype(jnp.float32)
    old = base[jnp.clip(r, 0, h - 1), jnp.clip(cc, 0, w - 1)]
    blend = old * (1 - a[:, None]) + col * a[:, None]
    out = base.at[r, cc].set(blend, mode="drop")

    # marker: 3x3 block at the segment centre (draw::c9)
    centre = jnp.round((p1 + p2) / 2).astype(jnp.int32)  # (C, 2)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2),
                                  indexing="ij"), axis=-1).reshape(-1, 2)
    mpts = centre[:, None] + offs[None]                  # (C, 9, 2)
    mok = (live[:, None] & (mpts[..., 0] >= 0) & (mpts[..., 0] < h)
           & (mpts[..., 1] >= 0) & (mpts[..., 1] < w))
    mr = jnp.where(mok, mpts[..., 0], h).reshape(-1)
    mc = jnp.where(mok, mpts[..., 1], 0).reshape(-1)
    mcol = jnp.broadcast_to(color[:, None], (c, 9, 3)).reshape(-1, 3)
    out = out.at[mr, mc].set(mcol, mode="drop")
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
