"""Drawing primitives — functional rasterisation onto image arrays.

Capability parity with the reference's draw layer
(/root/reference/vpp/draw/draw.hh, square.hh, draw_trajectories.hh,
rgb_colors.hh):

* ``plot_color`` — alpha-blended pixel plot (draw.hh:34-52);
* ``draw_line`` — the Bresenham ``line2d`` (draw.hh:62-126);
* ``draw_square`` — filled/outlined square (square.hh:17-40);
* ``draw_trajectories`` — per-keypoint polyline rendering with
  age-decaying alpha (draw_trajectories.hh:11-40).

TPU-native design: rasterisation is a *scatter*: each primitive produces a
fixed-capacity set of (row, col, color, alpha) samples; one
``.at[idx].set/add`` applies them all. Bresenham's data-dependent loop
becomes uniform parametric sampling at >= max(|dr|, |dc|)+1 points — the
same pixel set, branchless. Out-of-image samples are dropped with
scatter ``mode='drop'``. These are visualisation utilities; they favour
clarity over speed but still jit and batch (vmap over trajectories).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.image import Image2d

# rgb_colors.hh palette
RGB_COLORS = {
    "red": (255, 0, 0), "green": (0, 255, 0), "blue": (0, 0, 255),
    "white": (255, 255, 255), "black": (0, 0, 0), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255),
    "orange": (255, 165, 0), "teal": (0, 128, 128),
}


def _as_data(img):
    if isinstance(img, Image2d):
        return img.data, img.border
    return jnp.asarray(img), 0


def _wrap(img, data):
    if isinstance(img, Image2d):
        return Image2d(data=data, border=img.border)
    return data


def plot_color(img, points: jax.Array, color,
               alpha: Optional[jax.Array] = None,
               valid: Optional[jax.Array] = None):
    """Alpha-blend ``color`` at integer (row, col) ``points``
    (draw.hh:34-52). ``alpha`` in [0,1] per point (default 1 = opaque)."""
    data, b = _as_data(img)
    h, w = data.shape[:2]
    pts = jnp.asarray(points, jnp.int32) + b
    color = jnp.asarray(color, data.dtype)
    n = pts.shape[0]
    a = jnp.ones((n,), jnp.float32) if alpha is None else \
        jnp.asarray(alpha, jnp.float32)
    ok = (pts[:, 0] >= 0) & (pts[:, 0] < h) & \
         (pts[:, 1] >= 0) & (pts[:, 1] < w)
    if valid is not None:
        ok = ok & valid
    r = jnp.where(ok, pts[:, 0], h)          # h -> dropped by mode='drop'
    c = jnp.where(ok, pts[:, 1], 0)
    old = data[jnp.clip(r, 0, h - 1), c]
    blended = (old.astype(jnp.float32) * (1 - a[..., None] if old.ndim > 1
                                          else 1 - a)
               + color.astype(jnp.float32) * (a[..., None] if old.ndim > 1
                                              else a)).astype(data.dtype)
    out = data.at[r, c].set(blended, mode="drop")
    return _wrap(img, out)


def line_points(p1, p2, n: int) -> Tuple[jax.Array, jax.Array]:
    """n uniformly-spaced integer samples from p1 to p2 — the branchless
    form of Bresenham (draw.hh:62-126): with n >= max(|dr|,|dc|)+1 the
    sample set equals the Bresenham pixel set."""
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    t = jnp.linspace(0.0, 1.0, n)[:, None]
    pts = jnp.round(p1[None] * (1 - t) + p2[None] * t).astype(jnp.int32)
    return pts, jnp.ones((n,), bool)


def draw_line(img, p1, p2, color, n: Optional[int] = None):
    """Rasterise the segment p1-p2 (draw.hh ``line2d``). ``n`` caps the
    sample count (static shape); defaults to the image diagonal bound."""
    data, _ = _as_data(img)
    h, w = data.shape[:2]
    if n is None:
        n = h + w
    pts, ok = line_points(p1, p2, n)
    return plot_color(img, pts, color, valid=ok)


def draw_square(img, center, half: int, color, fill: bool = True):
    """Filled (or outlined) axis-aligned square of half-width ``half``
    around ``center`` (square.hh:17-40)."""
    side = 2 * half + 1
    o = jnp.arange(-half, half + 1, dtype=jnp.int32)
    rr = o[:, None] + jnp.zeros((1, side), jnp.int32)
    cc = o[None, :] + jnp.zeros((side, 1), jnp.int32)
    if not fill:
        edge = ((jnp.abs(rr) == half) | (jnp.abs(cc) == half))
    else:
        edge = jnp.ones_like(rr, bool)
    ctr = jnp.asarray(center, jnp.int32)
    pts = jnp.stack([rr + ctr[0], cc + ctr[1]], axis=-1).reshape(-1, 2)
    return plot_color(img, pts, color, valid=edge.reshape(-1))


def _age_color(age: jax.Array) -> jax.Array:
    """Direction-of-age HSV-ish ramp, vectorised (draw_trajectories.hh
    colors by track direction; we ramp green->red with age)."""
    t = jnp.clip(age.astype(jnp.float32) / 15.0, 0.0, 1.0)
    return jnp.stack([255 * t, 255 * (1 - t), jnp.zeros_like(t)], axis=-1)


def draw_trajectories(img, traj: jax.Array, traj_len: jax.Array,
                      alive: jax.Array, samples_per_seg: int = 8):
    """Render keypoint trajectory polylines with age-decaying alpha
    (draw_trajectories.hh:11-40). ``traj`` is the tracker's (K, L, 2)
    newest-first ring; segment i connects traj[:, i] to traj[:, i+1]."""
    data, b = _as_data(img)
    h, w = data.shape[:2]
    k, length = traj.shape[:2]
    color = _age_color(traj_len)

    t = jnp.linspace(0.0, 1.0, samples_per_seg)
    # (K, L-1, S, 2) parametric samples of every segment of every track
    p1 = traj[:, :-1, None, :]
    p2 = traj[:, 1:, None, :]
    pts = jnp.round(p1 * (1 - t[None, None, :, None]) +
                    p2 * t[None, None, :, None]).astype(jnp.int32)
    seg_idx = jnp.arange(length - 1)
    seg_ok = (seg_idx[None, :] < (traj_len[:, None] - 1)) & alive[:, None]
    alpha = (1.0 - seg_idx / max(length - 1, 1))[None, :] * \
        seg_ok.astype(jnp.float32)                       # fade with age
    pts_f = pts.reshape(-1, 2) + b
    ok = jnp.repeat(seg_ok[:, :, None], samples_per_seg,
                    axis=2).reshape(-1)
    a = jnp.repeat(alpha[:, :, None], samples_per_seg, axis=2).reshape(-1)
    col = jnp.repeat(color[:, None, None, :], (length - 1),
                     axis=1)
    col = jnp.repeat(col, samples_per_seg, axis=2).reshape(-1, 3)

    inb = (pts_f[:, 0] >= 0) & (pts_f[:, 0] < h) & \
          (pts_f[:, 1] >= 0) & (pts_f[:, 1] < w) & ok
    r = jnp.where(inb, pts_f[:, 0], h)
    c = jnp.where(inb, pts_f[:, 1], 0)
    old = data[jnp.clip(r, 0, h - 1), c].astype(jnp.float32)
    if old.ndim == 1:                      # grayscale target: use red chan
        blended = old * (1 - a) + col[:, 0] * a
    else:
        blended = old * (1 - a[:, None]) + col * a[:, None]
    out = data.at[r, c].set(blended.astype(data.dtype), mode="drop")
    return _wrap(img, out)
