"""Dense one-to-one Hough line detection (the reference's fast_dht).

Capability parity with
/root/reference/vpp/algorithms/fast_dht/dense_one_to_one_hough.hh/.hpp and
fast_hough.hh/.hpp:

* one pass over the image computes the Sobel gradient and lets **each edge
  pixel cast exactly one vote** at the (ρ, θ) implied by its gradient
  direction, bilinearly spread over the 4 neighbouring accumulator cells
  (dense_one_to_one_hough.hpp:32-108);
* θ is discretised to ``t_theta`` bins over [0, π) and ρ to the image
  diagonal (define.hh ``Theta_max`` / ``Sclare_rho``);
* peak extraction variants: global max, m-first peaks with (ρ, θ)
  exclusion radii (feature_matching_hough.hpp peak loop), and top-k
  (priority-queue variant of dense_one_to_one_hough.hh:24-87);
* accumulator-space → image-space line endpoints
  (miscellanous/operations.hh:79-260 ``getLineFromPoint``).

TPU-native design: the racy ``+=`` votes under OpenMP
(dense_one_to_one_hough.hpp:77-101, the commented-out ``omp critical``)
become one deterministic ``.at[].add()`` scatter-add of all pixels at
once; gradients are shifted-slice stencils (no loops); peak extraction
with exclusion is a fixed-iteration argmax + mask-suppress loop under
``lax.fori_loop`` — branchless and jittable.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.image import Image2d

_NEG = np.float32(-1e30)


def sobel_gradients(img: Image2d) -> Tuple[jax.Array, jax.Array]:
    """(gy, gx) 3x3 Sobel over the interior (the DHT's first step,
    dense_one_to_one_hough.hpp:32-56). Requires border >= 1."""
    assert img.border >= 1, "sobel needs border >= 1"
    d = img.data.astype(jnp.float32)
    h, w = img.shape
    b = img.border

    def sl(dr, dc):
        return jax.lax.slice(d, (b + dr, b + dc), (b + dr + h, b + dc + w))

    gx = (sl(-1, 1) + 2 * sl(0, 1) + sl(1, 1)
          - sl(-1, -1) - 2 * sl(0, -1) - sl(1, -1))
    gy = (sl(1, -1) + 2 * sl(1, 0) + sl(1, 1)
          - sl(-1, -1) - 2 * sl(-1, 0) - sl(-1, 1))
    return gy, gx


def hough_accumulator(img: Image2d, *, t_theta: int = 255,
                      rho_bins: int | None = None,
                      grad_threshold: float = 40.0) -> jax.Array:
    """(t_theta, rho_bins) vote accumulator: one bilinear vote per edge
    pixel at its gradient-normal direction (hpp:57-108).

    Vote weight = 1 for pixels with gradient magnitude above
    ``grad_threshold`` (the reference thresholds then votes with bilinear
    fractional weights across the 4 neighbouring (θ, ρ) cells).
    """
    h, w = img.shape
    if rho_bins is None:
        rho_bins = int(math.ceil(math.sqrt(h * h + w * w)))
    gy, gx = sobel_gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    edge = mag > grad_threshold

    # gradient direction = line normal; θ in [0, π)
    theta = jnp.arctan2(gy, gx)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    # ρ = x cosθ + y sinθ, shifted by diagonal/2 so it is non-negative
    rho = cc * jnp.cos(theta) + rr * jnp.sin(theta)
    diag = math.sqrt(h * h + w * w)
    rho_n = (rho + diag) * (rho_bins - 1) / (2 * diag)
    th_n = theta * (t_theta - 1) / jnp.pi

    t0 = jnp.floor(th_n)
    r0 = jnp.floor(rho_n)
    ft = th_n - t0
    fr = rho_n - r0
    t0i = jnp.clip(t0.astype(jnp.int32), 0, t_theta - 1)
    r0i = jnp.clip(r0.astype(jnp.int32), 0, rho_bins - 1)
    t1i = jnp.minimum(t0i + 1, t_theta - 1)
    r1i = jnp.minimum(r0i + 1, rho_bins - 1)

    wgt = edge.astype(jnp.float32)
    acc = jnp.zeros((t_theta, rho_bins), jnp.float32)
    acc = acc.at[t0i, r0i].add(wgt * (1 - ft) * (1 - fr))
    acc = acc.at[t0i, r1i].add(wgt * (1 - ft) * fr)
    acc = acc.at[t1i, r0i].add(wgt * ft * (1 - fr))
    acc = acc.at[t1i, r1i].add(wgt * ft * fr)
    return acc


class HoughLines(NamedTuple):
    theta_idx: jax.Array   # (m,) int32 accumulator row
    rho_idx: jax.Array     # (m,) int32 accumulator col
    votes: jax.Array       # (m,) float32
    valid: jax.Array       # (m,) bool — vote above threshold


def hough_peaks(acc: jax.Array, m: int, *,
                exclusion_theta: int = 5, exclusion_rho: int = 10,
                acc_threshold: float = 0.0) -> HoughLines:
    """m-first peaks with (θ, ρ) exclusion radii — the
    ``_m_first_lines`` / ``_rayon_exclusion_*`` peak loop of the hough
    tracker (feature_matching_hough.hpp). θ exclusion wraps (θ and π-θ
    + mirrored ρ describe nearby lines; we wrap the θ axis like the
    reference's circular handling)."""
    t_theta, rho_bins = acc.shape
    tt = jnp.arange(t_theta)[:, None]
    rr = jnp.arange(rho_bins)[None, :]

    def body(_, carry):
        a, ti, ri, v, k = carry
        flat = jnp.argmax(a)
        pt, pr = flat // rho_bins, flat % rho_bins
        val = a[pt, pr]
        dt = jnp.abs(tt - pt)
        dt = jnp.minimum(dt, t_theta - dt)            # circular θ
        suppress = (dt <= exclusion_theta) & \
            (jnp.abs(rr - pr) <= exclusion_rho)
        a = jnp.where(suppress, _NEG, a)
        ti = ti.at[k].set(pt.astype(jnp.int32))
        ri = ri.at[k].set(pr.astype(jnp.int32))
        v = v.at[k].set(val)
        return a, ti, ri, v, k + 1

    init = (acc.astype(jnp.float32),
            jnp.zeros((m,), jnp.int32), jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.float32), 0)
    _, ti, ri, v, _ = jax.lax.fori_loop(0, m, body, init)
    return HoughLines(theta_idx=ti, rho_idx=ri, votes=v,
                      valid=v > acc_threshold)


def hough_top_k(acc: jax.Array, k: int) -> HoughLines:
    """Plain top-k cells (the priority-queue variant)."""
    rho_bins = acc.shape[1]
    v, flat = jax.lax.top_k(acc.reshape(-1), k)
    return HoughLines(theta_idx=(flat // rho_bins).astype(jnp.int32),
                      rho_idx=(flat % rho_bins).astype(jnp.int32),
                      votes=v, valid=v > 0)


def accumulator_to_lines(lines: HoughLines, acc_shape: Tuple[int, int],
                         img_shape: Tuple[int, int]
                         ) -> Tuple[jax.Array, jax.Array]:
    """(θ_idx, ρ_idx) → (θ radians, ρ pixels) in image coordinates
    (inverse of the vote discretisation; operations.hh getLineFromPoint)."""
    t_theta, rho_bins = acc_shape
    h, w = img_shape
    diag = math.sqrt(h * h + w * w)
    theta = lines.theta_idx.astype(jnp.float32) * jnp.pi / (t_theta - 1)
    rho = (lines.rho_idx.astype(jnp.float32) * 2 * diag / (rho_bins - 1)
           - diag)
    return theta, rho


def line_endpoints(theta: jax.Array, rho: jax.Array,
                   img_shape: Tuple[int, int], length: float | None = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """Segment endpoints ((N,2) row/col each) for drawing a (θ, ρ) line
    clipped to a centred segment of ``length`` (default: image diagonal) —
    getLineFromPoint* capability (operations.hh:79-260)."""
    h, w = img_shape
    if length is None:
        length = math.sqrt(h * h + w * w)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # closest point to origin: (x0, y0) = ρ(cosθ, sinθ); direction (-sinθ, cosθ)
    x0, y0 = rho * ct, rho * st
    half = length / 2
    p1 = jnp.stack([y0 - half * ct, x0 + half * st], axis=-1)
    p2 = jnp.stack([y0 + half * ct, x0 - half * st], axis=-1)
    return p1, p2


def hough_lines(img: Image2d, m: int = 10, *, t_theta: int = 255,
                grad_threshold: float = 40.0, exclusion_theta: int = 5,
                exclusion_rho: int = 10, acc_threshold: float = 0.0):
    """End-to-end dense Hough line detection: accumulator → m peaks →
    (θ, ρ). Returns (HoughLines, theta, rho, accumulator)."""
    acc = hough_accumulator(img, t_theta=t_theta,
                            grad_threshold=grad_threshold)
    peaks = hough_peaks(acc, m, exclusion_theta=exclusion_theta,
                        exclusion_rho=exclusion_rho,
                        acc_threshold=acc_threshold)
    theta, rho = accumulator_to_lines(peaks, acc.shape, img.shape)
    return peaks, theta, rho, acc
