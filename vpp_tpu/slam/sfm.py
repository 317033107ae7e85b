"""SfM from line correspondences: pose estimation, vanishing points,
Plücker line algebra.

Capability parity with /root/reference/vpp/algorithms/line_tracker_4_sfm/sfm/:

* ``pose_estimation_from_line_correspondence`` (structure_from_motion.hpp:9,
  536,615 — Zhang's RPLN: polynomial system + SVD + iterative refinement
  ``r_and_t``/``cal_campose``): estimate (R, t) from N 3-D reference lines
  and their image projections.
* ``vanishing_point`` detection (vanishing_point.hh:22-60): vote pairwise
  line intersections into an orientation accumulator, return the dominant
  directions.
* Plücker coordinates + rigid transforms (plucker.hh:38-100).

TPU-native redesign: the RPLN polynomial machinery is replaced by batched
**Gauss-Newton on SE(3) from multiple restarts** — the same inputs and
outputs (line correspondences in, (R, t) out), solved by minimising the
line-reprojection residual (both projected 3-D endpoint directions must be
orthogonal to the observed image line's normal). A bank of R restarts
advances in lockstep under ``vmap`` and the lowest-residual pose wins —
branchless, jittable, and robust over a wide pose range where the
reference needs its polynomial bootstrap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .se3 import se3_exp, so3_exp


# -- Plücker lines (plucker.hh) --------------------------------------------

def plucker_from_points(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """(..., 6) Plücker coordinates [d | m] of the line through p1, p2:
    direction d = p2 - p1 (normalised), moment m = p1 x d
    (plucker.hh:38-61)."""
    d = p2 - p1
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    m = jnp.cross(p1, d)
    return jnp.concatenate([d, m], axis=-1)


def plucker_transform(L: jax.Array, T: jax.Array) -> jax.Array:
    """Rigid transform of Plücker lines: d' = R d, m' = R m + t x (R d)
    (plucker.hh:63-100)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    d = (R @ L[..., :3, None])[..., 0]
    m = (R @ L[..., 3:, None])[..., 0] + jnp.cross(t, d)
    return jnp.concatenate([d, m], axis=-1)


def plucker_point_distance(L: jax.Array, X: jax.Array) -> jax.Array:
    """Distance from points X to lines L."""
    d = L[..., :3]
    m = L[..., 3:]
    return jnp.linalg.norm(jnp.cross(X, d) - m, axis=-1)


# -- pose from line correspondences ----------------------------------------

def _line_residuals(xi: jax.Array, P1: jax.Array, P2: jax.Array,
                    normals: jax.Array) -> jax.Array:
    """(N, 2) residuals: the camera-frame endpoints of each 3-D line must
    be orthogonal to the observed image line's interpretation-plane normal
    (the standard line-reprojection constraint)."""
    T = se3_exp(xi)
    R = T[:3, :3]
    t = T[:3, 3]
    c1 = P1 @ R.T + t
    c2 = P2 @ R.T + t
    c1 = c1 / jnp.maximum(jnp.linalg.norm(c1, axis=-1, keepdims=True),
                          1e-12)
    c2 = c2 / jnp.maximum(jnp.linalg.norm(c2, axis=-1, keepdims=True),
                          1e-12)
    r1 = jnp.sum(c1 * normals, axis=-1)
    r2 = jnp.sum(c2 * normals, axis=-1)
    return jnp.stack([r1, r2], axis=-1)


def image_line_normals(l1: jax.Array, l2: jax.Array,
                       intr: jax.Array) -> jax.Array:
    """(N, 3) interpretation-plane normals from image segment endpoints
    ((row, col) pixels): n = x1 x x2 in normalised camera coords."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    def back(p):
        x = (p[..., 1] - cx) / fx
        y = (p[..., 0] - cy) / fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    n = jnp.cross(back(l1), back(l2))
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                           1e-12)


def pose_from_line_correspondences(
        start_points: jax.Array, end_points: jax.Array,
        img_l1: jax.Array, img_l2: jax.Array, intr: jax.Array, *,
        iters: int = 30, restarts: int = 8, lam: float = 1e-3,
        valid: jax.Array | None = None
        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Estimate camera-from-world (R, t) from N 3-D line segments
    (``start_points``/``end_points``, world frame) and their observed image
    segments (``img_l1``/``img_l2`` pixel endpoints) — the capability of
    ``pose_estimation_from_line_correspondence``
    (structure_from_motion.hpp:9).

    A bank of ``restarts`` Gauss-Newton solvers runs in lockstep from
    rotations spread over SO(3); the lowest-residual solution is returned
    as (R (3,3), t (3,), residual scalar).
    """
    normals = image_line_normals(img_l1, img_l2, intr)
    n = start_points.shape[0]
    vmask = jnp.ones((n,), bool) if valid is None else valid
    w = vmask.astype(jnp.float32)

    def refine(xi0):
        def body(carry, _):
            xi, damp = carry
            r = _line_residuals(xi, start_points, end_points, normals)
            r = r * w[:, None]
            J = jax.jacfwd(lambda x: (_line_residuals(
                x, start_points, end_points, normals)
                * w[:, None]).reshape(-1))(xi)
            rf = r.reshape(-1)
            H = J.T @ J + damp * jnp.eye(6)
            g = J.T @ rf
            dx = jnp.linalg.solve(H, g)
            xi_new = xi - dx
            c_old = jnp.sum(rf * rf)
            r2 = (_line_residuals(xi_new, start_points, end_points,
                                  normals) * w[:, None]).reshape(-1)
            c_new = jnp.sum(r2 * r2)
            accept = c_new < c_old
            xi = jnp.where(accept, xi_new, xi)
            damp = jnp.where(accept, jnp.maximum(damp * 0.5, 1e-9),
                             jnp.minimum(damp * 5.0, 1e3))
            return (xi, damp), c_new

        (xi, _), costs = jax.lax.scan(body, (xi0, jnp.float32(lam)), None,
                                      length=iters)
        r = (_line_residuals(xi, start_points, end_points, normals)
             * w[:, None])
        return xi, jnp.sum(r * r)

    # restarts: rotations spread over SO(3) (axis-angle grid), zero t...
    # translation is observable once rotation is roughly right
    rng_axes = np.array(
        [[0, 0, 0], [np.pi / 2, 0, 0], [0, np.pi / 2, 0],
         [0, 0, np.pi / 2], [np.pi, 0, 0], [0, np.pi, 0],
         [0, 0, np.pi], [np.pi / 2, np.pi / 2, 0]], np.float32)
    xi0s = jnp.zeros((restarts, 6), jnp.float32)
    k = min(restarts, len(rng_axes))
    xi0s = xi0s.at[:k, :3].set(jnp.asarray(rng_axes[:k]))

    xis, costs = jax.vmap(refine)(xi0s)
    best = jnp.argmin(costs)
    T = se3_exp(xis[best])
    return T[:3, :3], T[:3, 3], costs[best]


# -- vanishing points (vanishing_point.hh:22-60) ---------------------------

def vanishing_points(theta: jax.Array, rho: jax.Array,
                     valid: jax.Array, intr: jax.Array, *,
                     n_phi: int = 90, n_psi: int = 180, top: int = 3
                     ) -> Tuple[jax.Array, jax.Array]:
    """Dominant vanishing directions from detected (θ, ρ) image lines.

    Every line pair votes its intersection (a candidate vanishing point,
    back-projected to a unit direction) into a (φ, ψ) spherical
    accumulator; the ``top`` cells win (vanishing_point.hh:22-60 pairwise
    voting made dense: all O(L²) pairs vote at once).
    Returns (directions (top, 3), votes (top,)).
    """
    # line in homogeneous image coords: x cosθ + y sinθ - ρ = 0
    L = jnp.stack([jnp.cos(theta), jnp.sin(theta), -rho], axis=-1)
    inter = jnp.cross(L[:, None, :], L[None, :, :])     # (L, L, 3)
    pair_ok = (valid[:, None] & valid[None, :] &
               (jnp.arange(L.shape[0])[:, None] <
                jnp.arange(L.shape[0])[None, :]))
    wgt = pair_ok.astype(jnp.float32).reshape(-1)
    x = inter.reshape(-1, 3)
    # back-project pixel homogeneous point to camera ray
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    zsafe = jnp.where(jnp.abs(x[:, 2]) < 1e-9, 1e-9, x[:, 2])
    u = x[:, 0] / zsafe
    v = x[:, 1] / zsafe
    ray = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)],
                    axis=-1)
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                            1e-12)
    # ±d identical: fold to z >= 0 hemisphere
    ray = jnp.where(ray[:, 2:3] < 0, -ray, ray)
    phi = jnp.arccos(jnp.clip(ray[:, 2], -1, 1))        # [0, π/2]
    psi = jnp.arctan2(ray[:, 1], ray[:, 0])             # [-π, π]
    pi_ = jnp.pi
    pidx = jnp.clip((phi / (pi_ / 2) * n_phi).astype(jnp.int32), 0,
                    n_phi - 1)
    sidx = jnp.clip(((psi + pi_) / (2 * pi_) * n_psi).astype(jnp.int32),
                    0, n_psi - 1)
    acc = jnp.zeros((n_phi, n_psi)).at[pidx, sidx].add(wgt)
    votes, flat = jax.lax.top_k(acc.reshape(-1), top)
    pf = (flat // n_psi).astype(jnp.float32) + 0.5
    sf = (flat % n_psi).astype(jnp.float32) + 0.5
    phi_c = pf * (pi_ / 2) / n_phi
    psi_c = sf * 2 * pi_ / n_psi - pi_
    dirs = jnp.stack([jnp.sin(phi_c) * jnp.cos(psi_c),
                      jnp.sin(phi_c) * jnp.sin(psi_c),
                      jnp.cos(phi_c)], axis=-1)
    return dirs, votes
