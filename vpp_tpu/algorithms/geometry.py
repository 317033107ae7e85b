"""Epipolar geometry + multi-view triangulation — batched linalg.

Capability parity with the reference:

* ``epipole_left`` / ``epipole_right`` (epipolar_geometry.hh:9-54): the
  epipoles as the null vectors of F^T F / F F^T, recovered by
  eigen-decomposition (smallest eigenvalue) and dehomogenised.
* ``triangulate`` (slam/triangulate.hh:11-29): two-view DLT triangulation
  of a point from two projection matrices, solved by SVD.

TPU-native design: everything is expressed as dense batched linear algebra
(``jnp.linalg`` on stacked arrays / ``vmap``), so thousands of points
triangulate as one fused program on the MXU. Coordinates follow the
framework convention (row, col) only at the image API boundary; geometry
here uses standard homogeneous (x, y, 1) / (X, Y, Z, 1) vectors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def epipole_right(F: jax.Array) -> jax.Array:
    """Right epipole e with F e = 0 — null vector of F^T F, dehomogenised
    (epipolar_geometry.hh:33-54 computes the symmetric eigen-decomposition
    and takes the smallest-eigenvalue vector)."""
    F = jnp.asarray(F, jnp.float32)
    _, vecs = jnp.linalg.eigh(F.T @ F)   # ascending eigenvalues
    e = vecs[:, 0]
    w = jnp.where(jnp.abs(e[2]) < 1e-12, 1.0, e[2])
    return e[:2] / w


def epipole_left(F: jax.Array) -> jax.Array:
    """Left epipole e' with e'^T F = 0 — null vector of F F^T
    (epipolar_geometry.hh:9-31)."""
    return epipole_right(jnp.asarray(F, jnp.float32).T)


def epipolar_line(F: jax.Array, x: jax.Array) -> jax.Array:
    """Lines l' = F x for (N, 2) points x (homogenised); returns (N, 3)."""
    x = jnp.asarray(x, jnp.float32)
    hom = jnp.concatenate([x, jnp.ones_like(x[:, :1])], axis=1)
    return hom @ jnp.asarray(F, jnp.float32).T


def _triangulate_one(P1: jax.Array, P2: jax.Array, x1: jax.Array,
                     x2: jax.Array) -> jax.Array:
    """DLT for a single correspondence: rows x*(p3) - p{1,2} from both
    views stacked into A, null vector by SVD (triangulate.hh:11-29)."""
    rows = jnp.stack([
        x1[0] * P1[2] - P1[0],
        x1[1] * P1[2] - P1[1],
        x2[0] * P2[2] - P2[0],
        x2[1] * P2[2] - P2[1],
    ])
    _, _, vt = jnp.linalg.svd(rows)
    X = vt[-1]
    w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
    return X[:3] / w


def triangulate_ls(P1: jax.Array, P2: jax.Array, x1: jax.Array,
                   x2: jax.Array) -> jax.Array:
    """Batched 2-view DLT in INHOMOGENEOUS form: the same 4 DLT rows as
    ``_triangulate_one`` but solved as A[:, :3] X = -A[:, 3] via 3x3
    normal equations — one batched elementwise-inverted solve for the
    whole landmark set instead of N vmapped 4x4 SVDs (the SLAM keyframe
    hot path; SVD stays the oracle for points near infinity, where the
    inhomogeneous form degrades — SLAM landmarks are depth-gated anyway).

    P1/P2: (N, 3, 4) or (3, 4); x1/x2: (N, 2) pixel (x=col, y=row).
    """
    from ..slam.ba import _inv3
    P1 = jnp.broadcast_to(P1, x1.shape[:1] + (3, 4))
    P2 = jnp.broadcast_to(P2, x2.shape[:1] + (3, 4))
    rows = jnp.stack([
        x1[:, 0, None] * P1[:, 2] - P1[:, 0],
        x1[:, 1, None] * P1[:, 2] - P1[:, 1],
        x2[:, 0, None] * P2[:, 2] - P2[:, 0],
        x2[:, 1, None] * P2[:, 2] - P2[:, 1]], axis=1)     # (N, 4, 4)
    A = rows[:, :, :3]
    b = -rows[:, :, 3]
    AtA = jnp.einsum("nei,nej->nij", A, A) + 1e-9 * jnp.eye(3)
    Atb = jnp.einsum("nei,ne->ni", A, b)
    return jnp.einsum("nij,nj->ni", _inv3(AtA), Atb)


def triangulate(P1: jax.Array, P2: jax.Array, x1: jax.Array,
                x2: jax.Array) -> jax.Array:
    """Triangulate correspondences x1 <-> x2 ((N, 2) pixel coords in view
    1/2) given (3, 4) projection matrices. Returns (N, 3) world points.

    The reference triangulates one point per call (triangulate.hh:11-29);
    here the SVDs are vmapped so the whole landmark set solves at once.
    """
    P1 = jnp.asarray(P1, jnp.float32)
    P2 = jnp.asarray(P2, jnp.float32)
    x1 = jnp.atleast_2d(jnp.asarray(x1, jnp.float32))
    x2 = jnp.atleast_2d(jnp.asarray(x2, jnp.float32))
    return jax.vmap(lambda a, b: _triangulate_one(P1, P2, a, b))(x1, x2)


def fundamental_from_projections(P1: jax.Array,
                                 P2: jax.Array) -> jax.Array:
    """F from two projection matrices (for tests / epipolar-flow callers):
    F = [e']_x P2 P1^+ with e' = P2 C, C the camera centre of P1."""
    P1 = jnp.asarray(P1, jnp.float32)
    P2 = jnp.asarray(P2, jnp.float32)
    # camera centre: null vector of P1
    _, _, vt = jnp.linalg.svd(P1)
    C = vt[-1]
    e2 = P2 @ C
    ex = jnp.array([[0.0, -e2[2], e2[1]],
                    [e2[2], 0.0, -e2[0]],
                    [-e2[1], e2[0], 0.0]], jnp.float32)
    return ex @ P2 @ jnp.linalg.pinv(P1)


def reprojection_error(P: jax.Array, X: jax.Array,
                       x: jax.Array) -> jax.Array:
    """(N,) pixel reprojection error of world points X under P."""
    X = jnp.atleast_2d(jnp.asarray(X, jnp.float32))
    x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
    hom = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1)
    proj = hom @ jnp.asarray(P, jnp.float32).T
    w = jnp.where(jnp.abs(proj[:, 2:3]) < 1e-12, 1e-12, proj[:, 2:3])
    return jnp.linalg.norm(proj[:, :2] / w - x, axis=1)
