"""SE(3)/SO(3) Lie-group utilities — batched, differentiable.

The reference's SfM subtree manipulates rotations/translations through
Eigen ad hoc (structure_from_motion.hpp, plucker.hh); the SLAM back-end
here (which the reference only stubs: structure_from_motion.hh:55-56
``triangulation``/``bundle_adjustement``) needs proper exp/log maps for
Gauss-Newton updates on manifolds.

All functions broadcast over leading batch dims and are jax-differentiable
(the BA Jacobians come from jacfwd through these).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1)], -2)


def _abc(t2: jax.Array):
    """Smooth coefficients a=sinθ/θ, b=(1-cosθ)/θ², c=(θ-sinθ)/θ³ as
    functions of t2=θ², with the double-where trick so jacfwd/jacrev stay
    finite at θ=0 (a bare norm() has a NaN tangent there — this is what
    the BA Jacobians differentiate through)."""
    small = t2 < _EPS
    t2s = jnp.where(small, 1.0, t2)          # safe operand for sqrt/div
    th = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (th - jnp.sin(th)) / (t2s * th))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues),
    Taylor- and gradient-safe near zero."""
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = _hat(w)
    a, b, _ = _abc(t2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a * K + b * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle, stable for small angles."""
    # clip strictly inside (-1, 1): arccos' gradient is infinite at ±1,
    # and the pose-graph Jacobians differentiate through here
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1) / 2,
                  -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(tr)
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    s = jnp.where(theta < _EPS, 0.5 + theta * theta / 12.0,
                  theta / (2.0 * jnp.sin(jnp.where(theta < _EPS, 1.0,
                                                   theta))))
    return v * s[..., None]


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) [w | v] -> (..., 4, 4) homogeneous transform."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = _hat(w)
    _, b, c = _abc(t2)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    V = eye + b * K + c * (K @ K)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> twist (..., 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = _hat(w)
    # V^{-1} = I - K/2 + (1/θ² - (1+cosθ)/(2θ sinθ)) K²
    t2 = theta * theta
    sin = jnp.sin(theta)
    safe = jnp.where(theta < _EPS, 1.0, 2.0 * theta * sin)
    coef = jnp.where(theta < _EPS, 1.0 / 12.0,
                     1.0 / jnp.where(theta < _EPS, 1.0, t2)
                     - (1.0 + jnp.cos(theta)) / safe)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    Vinv = eye - K / 2 + coef * (K @ K)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def se3_apply(T: jax.Array, X: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., 3)."""
    return (T[..., :3, :3] @ X[..., None])[..., 0] + T[..., :3, 3]
