"""Unscented Kalman filter (CTRV) — occlusion-bridging line prediction.

Capability parity with
/root/reference/vpp/algorithms/hough_extruder/unscented_kalman_filter.hh/.hpp:
state dim 5 [pos1, pos2, v, yaw, yaw-rate], augmented dim 7 (two process
noises), λ = 3 − n_aug (unscented_kalman_filter.hpp:13-67); augmented sigma
points → CTRV process prediction → predicted mean/covariance → measurement
update on a 2-vector observation (the tracker feeds (ρ, θ) detections,
unscented_kalman_filter.hh:54-71).

TPU-native: the filter state is a pytree (x, P); sigma-point generation
uses a Cholesky factor; all 15 sigma points propagate as one batched
(vmapped) CTRV step; ``predict``/``update`` jit and can be vmapped over a
whole bank of track filters at once (the tracker keeps one per line slot —
on TPU the entire bank advances in lockstep).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

N_X = 5
N_AUG = 7
LAMBDA = 3.0 - N_AUG


class UKFState(NamedTuple):
    x: jax.Array   # (5,) state
    P: jax.Array   # (5, 5) covariance


def ukf_init(x0: jax.Array | None = None,
             p0: float = 1.0) -> UKFState:
    x = jnp.zeros((N_X,), jnp.float32) if x0 is None else \
        jnp.asarray(x0, jnp.float32)
    return UKFState(x=x, P=jnp.eye(N_X, dtype=jnp.float32) * p0)


def _weights() -> Tuple[jax.Array, jax.Array]:
    n = 2 * N_AUG + 1
    wm = jnp.full((n,), 0.5 / (LAMBDA + N_AUG), jnp.float32)
    wm = wm.at[0].set(LAMBDA / (LAMBDA + N_AUG))
    return wm, wm


def _augmented_sigma_points(st: UKFState, std_a: float,
                            std_yawdd: float) -> jax.Array:
    """(2n_aug+1, 7) augmented sigma points
    (unscented_kalman_filter.hpp AugmentedSigmaPoints)."""
    x_aug = jnp.concatenate([st.x, jnp.zeros((2,), jnp.float32)])
    P_aug = jnp.zeros((N_AUG, N_AUG), jnp.float32)
    P_aug = P_aug.at[:N_X, :N_X].set(st.P)
    P_aug = P_aug.at[5, 5].set(std_a ** 2)
    P_aug = P_aug.at[6, 6].set(std_yawdd ** 2)
    L = jnp.linalg.cholesky(P_aug + 1e-9 * jnp.eye(N_AUG))
    s = jnp.sqrt(LAMBDA + N_AUG)
    pts = [x_aug]
    pts += [x_aug + s * L[:, i] for i in range(N_AUG)]
    pts += [x_aug - s * L[:, i] for i in range(N_AUG)]
    return jnp.stack(pts)


def _ctrv_process(sp: jax.Array, dt: float) -> jax.Array:
    """CTRV motion model on one augmented sigma point (hpp
    SigmaPointPrediction); branchless near-zero-yaw-rate handling."""
    px, py, v, yaw, yawd, nu_a, nu_yawdd = sp
    eps = 1e-3
    straight = jnp.abs(yawd) < eps
    yawd_safe = jnp.where(straight, 1.0, yawd)
    px_t = jnp.where(
        straight,
        px + v * dt * jnp.cos(yaw),
        px + v / yawd_safe * (jnp.sin(yaw + yawd * dt) - jnp.sin(yaw)))
    py_t = jnp.where(
        straight,
        py + v * dt * jnp.sin(yaw),
        py + v / yawd_safe * (jnp.cos(yaw) - jnp.cos(yaw + yawd * dt)))
    # additive noise terms
    px_t = px_t + 0.5 * nu_a * dt * dt * jnp.cos(yaw)
    py_t = py_t + 0.5 * nu_a * dt * dt * jnp.sin(yaw)
    v_t = v + nu_a * dt
    yaw_t = yaw + yawd * dt + 0.5 * nu_yawdd * dt * dt
    yawd_t = yawd + nu_yawdd * dt
    return jnp.stack([px_t, py_t, v_t, yaw_t, yawd_t])


def _norm_angle(a: jax.Array) -> jax.Array:
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _psd(P: jax.Array, cap: float = 1e3) -> jax.Array:
    """Symmetrise + jitter + scale-cap: keeps P positive-definite through
    the K S Kᵀ subtraction, and bounds the sigma-point spread of the
    unobservable dims (v, yaw, yaw-rate random-walk) whose unbounded
    growth otherwise drives the trigonometric process model unstable."""
    P = 0.5 * (P + P.T)
    dmax = jnp.max(jnp.diagonal(P))
    scale = jnp.minimum(1.0, cap / jnp.maximum(dmax, 1e-9))
    return P * scale + 1e-6 * jnp.eye(P.shape[0], dtype=P.dtype)


def ukf_predict(st: UKFState, dt: float, *, std_a: float = 2.0,
                std_yawdd: float = 0.3
                ) -> Tuple[UKFState, jax.Array]:
    """Prediction step (hh:54-61 ``prediction(dt)``): returns the new
    state and the (15, 5) predicted sigma points (kept for the update)."""
    sp_aug = _augmented_sigma_points(st, std_a, std_yawdd)
    sp = jax.vmap(lambda p: _ctrv_process(p, dt))(sp_aug)   # (15, 5)
    wm, wc = _weights()
    x = jnp.sum(wm[:, None] * sp, axis=0)
    d = sp - x[None]
    d = d.at[:, 3].set(_norm_angle(d[:, 3]))
    P = jnp.einsum("i,ij,ik->jk", wc, d, d)
    x = x.at[3].set(_norm_angle(x[3]))     # keep yaw wrapped
    return UKFState(x=x, P=_psd(P)), sp


def ukf_update(st: UKFState, sp: jax.Array, z: jax.Array,
               h: Callable[[jax.Array], jax.Array], Rm: jax.Array,
               angle_dims: Tuple[int, ...] = ()
               ) -> UKFState:
    """Measurement update with observation function ``h`` and noise ``Rm``
    (hpp PredictRhoThetaMeasurement + UpdateState fused). ``angle_dims``
    lists measurement components that wrap (the θ of a (ρ, θ) detection)."""
    wm, wc = _weights()
    zsig = jax.vmap(h)(sp)                            # (15, nz)
    zpred = jnp.sum(wm[:, None] * zsig, axis=0)
    dz = zsig - zpred[None]
    for a in angle_dims:
        dz = dz.at[:, a].set(_norm_angle(dz[:, a]))
    S = jnp.einsum("i,ij,ik->jk", wc, dz, dz) + Rm
    dx = sp - st.x[None]
    dx = dx.at[:, 3].set(_norm_angle(dx[:, 3]))
    Tc = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    K = Tc @ jnp.linalg.inv(S)
    innov = z - zpred
    for a in angle_dims:
        innov = innov.at[a].set(_norm_angle(innov[a]))
    x = st.x + K @ innov
    x = x.at[3].set(_norm_angle(x[3]))     # keep yaw wrapped
    P = st.P - K @ S @ K.T
    return UKFState(x=x, P=_psd(P))


def rho_theta_measurement(x: jax.Array) -> jax.Array:
    """Observation: the track state's (pos1, pos2) read as (ρ, θ) — the
    hough tracker filters directly in accumulator space (hh:54-71)."""
    return x[:2]


def ukf_predict_update_rho_theta(st: UKFState, z: jax.Array, dt: float, *,
                                 std_a: float = 0.5, std_yawdd: float = 0.05,
                                 std_rho: float = 3.0,
                                 std_theta: float = 0.05) -> UKFState:
    """One predict+update cycle on a (ρ, θ) detection."""
    st2, sp = ukf_predict(st, dt, std_a=std_a, std_yawdd=std_yawdd)
    Rm = jnp.diag(jnp.array([std_rho ** 2, std_theta ** 2], jnp.float32))
    return ukf_update(st2, sp, z, rho_theta_measurement, Rm,
                      angle_dims=(1,))
