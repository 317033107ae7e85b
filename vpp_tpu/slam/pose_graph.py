"""Pose-graph optimisation — Gauss-Newton over SE(3) relative constraints.

Part of the SLAM back-end the reference only sketches
(structure_from_motion.hh declares the ctx; no solver exists). Nodes are
keyframe poses, edges are relative-pose measurements (odometry / loop
closures); the solver minimises Σ ||log(Z_ij⁻¹ T_i⁻¹ T_j)||²_Ω.

TPU-native: fixed-capacity masked edge lists; per-edge 6-vector residuals
and (6x6, 6x6) Jacobian blocks from one ``vmap(jacfwd)``; dense (6M, 6M)
Hessian assembly by scatter-add (window sizes M ≲ 128 keep this tiny);
damped iterations under ``lax.scan``. For multi-device operation the edge
set shards exactly like BA observations (psum the H/b blocks).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .se3 import se3_exp, se3_inverse, se3_log


class PoseGraph(NamedTuple):
    poses: jax.Array       # (M, 4, 4) world-from-keyframe (or any frame)
    edge_i: jax.Array      # (E,) int32
    edge_j: jax.Array      # (E,) int32
    edge_T: jax.Array      # (E, 4, 4) measured T_i^-1 T_j
    edge_w: jax.Array      # (E,) float32 information weight
    edge_valid: jax.Array  # (E,) bool
    fixed: jax.Array       # (M,) bool gauge anchors


def _edge_residual(di, dj, Ti, Tj, Z):
    """r = log(Z⁻¹ · (exp(di)Ti)⁻¹ · exp(dj)Tj) — local retraction."""
    Ti_d = se3_exp(di) @ Ti
    Tj_d = se3_exp(dj) @ Tj
    return se3_log(se3_inverse(Z) @ se3_inverse(Ti_d) @ Tj_d)


def pose_graph_residuals(g: PoseGraph) -> jax.Array:
    z6 = jnp.zeros((6,), jnp.float32)
    r = jax.vmap(lambda Ti, Tj, Z: _edge_residual(z6, z6, Ti, Tj, Z))(
        g.poses[g.edge_i], g.poses[g.edge_j], g.edge_T)
    return jnp.where(g.edge_valid[:, None], r, 0.0)


def pose_graph_solve(g: PoseGraph, *, iters: int = 10,
                     lam0: float = 1e-3) -> Tuple[PoseGraph, jax.Array]:
    """Damped Gauss-Newton; returns (optimised graph, per-iter costs)."""
    m = g.poses.shape[0]
    z6 = jnp.zeros((6,), jnp.float32)

    def blocks(Ti, Tj, Z):
        r = _edge_residual(z6, z6, Ti, Tj, Z)
        Ji = jax.jacfwd(_edge_residual, argnums=0)(z6, z6, Ti, Tj, Z)
        Jj = jax.jacfwd(_edge_residual, argnums=1)(z6, z6, Ti, Tj, Z)
        return r, Ji, Jj

    def body(carry, _):
        graph, lam = carry
        r, Ji, Jj = jax.vmap(blocks)(graph.poses[graph.edge_i],
                                     graph.poses[graph.edge_j],
                                     graph.edge_T)
        w = jnp.where(graph.edge_valid, graph.edge_w, 0.0)
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))

        H = jnp.zeros((m, 6, m, 6))
        b = jnp.zeros((m, 6))
        wi = w[:, None, None]
        ei, ej = graph.edge_i, graph.edge_j
        H = H.at[ei, :, ei, :].add(wi * jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[ej, :, ej, :].add(wi * jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[ei, :, ej, :].add(wi * jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[ej, :, ei, :].add(wi * jnp.einsum("eki,ekj->eij", Jj, Ji))
        b = b.at[ei].add(-w[:, None] * jnp.einsum("eki,ek->ei", Ji, r))
        b = b.at[ej].add(-w[:, None] * jnp.einsum("eki,ek->ei", Jj, r))

        Hm = H.reshape(m * 6, m * 6) + lam * jnp.eye(m * 6)
        rhs = b.reshape(m * 6)
        fixed = jnp.repeat(graph.fixed, 6)
        Hm = jnp.where(fixed[:, None] | fixed[None, :],
                       jnp.eye(m * 6), Hm)
        rhs = jnp.where(fixed, 0.0, rhs)
        d = jnp.linalg.solve(Hm, rhs).reshape(m, 6)

        poses = jax.vmap(lambda dd, T: se3_exp(dd) @ T)(d, graph.poses)
        poses = jnp.where(graph.fixed[:, None, None], graph.poses, poses)
        cand = graph._replace(poses=poses)

        r2 = pose_graph_residuals(cand)
        new_cost = jnp.sum(w * jnp.sum(r2 * r2, axis=-1))
        accept = new_cost < cost
        graph = graph._replace(
            poses=jnp.where(accept, cand.poses, graph.poses))
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        return (graph, lam), new_cost

    (out, _), costs = jax.lax.scan(body, (g, jnp.float32(lam0)), None,
                                   length=iters)
    return out, costs
