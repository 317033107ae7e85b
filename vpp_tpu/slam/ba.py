"""Bundle adjustment — Levenberg-Marquardt with landmark Schur complement,
optionally sharded over a TPU mesh.

The reference only *stubs* this capability
(structure_from_motion.hh:55-56 declares ``triangulation()`` /
``bundle_adjustement()`` with empty bodies); per the build plan this is the
new TPU-native back-end: keyframe poses + landmarks refined jointly from
fixed-capacity observation lists, with the classic Schur trick (eliminate
landmarks, solve the reduced pose system) expressed as dense batched
linear algebra.

TPU-native design:

* The problem is a static-shape pytree: poses (M, 4, 4), landmarks (N, 3),
  observations (O,) of (pose_idx, lm_idx, uv, valid) — masked slots replace
  dynamic graphs.
* Per-observation residual/Jacobian blocks come from one ``vmap(jacfwd)``
  over the SE(3) retraction (exp(δ)·T) — no hand-derived Jacobians.
* Assembly is pure scatter-add: Hll (N, 3, 3), Hpl (N, M, 6, 3), dense
  Hpp (6M, 6M). For sliding-window BA (M ≲ 64) the reduced camera system
  is tiny; the Schur complement is one einsum over landmarks and the solve
  is a dense Cholesky on the MXU.
* **Distributed**: with a mesh + axis name, observations are sharded over
  devices inside ``shard_map``; each device assembles partial H/b blocks
  from its shard and ``psum`` reduces them over ICI before the replicated
  solve — the Hessian-block all-reduce pattern (BASELINE north star §7.8).
* Levenberg-Marquardt runs a fixed number of iterations with branchless
  accept/reject (cost-compare + where), so the whole solver jits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .se3 import _hat, se3_apply, se3_exp

_HUGE = np.float32(1e30)


def _inv3(A: jax.Array) -> jax.Array:
    """Batched SPD 3x3 inverse via closed-form Cholesky — pure
    elementwise arithmetic (batched ``jnp.linalg.inv`` lowers to an LU
    per matrix, which TPUs execute poorly at (N, 3, 3) scale).

    Used where downstream gates catch the rare tail-case bad inverse
    (triangulation: depth + reprojection acceptance), and inside the LM
    solvers only on the ``linalg="chol"`` fast path (parallax-gated
    sliding windows). On the generic path a single bad Hll inverse among
    10k landmarks poisons the cost sum and stalls convergence (measured
    on the N=10k scale test — median accuracy 1e-6 but the cond>1e9 tail
    is ~4x worse than LU; a Newton-Schulz refinement diverges on exactly
    those blocks). Callers must damp A so it is SPD.
    """
    dg = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], -1)
    s = jax.lax.rsqrt(jnp.maximum(jnp.abs(dg), 1e-30))
    A = A * s[..., :, None] * s[..., None, :]
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    tiny = 1e-30
    l11 = jnp.sqrt(jnp.maximum(a11, tiny))
    il11 = 1.0 / l11
    l21 = a21 * il11
    l31 = a31 * il11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, tiny))
    il22 = 1.0 / l22
    l32 = (a32 - l31 * l21) * il22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, tiny))
    il33 = 1.0 / l33
    # inv(L), lower triangular
    m11 = il11
    m21 = -l21 * il11 * il22
    m31 = (l21 * l32 - l31 * l22) * il11 * il22 * il33
    m22 = il22
    m32 = -l32 * il22 * il33
    m33 = il33
    # A^-1 = inv(L)^T inv(L), symmetric
    i11 = m11 * m11 + m21 * m21 + m31 * m31
    i12 = m21 * m22 + m31 * m32
    i13 = m31 * m33
    i22 = m22 * m22 + m32 * m32
    i23 = m32 * m33
    i33 = m33 * m33
    inv = jnp.stack([
        jnp.stack([i11, i12, i13], -1),
        jnp.stack([i12, i22, i23], -1),
        jnp.stack([i13, i23, i33], -1)], -2)
    return inv * s[..., :, None] * s[..., None, :]


def proj_jacobians(T: jax.Array, X: jax.Array, intr: jax.Array
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Analytic per-observation projection Jacobians.

    Returns (pred (..., 2) = (row, col) projection, Jp (..., 2, 6) wrt
    the left-multiplied pose twist [w | v] (the ``se3_exp(δ) @ T``
    retraction), Jl (..., 2, 3) wrt the world point).

    Identical math to differentiating ``project`` with ``jacfwd`` (the
    round-1..4 path, kept as the oracle in tests) but ~10x fewer HLOs:
    for pc = T·X, d pc/d[w|v] = [-[pc]x | I] and d pc/dX = R.
    """
    pc = se3_apply(T, X)
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    iz = 1.0 / z
    u = intr[0] * pc[..., 0] * iz + intr[2]
    v = intr[1] * pc[..., 1] * iz + intr[3]
    pred = jnp.stack([v, u], -1)
    zero = jnp.zeros_like(iz)
    du = jnp.stack([intr[0] * iz, zero,
                    -intr[0] * pc[..., 0] * iz * iz], -1)
    dv = jnp.stack([zero, intr[1] * iz,
                    -intr[1] * pc[..., 1] * iz * iz], -1)
    dproj = jnp.stack([dv, du], -2)                       # (..., 2, 3)
    eye = jnp.broadcast_to(jnp.eye(3), pc.shape[:-1] + (3, 3))
    dpc = jnp.concatenate([-_hat(pc), eye], -1)           # (..., 3, 6)
    Jp = dproj @ dpc
    Jl = dproj @ T[..., :3, :3]
    return pred, Jp, Jl


class BAProblem(NamedTuple):
    poses: jax.Array        # (M, 4, 4) camera-from-world
    landmarks: jax.Array    # (N, 3) world points
    obs_pose: jax.Array     # (O,) int32
    obs_lm: jax.Array       # (O,) int32
    obs_uv: jax.Array       # (O, 2) float32 pixel measurements (row, col)
    obs_valid: jax.Array    # (O,) bool
    intrinsics: jax.Array   # (4,) [fx, fy, cx, cy]
    fixed_poses: jax.Array  # (M,) bool — gauge freeze (e.g. first pose)


def project(T: jax.Array, X: jax.Array, intr: jax.Array) -> jax.Array:
    """Pinhole projection of world point X by camera-from-world T:
    returns (row, col) = (fy y/z + cy, fx x/z + cx)."""
    xc = se3_apply(T, X)
    z = jnp.where(jnp.abs(xc[..., 2]) < 1e-6, 1e-6, xc[..., 2])
    u = intr[0] * xc[..., 0] / z + intr[2]
    v = intr[1] * xc[..., 1] / z + intr[3]
    return jnp.stack([v, u], axis=-1)


def reprojection_residuals(p: BAProblem) -> jax.Array:
    """(O, 2) residuals (masked slots -> 0)."""
    T = p.poses[p.obs_pose]
    X = p.landmarks[p.obs_lm]
    r = project(T, X, p.intrinsics) - p.obs_uv
    return jnp.where(p.obs_valid[:, None], r, 0.0)


def _obs_jacobians(p: BAProblem) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-observation residual r (O,2), Jp (O,2,6) wrt the pose's local
    twist δ (retraction exp(δ)·T), Jl (O,2,3) wrt the landmark."""
    intr = p.intrinsics

    def res(delta, dX, T, X, uv):
        Td = se3_exp(delta) @ T
        return project(Td, X + dX, intr) - uv

    z6 = jnp.zeros((6,), jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)

    def one(T, X, uv):
        r = res(z6, z3, T, X, uv)
        Jp = jax.jacfwd(res, argnums=0)(z6, z3, T, X, uv)
        Jl = jax.jacfwd(res, argnums=1)(z6, z3, T, X, uv)
        return r, Jp, Jl

    T = p.poses[p.obs_pose]
    X = p.landmarks[p.obs_lm]
    return jax.vmap(one)(T, X, p.obs_uv)


def _huber_weight(r: jax.Array, delta: float) -> jax.Array:
    """IRLS Huber weights per observation from the residual norm."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


def _assemble(p: BAProblem, r, Jp, Jl, w):
    """Partial normal-equation blocks from (a shard of) the observations —
    pure scatter-adds, psum-reducible."""
    m = p.poses.shape[0]
    n = p.landmarks.shape[0]
    wv = jnp.where(p.obs_valid, w, 0.0)
    Jp_w = Jp * wv[:, None, None]
    Jl_w = Jl * wv[:, None, None]

    Hpp = jnp.zeros((m, 6, 6)).at[p.obs_pose].add(
        jnp.einsum("oki,okj->oij", Jp_w, Jp))
    Hll = jnp.zeros((n, 3, 3)).at[p.obs_lm].add(
        jnp.einsum("oki,okj->oij", Jl_w, Jl))
    # cross blocks, grouped by landmark: (N, M, 6, 3)
    Hpl = jnp.zeros((n, m, 6, 3)).at[p.obs_lm, p.obs_pose].add(
        jnp.einsum("oki,okj->oij", Jp_w, Jl))
    bp = jnp.zeros((m, 6)).at[p.obs_pose].add(
        -jnp.einsum("oki,ok->oi", Jp_w, r))
    bl = jnp.zeros((n, 3)).at[p.obs_lm].add(
        -jnp.einsum("oki,ok->oi", Jl_w, r))
    cost = jnp.sum(wv * jnp.sum(r * r, axis=-1))
    nobs_lm = jnp.zeros((n,)).at[p.obs_lm].add(wv)
    return Hpp, Hll, Hpl, bp, bl, cost, nobs_lm


def _schur_solve(p: BAProblem, Hpp, Hll, Hpl, bp, bl, nobs_lm, lam):
    """Damped Schur-complement solve -> (δposes (M,6), δlandmarks (N,3))."""
    m = p.poses.shape[0]
    n = p.landmarks.shape[0]
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    # LM damping + freeze unobserved landmarks / fixed poses
    Hll_d = Hll + (lam + 1e-6) * eye3[None]
    seen = nobs_lm > 0
    Hll_d = jnp.where(seen[:, None, None], Hll_d, eye3[None])
    bl = jnp.where(seen[:, None], bl, 0.0)
    Hll_inv = jnp.linalg.inv(Hll_d)

    # S = Hpp_full - Σ_l Hpl_l Hll_l^-1 Hpl_l^T   (6M x 6M)
    Hpp_full = jnp.zeros((m, 6, m, 6))
    Hpp_full = Hpp_full.at[jnp.arange(m), :, jnp.arange(m), :].add(
        Hpp + lam * eye6[None])
    HplWinv = jnp.einsum("nmij,njk->nmik", Hpl, Hll_inv)   # (N, M, 6, 3)
    S_red = jnp.einsum("nmik,npjk->mipj", HplWinv, Hpl)    # (M,6,M,6)
    S = (Hpp_full - S_red).reshape(m * 6, m * 6)
    rhs = (bp - jnp.einsum("nmik,nk->mi", HplWinv, bl)).reshape(m * 6)

    # gauge: fixed poses get identity rows/cols and zero rhs
    fixed = jnp.repeat(p.fixed_poses, 6)
    S = jnp.where(fixed[:, None] | fixed[None, :],
                  jnp.eye(m * 6), S)
    rhs = jnp.where(fixed, 0.0, rhs)

    dp = jnp.linalg.solve(S, rhs).reshape(m, 6)
    # back-substitute landmarks: δl = Hll^-1 (bl - Hlp δp)
    Hlp_dp = jnp.einsum("nmij,mi->nj", Hpl, dp)
    dl = jnp.einsum("nij,nj->ni", Hll_inv, bl - Hlp_dp)
    dl = jnp.where(seen[:, None], dl, 0.0)
    return dp, dl


def _apply_step(p: BAProblem, dp, dl) -> BAProblem:
    poses = jax.vmap(lambda d, T: se3_exp(d) @ T)(dp, p.poses)
    poses = jnp.where(p.fixed_poses[:, None, None], p.poses, poses)
    return p._replace(poses=poses, landmarks=p.landmarks + dl)


def _masked_cost(p: BAProblem, huber: float) -> jax.Array:
    r = reprojection_residuals(p)
    w = _huber_weight(r, huber)
    return jnp.sum(jnp.where(p.obs_valid, w * jnp.sum(r * r, -1), 0.0))


def ba_solve(p: BAProblem, *, iters: int = 10, huber: float = 4.0,
             lam0: float = 1e-3,
             mesh=None, axis: str = "obs") -> Tuple[BAProblem, jax.Array]:
    """Levenberg-Marquardt BA on the FLAT observation layout — a
    small-window solver and the cross-check oracle for
    ``ba_solve_tracks`` (the production path).

    Memory is quadratic-ish: the Schur assembly materialises an
    (N, M, 6, 3) pose-landmark coupling tensor (72 N M bytes, twice). At
    a sliding window's scale (M <= ~16, N <= ~2k) that is a few MB; at
    N = 100k landmarks x M = 128 poses it is ~1 GB per copy and at
    N = 1M it is fatal — use ``ba_solve_tracks``, which assembles
    per-landmark K x K block pairs and shards over landmarks, for
    anything beyond a window. A guard below refuses the obviously-fatal
    regime rather than letting the allocator die.

    Returns (refined problem, (iters,) costs). With ``mesh`` given, the
    observation arrays must be shardable along ``axis`` (O divisible by
    the axis size); the per-shard H/b blocks are ``psum``-reduced over
    ICI and every device performs the same replicated solve — the
    distributed Hessian-reduction pattern.
    """
    n_lm = p.landmarks.shape[0]
    n_pose = p.poses.shape[0]
    coupling_gb = n_lm * n_pose * 18 * 4 / 1e9
    if coupling_gb > 4.0:
        raise ValueError(
            f"ba_solve's flat layout would allocate ~{coupling_gb:.1f} GB "
            f"for the (N={n_lm}, M={n_pose}, 6, 3) coupling tensor; use "
            "ba_solve_tracks (landmark-major, shardable) at this scale")

    def assemble_full(prob: BAProblem):
        r, Jp, Jl = _obs_jacobians(prob)
        w = _huber_weight(r, huber)
        return _assemble(prob, r, Jp, Jl, w)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        obs_spec = BAProblem(
            poses=P(), landmarks=P(), obs_pose=P(axis), obs_lm=P(axis),
            obs_uv=P(axis), obs_valid=P(axis), intrinsics=P(),
            fixed_poses=P())

        @partial(shard_map, mesh=mesh, in_specs=(obs_spec,),
                 out_specs=P())
        def sharded_assemble(prob):
            parts = assemble_full(prob)
            return jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, axis), parts)

        assemble = sharded_assemble
    else:
        assemble = assemble_full

    def body(carry, _):
        prob, lam = carry
        Hpp, Hll, Hpl, bp, bl, cost, nobs = assemble(prob)
        dp, dl = _schur_solve(prob, Hpp, Hll, Hpl, bp, bl, nobs, lam)
        cand = _apply_step(prob, dp, dl)
        new_cost = _masked_cost(cand, huber)
        accept = new_cost < cost
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                accept if a.ndim == 0 else
                accept.reshape((1,) * a.ndim), a, b), cand, prob)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        # report the *accepted* cost (a rejected/NaN candidate step must
        # not leak into the cost trace — LM guarantees monotonicity)
        return (prob, lam), jnp.where(accept, new_cost, cost)

    (out, _), costs = jax.lax.scan(
        body, (p, jnp.float32(lam0)), None, length=iters)
    return out, costs


# ---------------------------------------------------------------------------
# Scalable landmark-major BA (tracks): the production path.
#
# The flat ``ba_solve`` above materialises Hpl as (N, M, 6, 3) — fine for
# sliding windows (M <= ~16, N <= ~2k), quadratic-memory death beyond. The
# track layout stores each landmark's observations contiguously
# ((N, K) slots, masked), so the Schur complement is assembled from
# K x K block *pairs per landmark* — O(N K² 36) work and memory, no N x M
# tensor — and shards over landmarks: each device owns a map block and
# psum-reduces only pose-sized aggregates (S (M,6,M,6), rhs, cost) over
# ICI. This is the Hessian-block reduction of the BASELINE north star at
# production scale (N >= 10k, M >= 128; see tests/test_slam_scale.py).
# ---------------------------------------------------------------------------


class BATracks(NamedTuple):
    """Landmark-major BA problem: slot j of row l is the j-th observation
    of landmark l (masked by obs_valid). The natural output format of the
    tracker front-end (a keypoint's trajectory IS its track)."""
    poses: jax.Array        # (M, 4, 4) camera-from-world
    landmarks: jax.Array    # (N, 3)
    obs_pose: jax.Array     # (N, K) int32 — pose index per observation
    obs_uv: jax.Array       # (N, K, 2) float32 (row, col)
    obs_valid: jax.Array    # (N, K) bool
    intrinsics: jax.Array   # (4,) [fx, fy, cx, cy]
    fixed_poses: jax.Array  # (M,) bool


def tracks_from_flat(p: BAProblem, k_max: Optional[int] = None) -> BATracks:
    """Host-side (numpy) conversion from the flat observation list.
    ``k_max`` defaults to the longest track."""
    op = np.asarray(p.obs_pose)
    ol = np.asarray(p.obs_lm)
    uv = np.asarray(p.obs_uv)
    ov = np.asarray(p.obs_valid)
    n = p.landmarks.shape[0]
    counts = np.zeros(n, np.int32)
    if k_max is None:
        k_max = 1
        c = np.bincount(ol[ov], minlength=n)
        k_max = max(1, int(c.max()))
    obs_pose = np.zeros((n, k_max), np.int32)
    obs_uv = np.zeros((n, k_max, 2), np.float32)
    obs_valid = np.zeros((n, k_max), bool)
    for o in range(op.shape[0]):
        if not ov[o]:
            continue
        l, j = int(ol[o]), int(counts[ol[o]])
        if j < k_max:
            obs_pose[l, j] = op[o]
            obs_uv[l, j] = uv[o]
            obs_valid[l, j] = True
            counts[l] += 1
    return BATracks(poses=p.poses, landmarks=p.landmarks,
                    obs_pose=jnp.asarray(obs_pose),
                    obs_uv=jnp.asarray(obs_uv),
                    obs_valid=jnp.asarray(obs_valid),
                    intrinsics=p.intrinsics, fixed_poses=p.fixed_poses)


def _obs_poses(p: BATracks, ring_layout: bool = False) -> jax.Array:
    """(N, K, 4, 4) pose per observation. In the ring layout
    ``obs_pose[n, j] == j`` so the (N, K) gather — which serialises on
    the TPU scalar unit — collapses to a free broadcast."""
    if ring_layout:
        return jnp.broadcast_to(p.poses[None],
                                p.obs_uv.shape[:2] + (4, 4))
    return p.poses[p.obs_pose]


def track_residuals(p: BATracks, ring_layout: bool = False) -> jax.Array:
    """(N, K, 2) reprojection residuals, masked slots -> 0."""
    T = _obs_poses(p, ring_layout)                # (N, K, 4, 4)
    X = p.landmarks[:, None, :]
    r = project(T, X, p.intrinsics) - p.obs_uv
    return jnp.where(p.obs_valid[..., None], r, 0.0)


def _track_jacobians(p: BATracks, ring_layout: bool = False):
    """r (N,K,2), Jp (N,K,2,6) wrt pose twist, Jl (N,K,2,3) wrt landmark
    — analytic (``proj_jacobians``); the AD formulation below is the
    cross-check oracle (tests/test_slam.py pins their agreement)."""
    T = _obs_poses(p, ring_layout)
    X = jnp.broadcast_to(p.landmarks[:, None, :],
                         p.obs_uv.shape[:2] + (3,))
    pred, Jp, Jl = proj_jacobians(T, X, p.intrinsics)
    return pred - p.obs_uv, Jp, Jl


def _track_jacobians_ad(p: BATracks):
    """jacfwd-through-``se3_exp`` oracle for ``_track_jacobians``."""
    intr = p.intrinsics
    z6 = jnp.zeros((6,), jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)

    def res(delta, dX, T, X, uv):
        return project(se3_exp(delta) @ T, X + dX, intr) - uv

    def one(T, X, uv):
        return (res(z6, z3, T, X, uv),
                jax.jacfwd(res, argnums=0)(z6, z3, T, X, uv),
                jax.jacfwd(res, argnums=1)(z6, z3, T, X, uv))

    T = p.poses[p.obs_pose]
    X = jnp.broadcast_to(p.landmarks[:, None, :],
                         p.obs_uv.shape[:2] + (3,))
    return jax.vmap(jax.vmap(one))(T, X, p.obs_uv)


def _tracks_cost(p: BATracks, huber: float,
                 ring_layout: bool = False) -> jax.Array:
    r = track_residuals(p, ring_layout)
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))
    return jnp.sum(jnp.where(p.obs_valid, w * jnp.sum(r * r, -1), 0.0))


def _tracks_assemble(p: BATracks, lam, huber: float,
                     ring_layout: bool = False, linalg: str = "lu"):
    """Per-shard normal equations. Returns
    (pose-sized aggregates to psum: S (M,6,M,6), rhs (M,6), cost) and
    (landmark-local: Hll_inv (N,3,3), bl (N,3), U (N,K,6,3), seen (N,)).

    Pose damping is NOT added here: S is psum-reduced across devices in
    the sharded path, so per-shard ``lam*I`` would be multiplied by the
    axis size. ``_tracks_solve_poses`` adds it once, after the reduction.
    (Landmark damping in Hll_d is safe: landmarks are sharded, each row
    is assembled exactly once.)

    ``ring_layout``: assert-free fast path for the sliding-window ring
    problem where ``obs_pose[n, j] == j`` for every row (K == M, the
    layout ``slam.pipeline`` builds by construction). All the
    scatter-adds collapse into dense einsum reductions over landmarks —
    MXU contractions instead of TPU-hostile scatters, and the
    (N, K, K, 6, 6) pair tensor never materialises.
    """
    m = p.poses.shape[0]
    r, Jp, Jl = _track_jacobians(p, ring_layout)
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))
    w = jnp.where(p.obs_valid, w, 0.0)                    # (N, K)
    Jp_w = Jp * w[..., None, None]
    Jl_w = Jl * w[..., None, None]

    Hll = jnp.einsum("nkri,nkrj->nij", Jl_w, Jl)          # (N,3,3)
    bl = -jnp.einsum("nkri,nkr->ni", Jl_w, r)             # (N,3)
    U = jnp.einsum("nkri,nkrj->nkij", Jp_w, Jl)           # (N,K,6,3)
    cost = jnp.sum(w * jnp.sum(r * r, axis=-1))

    seen = jnp.sum(w, axis=1) > 0
    eye3 = jnp.eye(3)
    Hll_d = Hll + (lam + 1e-6) * eye3[None]
    Hll_d = jnp.where(seen[:, None, None], Hll_d, eye3[None])
    bl = jnp.where(seen[:, None], bl, 0.0)
    # linalg="lu": batched LU — one tail-case bad closed-form inverse
    # among 10k landmarks poisons the LM cost sum and stalls convergence
    # (measured on the N=10k scale test); LU's pivoting keeps the tail in
    # check. linalg="chol": the scaled closed-form Cholesky (_inv3) — on
    # TPU the batched (N,3,3) LU costs ~0.86 ms at N=1024 (it lowers to a
    # pivoted row loop) vs ~0 for _inv3's fused elementwise arithmetic;
    # the sliding-window pipeline uses it because its landmarks are
    # parallax-gated at triangulation (pipeline min_parallax), keeping
    # every Hll block far from the near-singular tail (verified: same
    # ATE to 4 decimals on the bench_slam geometries).
    Hll_inv = (jnp.linalg.inv(Hll_d) if linalg == "lu" else _inv3(Hll_d))
    W = jnp.einsum("nkij,njc->nkic", U, Hll_inv)          # (N,K,6,3)

    if ring_layout:
        # obs_pose[n, j] == j: every aggregate is a plain reduction
        pose_idx = None
        Hpp = jnp.einsum("nkri,nkrj->kij", Jp_w, Jp)      # (M,6,6)
        bp = -jnp.einsum("nkri,nkr->ki", Jp_w, r)
        S = -jnp.einsum("nkij,nlmj->klim", W, U)          # (M,M,6,6)
        S = S.at[jnp.arange(m), jnp.arange(m)].add(Hpp)
        S = S.transpose(0, 2, 1, 3)                       # (M,6,M,6)
        rhs = bp - jnp.einsum("nkij,nj->ki", W, bl)
    else:
        pose_idx = jnp.where(p.obs_valid, p.obs_pose, 0)  # zero blocks drop
        Hpp = jnp.zeros((m, 6, 6)).at[pose_idx].add(
            jnp.einsum("nkri,nkrj->nkij", Jp_w, Jp))
        bp = jnp.zeros((m, 6)).at[pose_idx].add(
            -jnp.einsum("nkri,nkr->nki", Jp_w, r))
        # Schur off-diagonal: per landmark, all K x K observation pairs
        pair = jnp.einsum("nkij,nlmj->nklim", W, U)       # (N,K,K,6,6)
        p1 = jnp.broadcast_to(pose_idx[:, :, None], pair.shape[:3])
        p2 = jnp.broadcast_to(pose_idx[:, None, :], pair.shape[:3])
        S = jnp.zeros((m, m, 6, 6)).at[p1, p2].add(-pair)
        S = S.at[jnp.arange(m), jnp.arange(m)].add(Hpp)
        S = S.transpose(0, 2, 1, 3)                       # (M,6,M,6)
        rhs = bp - jnp.zeros((m, 6)).at[pose_idx].add(
            jnp.einsum("nkij,nj->nki", W, bl))
    return (S, rhs, cost), (Hll_inv, bl, U, pose_idx, seen)


def _tracks_solve_poses(S, rhs, fixed_poses, lam, linalg: str = "lu"):
    m = rhs.shape[0]
    S = S.reshape(m * 6, m * 6)
    # LM pose damping, added exactly once (after any psum reduction)
    S = S + lam * jnp.eye(m * 6)
    fixed = jnp.repeat(fixed_poses, 6)
    S = jnp.where(fixed[:, None] | fixed[None, :], jnp.eye(m * 6), S)
    rhs = jnp.where(fixed, 0.0, rhs.reshape(-1))
    # Jacobi preconditioning: the reduced camera system of a long pose
    # chain is ill-conditioned (rotation rows ~fx² vs translation rows);
    # symmetric diagonal scaling keeps the f32 solve accurate at M >= 128
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    Sp = S * d[:, None] * d[None, :]
    if linalg == "chol":
        # S is damped-PD in exact arithmetic, and at sliding-window scale
        # (M <= ~16, healthy damping) f32 Cholesky holds — and skips LU's
        # pivoting, ~0.18 ms per keyframe on v5e. At M = 128 with
        # lam ~ 1e-4 the Schur complement's rounding makes Sp
        # numerically indefinite (sqrt of a negative -> NaN -> the first
        # LM steps reject; seen on the 10k-landmark scale test), so the
        # generic path keeps pivoted LU.
        L = jax.scipy.linalg.cholesky(Sp, lower=True)
        dp = d * jax.scipy.linalg.cho_solve((L, True), d * rhs)
    else:
        dp = d * jnp.linalg.solve(Sp, d * rhs)
    return dp.reshape(m, 6)


def _tracks_backsub(local, dp):
    Hll_inv, bl, U, pose_idx, seen = local
    if pose_idx is None:                   # ring layout: obs j <-> pose j
        Udp = jnp.einsum("nkij,ki->nj", U, dp)            # (N,3)
    else:
        Udp = jnp.einsum("nkij,nki->nj", U, dp[pose_idx])
    dl = jnp.einsum("nij,nj->ni", Hll_inv, bl - Udp)
    return jnp.where(seen[:, None], dl, 0.0)


def ba_solve_tracks(p: BATracks, *, iters: int = 10, huber: float = 4.0,
                    lam0: float = 1e-3, mesh=None, axis: str = "lm",
                    ring_layout: bool = False, linalg: str = "lu"
                    ) -> Tuple[BATracks, jax.Array]:
    """Levenberg-Marquardt over a landmark-major problem.

    With ``mesh``, landmarks (rows of landmarks/obs_*) shard over ``axis``
    (N divisible by the axis size): every device assembles its map block's
    S/rhs, psum-reduces the pose-sized aggregates over ICI, runs the same
    replicated (6M, 6M) solve, and back-substitutes its own landmarks
    locally. Poses are replicated; landmark state never crosses devices.

    ``ring_layout=True`` promises ``obs_pose[n, j] == j`` (the sliding
    window ring, K == M) and replaces every scatter-add in the assembly
    with a dense einsum reduction — see ``_tracks_assemble``.

    ``linalg``: solver flavour. "lu" — pivoted LU for both the (N, 3, 3)
    landmark blocks and the reduced pose system; robust at the
    10k-landmark near-singular tail and at M >= 128 where f32 rounding
    makes the Schur complement numerically indefinite. "chol" —
    closed-form scaled Cholesky landmark inverses + Cholesky pose solve,
    ~1 ms faster per LM iteration on v5e at N=1024; right for
    parallax-gated sliding windows (small M, healthy damping).
    """
    if ring_layout:
        assert p.obs_pose.shape[1] == p.poses.shape[0], (
            "ring_layout requires K == M (obs column j observed by "
            "pose j)")

    def step_local(prob: BATracks, lam):
        (S, rhs, cost), local = _tracks_assemble(prob, lam, huber,
                                                 ring_layout, linalg)
        dp = _tracks_solve_poses(S, rhs, prob.fixed_poses, lam, linalg)
        dl = _tracks_backsub(local, dp)
        return dp, dl, cost

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        spec = BATracks(poses=P(), landmarks=P(axis), obs_pose=P(axis),
                        obs_uv=P(axis), obs_valid=P(axis), intrinsics=P(),
                        fixed_poses=P())

        @partial(shard_map, mesh=mesh, in_specs=(spec, P()),
                 out_specs=(P(), P(axis), P()))
        def sharded_step(prob, lam):
            (S, rhs, cost), local = _tracks_assemble(prob, lam, huber,
                                                     ring_layout, linalg)
            S = jax.lax.psum(S, axis)
            rhs = jax.lax.psum(rhs, axis)
            cost = jax.lax.psum(cost, axis)
            dp = _tracks_solve_poses(S, rhs, prob.fixed_poses, lam, linalg)
            dl = _tracks_backsub(local, dp)
            return dp, dl, cost

        def cost_fn(prob):
            @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=P())
            def c(pr):
                return jax.lax.psum(_tracks_cost(pr, huber, ring_layout),
                                    axis)
            return c(prob)

        step = sharded_step
    else:
        step = step_local
        cost_fn = lambda prob: _tracks_cost(prob, huber,  # noqa: E731
                                            ring_layout)

    def apply_step(poses0, lms0, dp, dl):
        poses = jax.vmap(lambda d, T: se3_exp(d) @ T)(dp, poses0)
        poses = jnp.where(p.fixed_poses[:, None, None], poses0, poses)
        return poses, lms0 + dl

    # the LM scan carries ONLY the mutable state (poses, landmarks, lam):
    # carrying the whole problem pytree made every iteration re-select
    # the static obs arrays through accept/reject wheres — pure copy
    # traffic XLA does not always elide
    def body(carry, _):
        poses0, lms0, lam = carry
        prob = p._replace(poses=poses0, landmarks=lms0)
        dp, dl, cost = step(prob, lam)
        cand_poses, cand_lms = apply_step(poses0, lms0, dp, dl)
        new_cost = cost_fn(p._replace(poses=cand_poses,
                                      landmarks=cand_lms))
        accept = new_cost < cost
        poses0 = jnp.where(accept, cand_poses, poses0)
        lms0 = jnp.where(accept, cand_lms, lms0)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        return (poses0, lms0, lam), jnp.where(accept, new_cost, cost)

    (poses, lms, _), costs = jax.lax.scan(
        body, (p.poses, p.landmarks, jnp.float32(lam0)), None,
        length=iters)
    return p._replace(poses=poses, landmarks=lms), costs
