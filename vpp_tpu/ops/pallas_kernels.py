"""Pallas TPU kernels for the hot compute paths.

These kernels exist because the XLA formulations materialise large
intermediates in HBM. The semi-dense flow's cost volume
(algorithms/flow.py:_cost_volume) builds a (D², lr, lc) |diff| stack
(~150 MB at 640x480) before its strided reduce_window; the fused kernel
below keeps both images in VMEM and emits only the (D², gh, gw) volume —
~20x less HBM traffic.

Window sums use the MXU instead of strided vector slices: with P a
(gh, ER) 0/1 matrix selecting 9-row windows at stride `patch` and Q its
(EC, gw) column counterpart,

    vol[k] = P @ |a1 - shift(a2w, offsets[k])| @ Q

which is exactly the strided 9x9 box sum of the reference's SAD
(semi_dense_optical_flow.hpp:17-42) over every grid cell at once. Lane/
sublane-strided memory access is the slow path on TPU; 0/1 matmuls run at
MXU speed and the |diff| tiles never leave VMEM.

Offsets are emitted in the same smallest-magnitude-first order as
flow._displacement_table so the downstream argmin tie-break, volume
lookups and propagation sweeps are unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_matrices(g: int, extent: int, ws: int,
                     patch: int) -> np.ndarray:
    """(g, extent) 0/1 matrix: row i selects rows [i*patch, i*patch+ws)."""
    m = np.zeros((g, extent), np.float32)
    for i in range(g):
        m[i, i * patch:i * patch + ws] = 1.0
    return m


# ---------------------------------------------------------------------------
# Fully fused flow level: warp + cost volume + argmin + Jacobi propagation.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "r0", "c0", "ws", "patch", "gh", "gw", "radius", "offsets",
    "pred_bound", "prop_iters", "h", "w", "use_bf16"))
def flow_level_pallas(a1: jax.Array, a2: jax.Array, pred_r: jax.Array,
                      pred_c: jax.Array, digit_r: jax.Array,
                      digit_c: jax.Array, *, r0: int, c0: int, ws: int,
                      patch: int, gh: int, gw: int, radius: int,
                      offsets: Tuple[Tuple[int, int], ...], pred_bound: int,
                      prop_iters: int, h: int, w: int,
                      use_bf16: bool = False
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One semi-dense-flow pyramid level fused in VMEM.

    Replaces flow.py's _warp_by_cell_flow + _cost_volume + argmin +
    propagation chain (the XLA formulation materialises a (D², lr, lc)
    |diff| stack in HBM every level — ~150 MB at 640x480). Here the only
    HBM traffic is the two level images in and the (gh, gw) flow/dist out.

    Stages (semantics identical to the XLA path in algorithms/flow.py):
      1. backward-warp a2 by the even per-pixel digit maps (masked select
         over statically-rolled copies, axis 0 then axis 1 — rolls wrap,
         out-of-domain predictions are rejected downstream);
      2. per displacement k: window SADs for every grid cell at once as
         P @ |a1 - shift(a2w, offsets[k])| @ Q with 0/1 window-selection
         matrices — MXU work instead of strided slices. Default f32: the
         SAD is then bit-identical to the XLA path's reduce_window sums
         for grayscale pyramids (values are multiples of 2^-8·level, so
         f32 partial sums are exact regardless of association), which the
         parity tests (tests/test_pallas_flow.py) pin down. With
         ``use_bf16`` the |diff| tiles are cast to bfloat16 before the
         first matmul (f32 accumulate; exact only for integer-valued
         images) — an opt-in for MXU-bound geometries;
      3. ordered argmin (offsets come smallest-magnitude-first: strict <
         keeps the earliest = the descent's "move only if strictly
         better"), then in-domain rejection to the prediction;
      4. ``prop_iters`` Jacobi adopt-better-neighbour sweeps scored by
         one-hot volume lookups (flow.py:_volume_lookup semantics).

    Returns (flow_r, flow_c) int32 (gh, gw) and dist f32 (gh, gw).
    """
    sad_t = jnp.bfloat16 if use_bf16 else jnp.float32
    er = (gh - 1) * patch + ws
    ec = (gw - 1) * patch + ws
    p_mat = jnp.asarray(_window_matrices(gh, er, ws, patch), sad_t)
    q_mat = jnp.asarray(_window_matrices(gw, ec, ws, patch).T,
                        jnp.float32)
    d2 = len(offsets)
    dd = 2 * radius + 1
    # offsets[k] -> row-major flat id, for the propagation lookups
    flat_ids = [(dr + radius) * dd + (dc + radius) for dr, dc in offsets]
    inf = 1e30   # flow.py._INF; plain float (jnp scalars = captured consts)

    def roll(x, shift, axis):
        """jnp.roll semantics on top of pltpu.roll (needs shift >= 0)."""
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def kernel(a1_ref, a2_ref, pr_ref, pc_ref, dr_ref, dc_ref,
               p_ref, q_ref, fr_ref, fc_ref, dist_ref, vol_ref, warp_ref):
        # -- 1. warp ------------------------------------------------------
        if pred_bound > 0:
            src = a2_ref[:]
            out = src
            dig = dr_ref[:]
            for k in range(-pred_bound, pred_bound + 1, 2):
                if k == 0:
                    continue
                out = jnp.where(dig == k, roll(src, -k, 0), out)
            src = out
            dig = dc_ref[:]
            for k in range(-pred_bound, pred_bound + 1, 2):
                if k == 0:
                    continue
                out = jnp.where(dig == k, roll(src, -k, 1), out)
            warp_ref[:] = out.astype(sad_t)
        else:
            warp_ref[:] = a2_ref[:].astype(sad_t)

        # -- 2+3. cost volume + ordered argmin ----------------------------
        base = a1_ref[r0:r0 + er, c0:c0 + ec].astype(sad_t)
        p = p_ref[:]
        q = q_ref[:]
        best_d = jnp.full((gh, gw), inf, jnp.float32)
        best_fr = pr_ref[:]
        best_fc = pc_ref[:]
        for k, (dr, dc) in enumerate(offsets):
            sl = warp_ref[r0 + dr:r0 + dr + er, c0 + dc:c0 + dc + ec]
            d = jnp.abs(base - sl)
            # precision must be explicit per dtype: DEFAULT on f32 operands
            # truncates them to bf16 on the MXU (breaking exactness), while
            # HIGHEST on bf16 operands is rejected by Mosaic ("Bad lhs
            # type") — so f32 gets HIGHEST, bf16 gets DEFAULT
            prec = (jax.lax.Precision.DEFAULT if use_bf16
                    else jax.lax.Precision.HIGHEST)
            rs = jnp.dot(p, d, preferred_element_type=jnp.float32,
                         precision=prec)
            # rs stays f32 through the (9x smaller) second matmul: row sums
            # reach ~ws*255 where bf16 ulp is 16, which would inject tens of
            # grey-levels of SAD error — enough to flip non-tied argmins
            c = jnp.dot(rs, q, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            vol_ref[k] = c
            better = c < best_d
            best_d = jnp.where(better, c, best_d)
            best_fr = jnp.where(better, pr_ref[:] + dr, best_fr)
            best_fc = jnp.where(better, pc_ref[:] + dc, best_fc)

        # in-domain rejection (flow.py: centre pixel of the matched window
        # must stay inside the level domain)
        ctr_r = (jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) * patch
                 + patch // 2)
        ctr_c = (jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) * patch
                 + patch // 2)
        tr = ctr_r + best_fr
        tc = ctr_c + best_fc
        in_dom = (tr >= 0) & (tr <= h - 1) & (tc >= 0) & (tc <= w - 1)
        flow_r = jnp.where(in_dom, best_fr, pr_ref[:])
        flow_c = jnp.where(in_dom, best_fc, pc_ref[:])
        dist = jnp.where(in_dom, best_d, inf)

        # -- 4. Jacobi propagation ----------------------------------------
        gr = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
        for _ in range(prop_iters):
            bf_r, bf_c, bd = flow_r, flow_c, dist
            for ndr, ndc in ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                             (1, -1), (1, 0), (1, 1)):
                nf_r = roll(roll(flow_r, -ndr, 0), -ndc, 1)
                nf_c = roll(roll(flow_c, -ndr, 0), -ndc, 1)
                inside = ((gr + ndr >= 0) & (gr + ndr < gh) &
                          (gc + ndc >= 0) & (gc + ndc < gw))
                q_r = nf_r - pr_ref[:]
                q_c = nf_c - pc_ref[:]
                inwin = ((q_r >= -radius) & (q_r <= radius) &
                         (q_c >= -radius) & (q_c <= radius))
                qflat = ((jnp.clip(q_r, -radius, radius) + radius) * dd
                         + jnp.clip(q_c, -radius, radius) + radius)
                cand = jnp.full((gh, gw), 0.0, jnp.float32)
                for k in range(d2):
                    cand = cand + jnp.where(qflat == flat_ids[k],
                                            vol_ref[k], 0.0)
                cand = jnp.where(inwin, cand, inf)
                dfr = flow_r - nf_r
                dfc = flow_c - nf_c
                far = (dfr * dfr + dfc * dfc) > 4
                ok = inside & far & (cand < bd)
                bf_r = jnp.where(ok, nf_r, bf_r)
                bf_c = jnp.where(ok, nf_c, bf_c)
                bd = jnp.where(ok, cand, bd)
            flow_r, flow_c, dist = bf_r, bf_c, bd

        fr_ref[:] = flow_r
        fc_ref[:] = flow_c
        dist_ref[:] = dist

    hb, wb = a1.shape
    nshift = (pred_bound > 0) * 2 * pred_bound
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((gh, gw), jnp.int32),
                   jax.ShapeDtypeStruct((gh, gw), jnp.int32),
                   jax.ShapeDtypeStruct((gh, gw), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        scratch_shapes=[pltpu.VMEM((d2, gh, gw), jnp.float32),
                        pltpu.VMEM((hb, wb), sad_t)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * d2 * (gh * er * ec + gh * ec * gw)
                      + 2 * d2 * er * ec + 3 * nshift * hb * wb),
            bytes_accessed=(2 * hb * wb + 3 * gh * gw) * 4,
            transcendentals=0),
    )(a1.astype(jnp.float32), a2.astype(jnp.float32), pred_r, pred_c,
      digit_r, digit_c, p_mat, q_mat)


def flow_level_fits(hb: int, wb: int, r0: int, c0: int, ws: int, patch: int,
                    gh: int, gw: int, radius: int,
                    vmem_budget: int = 100 * 2 ** 20) -> bool:
    """True when the displaced slices are in bounds (callers pre-pad) and
    the fused level's working set fits the v5e VMEM budget."""
    er = (gh - 1) * patch + ws
    ec = (gw - 1) * patch + ws
    if r0 - radius < 0 or c0 - radius < 0:
        return False
    if r0 + er + radius > hb or c0 + ec + radius > wb:
        return False
    d2 = (2 * radius + 1) ** 2
    vmem = (4 * (3 * hb * wb + d2 * gh * gw)      # images + warp + volume
            + 4 * 2 * hb * wb                     # digit maps (int32)
            + 2 * gh * er + 4 * ec * gw           # P (bf16), Q (f32)
            + 2 * er * ec + 4 * gh * ec           # diff (bf16), row sums
            + 4 * 8 * gh * gw)                    # flow/dist temporaries
    return vmem <= vmem_budget
