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


@functools.partial(jax.jit, static_argnames=(
    "r0", "c0", "ws", "patch", "gh", "gw", "offsets"))
def cost_volume_pallas(a1: jax.Array, a2w: jax.Array, *, r0: int, c0: int,
                       ws: int, patch: int, gh: int, gw: int,
                       offsets: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """(D², gh, gw) SAD volume, fused in VMEM.

    cost[k, i, j] = sum over the ws x ws window with top-left
    (r0 + i*patch + dr, c0 + j*patch + dc) of |a1 - a2w| sampled with
    displacement offsets[k] = (dr, dc) applied to a2w. All displaced
    slices must be in bounds: callers check r0+dr >= 0 and
    r0+dr+ER <= a1.shape[0] (same for columns) and fall back to the XLA
    path otherwise.
    """
    er = (gh - 1) * patch + ws
    ec = (gw - 1) * patch + ws
    p_mat = jnp.asarray(_window_matrices(gh, er, ws, patch))
    q_mat = jnp.asarray(_window_matrices(gw, ec, ws, patch).T)
    d2 = len(offsets)

    def kernel(a1_ref, a2_ref, p_ref, q_ref, out_ref):
        base = a1_ref[r0:r0 + er, c0:c0 + ec]
        p = p_ref[:]
        q = q_ref[:]
        for k, (dr, dc) in enumerate(offsets):
            sl = a2_ref[r0 + dr:r0 + dr + er, c0 + dc:c0 + dc + ec]
            d = jnp.abs(base - sl)
            rs = jnp.dot(p, d, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            out_ref[k] = jnp.dot(rs, q, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d2, gh, gw), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * d2 * (gh * er * ec + gh * ec * gw)
                      + 2 * d2 * er * ec),
            bytes_accessed=(a1.size + a2w.size + d2 * gh * gw) * 4,
            transcendentals=0),
    )(a1.astype(jnp.float32), a2w.astype(jnp.float32), p_mat, q_mat)


def cost_volume_fits(hb: int, wb: int, r0: int, c0: int, ws: int, patch: int,
                     gh: int, gw: int, radius: int,
                     vmem_budget: int = 13 * 2 ** 20) -> bool:
    """True when every displaced slice is in bounds and the working set
    (both images + volume + selection matrices) fits in VMEM."""
    er = (gh - 1) * patch + ws
    ec = (gw - 1) * patch + ws
    if r0 - radius < 0 or c0 - radius < 0:
        return False
    if r0 + er + radius > hb or c0 + ec + radius > wb:
        return False
    d2 = (2 * radius + 1) ** 2
    vmem = 4 * (2 * hb * wb + d2 * gh * gw + gh * er + ec * gw
                + 3 * er * ec)
    return vmem <= vmem_budget
