"""Pallas MXU kernel for the dense Hough accumulator.

The round-4 verdict asked for one real shot at the 1080p accumulator
(reference: dense_one_to_one_hough.hpp:32-108; XLA scatter-add baseline
~57 ms at 1080p). The design here is the SURVEY §7 "per-tile partial
accumulators" idea taken to its TPU-native conclusion:

* the (θ, ρ) accumulator lives in a VMEM scratch for the WHOLE kernel
  (grid steps on TPU are sequential, scratch persists);
* each grid step consumes one chunk of pixel votes and materialises two
  bf16 tent-weight matrices IN VMEM — A (T, C) carrying w·(1-ft, ft)
  rows, B (C, R) carrying the (1-fr, fr) columns — whose product is
  exactly the chunk's 4-way bilinear scatter (see
  hough.hough_accumulator_mxu);
* one MXU ``dot`` per chunk accumulates into the scratch in f32; the
  final step writes the scratch out once.

vs the pure-XLA chunked formulation (hough_accumulator_mxu) this avoids
materialising the one-hot matrices through HBM: they are built and
consumed inside VMEM. Errors vs the scatter reference are bf16 weight
rounding only (masks are exact; <= 0.4% per vote).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.image import Image2d
from .hough import _vote_bins


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(th_ref, rh_ref, w_ref, out_ref, acc_ref, *, t_pad, r_pad,
            n_chunks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    th = th_ref[:]                          # (C,) 1-D block
    rh = rh_ref[:]
    w = w_ref[:]
    c = th.shape[0]
    tt = jax.lax.broadcasted_iota(jnp.int32, (t_pad, c), 0
                                  ).astype(jnp.float32)
    A = w[None, :] * jnp.maximum(0.0, 1.0 - jnp.abs(tt - th[None, :]))
    rr = jax.lax.broadcasted_iota(jnp.int32, (c, r_pad), 1
                                  ).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(rr - rh[:, None]))
    acc_ref[:] += jnp.dot(A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(i == n_chunks - 1)
    def _():
        out_ref[:] = acc_ref[:]


def hough_accumulator_pallas(img: Image2d, *, t_theta: int = 255,
                             rho_bins: int | None = None,
                             grad_threshold: float = 40.0,
                             vote_weight: str = "binary",
                             pixel_mask: jax.Array | None = None,
                             chunk: int = 1024,
                             interpret: bool = False) -> jax.Array:
    """Drop-in ``hough_accumulator`` on the Pallas MXU path.

    ``chunk`` must stay 1024: 1-D operands get XLA tiling T(1024) and
    Mosaic requires the block to match it. ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU tests).

    Measured (v5e, 1080p, t_theta=255): 16.2 ms vs 58.8 ms scatter and
    15.0 ms for the pure-XLA chunked formulation
    (hough.hough_accumulator_mxu) — recorded finding: XLA already keeps
    the chunked one-hot operands in VMEM, so hand-placing them buys
    nothing; both sit near the ~13 ms MXU floor of this factorisation.
    """
    t0i, r0i, ft, fr, wgt, rho_bins = _vote_bins(
        img, t_theta, rho_bins, grad_threshold, vote_weight, pixel_mask)
    th_n = (t0i.astype(jnp.float32) + ft).reshape(-1)
    rho_n = (r0i.astype(jnp.float32) + fr).reshape(-1)
    w = wgt.reshape(-1)
    pad = (-th_n.size) % chunk
    th_n = jnp.pad(th_n, (0, pad))
    rho_n = jnp.pad(rho_n, (0, pad), constant_values=-2.0)
    w = jnp.pad(w, (0, pad))
    n_chunks = th_n.size // chunk
    t_pad = _round_up(t_theta, 8)
    r_pad = _round_up(rho_bins, 128)

    out = pl.pallas_call(
        partial(_kernel, t_pad=t_pad, r_pad=r_pad, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,))] * 3,
        out_specs=pl.BlockSpec((t_pad, r_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, r_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_pad, r_pad), jnp.float32)],
        interpret=interpret,
    )(th_n, rho_n, w)
    return out[:t_theta, :rho_bins]
