"""Sparse optical flow — detect-both-frames + match + LK refine.

The reference sketches this pipeline but never finished it
(/root/reference/vpp/algorithms/optical_flow/sparse_optical_flow.hh:36-112
is wrapped in ``#if 0 // FIXME: Reactivate when it compiles``; only the
SIMD sad_distance helper is live). This module delivers the intended
capability, TPU-native:

1. FAST9 keypoints on both frames (blockwise budgets, fixed capacity);
2. patch-descriptor matching restricted to a spatial search radius
   (the sketch's local matcher role — here one masked (K1, K2) SAD
   matrix + argmin, see matcher.py design notes);
3. sub-pixel Lucas-Kanade refinement of each matched displacement.

Everything is static-shape and jits as one program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.image import Image2d
from ..core.interp import extract_patches
from .fast import fast9
from .lk import lucas_kanade
from .matcher import local_match


class SparseFlow(NamedTuple):
    pos1: jax.Array      # (K, 2) float32 keypoints in frame 1
    pos2: jax.Array      # (K, 2) float32 matched + refined positions
    distance: jax.Array  # (K,) descriptor distance of the match
    valid: jax.Array     # (K,) bool


def sparse_optical_flow(i1: Image2d, i2: Image2d, *,
                        detector_th: int = 10, k: int = 512,
                        block_size: int = 10, patch_radius: int = 3,
                        search_radius: float = 30.0,
                        winsize: int = 11, nscales: int = 3,
                        max_refine: float = 3.0) -> SparseFlow:
    """Match FAST keypoints between two frames; returns a SparseFlow of
    static capacity ``k``. ``max_refine`` caps how far the LK refinement
    may move a match (px) before falling back to the descriptor match."""
    pos1, score1, ok1 = fast9(i1, detector_th, k=k, blockwise=True,
                              block_size=block_size)
    pos2, score2, ok2 = fast9(i2, detector_th, k=k, blockwise=True,
                              block_size=block_size)

    side = 2 * patch_radius + 1
    d1 = extract_patches(i1.data, pos1 + i1.border, side).reshape(k, -1)
    d2 = extract_patches(i2.data, pos2 + i2.border, side).reshape(k, -1)
    idx, dist, found = local_match(
        d1, pos1.astype(jnp.float32), d2, pos2.astype(jnp.float32),
        search_radius=search_radius, distance="sad",
        query_valid=ok1, train_valid=ok2)

    p1 = pos1.astype(jnp.float32)
    p2 = pos2[idx].astype(jnp.float32)

    # sub-pixel refinement: LK seeded with the matched displacement
    flow, err = lucas_kanade(i1, i2, p1, winsize=winsize, nscales=nscales,
                             prediction=p2 - p1)
    refined = p1 + flow
    keep_lk = (jnp.linalg.norm(refined - p2, axis=1) <= max_refine) & \
        (err < 1e30)
    p2 = jnp.where(keep_lk[:, None], refined, p2)
    return SparseFlow(pos1=p1, pos2=p2, distance=dist, valid=found)
