"""FAST9 corner detection — full-image, lane-parallel.

Capability parity with the reference detector
(/root/reference/vpp/algorithms/fast_detector/fast.hpp):

* 16-point Bresenham circle of radius 3, keypoint iff 9 circularly
  contiguous points are all brighter than v+th or all darker than v-th
  (is_fast9_keypoint, fast.hpp:80-113).
* score = max(sum of diffs beyond +th, sum of |diffs| beyond -th) over the
  circle (fast9_score, fast.hpp:36-77); the score *image* stores score/16 as
  uint8 (fast_detector9_maxima, fast.hpp:688-694).
* selection post-passes: 3x3 strict local maxima (fast.hpp:555-575) and
  per-block argmax (fast.hpp:744-799), plus occupancy masks.

TPU-native design: the reference's hand-written AVX2/SSE/NEON cascade
(fast.hpp:114-251) early-exits per 32-pixel block; on the VPU we evaluate
every pixel — branchless lockstep is the fast path. The 9-contiguous check
adapts the reference's Arkanosis 48-bit trick (fast9_check_code,
fast.hpp:25-34) to 32-bit lanes: pack the 16 brighter (resp. darker) flags
into the low 16 bits of an int32, duplicate into the high half, then four
shift-AND rounds compute all circular 9-runs at once — ~12 integer VPU ops
per pixel per polarity, fully fused by XLA with the diff computation.

Keypoint *lists* are fixed-capacity: ``select_keypoints`` extracts the top-K
scoring detections into a static (K, 2) array + validity mask (TPU has no
dynamic vectors; K is a compile-time budget).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.image import Image2d, from_array

# The 16 circle offsets, index k = bit k. Order matches the reference's code
# layout (is_fast9_keypoint packs n(-3,-1) at bit 0 and walks the circle;
# any fixed circular order detects the same keypoint set).
CIRCLE = [(-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3),
          (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3), (0, -3),
          (-1, -3), (-2, -2)]


def _circle_diffs(img: Image2d) -> jax.Array:
    """(16, H, W) int32 diffs circle_point - center."""
    v = img.interior.astype(jnp.int32)
    return jnp.stack([img.shifted(dr, dc).astype(jnp.int32) - v
                      for dr, dc in CIRCLE], axis=0)


def _has_9_contiguous(flags: jax.Array) -> jax.Array:
    """flags: (16, H, W) bool → (H, W) bool: any 9 circularly-contiguous set.

    Lane-wise adaptation of fast9_check_code (fast.hpp:25-34).
    """
    bits = flags.astype(jnp.int32)
    code = jnp.zeros(flags.shape[1:], dtype=jnp.int32)
    for k in range(16):
        code = code | (bits[k] << k)
    c = code | (code << 16)          # two copies of the 16-bit ring
    r2 = c & (c << 1)
    r4 = r2 & (r2 << 2)
    r8 = r4 & (r4 << 4)
    r9 = r8 & (c << 8)               # bit i: AND of bits i-8..i
    # runs ending at circular position e are read at doubled bit e+16
    return (r9 & jnp.int32(-65536)) != 0  # mask 0xFFFF0000


def fast9_detect(img: Image2d, th: int) -> jax.Array:
    """(H, W) bool keypoint mask. Needs border >= 3 (fast.hpp:937)."""
    assert img.border >= 3, "FAST needs a border of at least 3px"
    d = _circle_diffs(img)
    brighter = d > th
    darker = d < -th
    return _has_9_contiguous(brighter) | _has_9_contiguous(darker)


def fast9_score(img: Image2d, th: int) -> jax.Array:
    """(H, W) int32 FAST score at every pixel (fast9_score semantics,
    fast.hpp:36-77): max over polarity of the sum of super-threshold
    |diffs| along the circle."""
    d = _circle_diffs(img)
    sum_sup = jnp.sum(jnp.where(d > th, d, 0), axis=0)
    sum_inf = jnp.sum(jnp.where(d < -th, -d, 0), axis=0)
    return jnp.maximum(sum_sup, sum_inf)


def fast9_score_at(img: Image2d, positions: jax.Array,
                   th: int) -> jax.Array:
    """(K,) FAST score sampled at integer ``positions`` (row, col, interior
    coords) — the per-keypoint form of ``fast9_score`` for the tracker's
    every-frame cull (video_extruder.hpp:87-91). 17 small gathers per call
    instead of a full-image score map; identical values at the sampled
    pixels. Needs border >= 3."""
    assert img.border >= 3
    b = img.border
    wb = img.data.shape[1]
    p = positions + b
    # ONE flattened gather for all 17 samples per keypoint — separate
    # 2-D gathers per circle offset are ~2x slower than the full-image
    # score map on TPU; a single linearised take is ~4x faster than it
    offs = jnp.asarray(np.array([(0, 0)] + CIRCLE, np.int32))   # (17, 2)
    flat = ((p[:, None, 0] + offs[None, :, 0]) * wb
            + (p[:, None, 1] + offs[None, :, 1]))               # (K, 17)
    smp = jnp.take(img.data.reshape(-1), flat.reshape(-1),
                   mode="clip").reshape(flat.shape).astype(jnp.int32)
    d = smp[:, 1:] - smp[:, :1]                                 # (K, 16)
    s_sup = jnp.sum(jnp.where(d > th, d, 0), axis=1)
    s_inf = jnp.sum(jnp.where(d < -th, -d, 0), axis=1)
    return jnp.maximum(s_sup, s_inf)


def fast9_score_image(img: Image2d, th: int,
                      mask: Optional[jax.Array] = None) -> Image2d:
    """uint8 score/16 image, non-zero only at detected keypoints — the
    reference's scores_img (fast.hpp:686-694). Optional occupancy ``mask``
    (H, W) zeroes out masked pixels, like the ``_mask`` option."""
    kp = fast9_detect(img, th)
    if mask is not None:
        kp = kp & (jnp.asarray(mask) != 0)
    s = jnp.where(kp, fast9_score(img, th) // 16, 0)
    return from_array(jnp.clip(s, 0, 255).astype(jnp.uint8), border=1)


def local_maxima_filter(scores: Image2d) -> Image2d:
    """Zero out non-(3x3 strict) maxima (fast.hpp:555-575)."""
    assert scores.border >= 1
    a = scores.interior
    is_max = jnp.ones(a.shape, bool)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            is_max = is_max & (a > scores.shifted(dr, dc))
    return from_array(jnp.where(is_max, a, 0), border=scores.border)


def blockwise_maxima_filter(scores: Image2d, block_size: int) -> Image2d:
    """Keep only the per-block argmax of the score image, zero elsewhere
    (fast.hpp:577-614 / 744-799). Ties break to the first (row-major)
    position like the reference's scan order."""
    a = scores.interior.astype(jnp.int32)
    h, w = a.shape
    bs = block_size
    nbr, nbc = -(-h // bs), -(-w // bs)
    padded = jnp.pad(a, [(0, nbr * bs - h), (0, nbc * bs - w)],
                     constant_values=-1)
    blocks = padded.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
    flat = blocks.reshape(nbr, nbc, bs * bs)
    idx = jnp.argmax(flat, axis=-1)
    vmax = jnp.max(flat, axis=-1)
    keep = jnp.zeros_like(flat)
    keep = keep.at[jnp.arange(nbr)[:, None], jnp.arange(nbc)[None, :],
                   idx].set(jnp.where(vmax > 0, vmax, 0))
    out = keep.reshape(nbr, nbc, bs, bs).transpose(0, 2, 1, 3)
    out = out.reshape(nbr * bs, nbc * bs)[:h, :w]
    return from_array(out.astype(scores.dtype), border=scores.border,
                      border_mode="zero")


def select_keypoints(scores: Image2d, k: int
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-K extraction of non-zero score pixels into static arrays.

    Returns (positions (K, 2) int32 row-major-stable, score (K,) int32,
    valid (K,) bool). Replaces the reference's dynamic std::vector<vint2>
    keypoint lists with a fixed budget.
    """
    a = scores.interior.astype(jnp.int32)
    h, w = a.shape
    flat = a.reshape(-1)
    # bias by reverse index so equal scores extract in row-major order
    # (score <= 255 and h*w <= ~8M keeps this within int32)
    key = flat * (h * w) + (h * w - 1 - jnp.arange(h * w, dtype=jnp.int32))
    topv, topi = jax.lax.top_k(jnp.where(flat > 0, key, -1), k)
    valid = topv >= 0
    pos = jnp.stack([topi // w, topi % w], axis=-1).astype(jnp.int32)
    score = jnp.where(valid, flat[topi], 0)
    return pos, score, valid


def _blockwise_keypoints(scores: Image2d, block_size: int, k: int
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused per-block argmax + top-K (fast.hpp:744-799 capability).

    Equivalent to blockwise_maxima_filter + select_keypoints but never
    scatters back to the full image: the per-block winners (<= nbr*nbc of
    them, one per ``block_size`` square) go straight into the top-K, which
    then runs over ~h*w/block_size² candidates instead of h*w pixels —
    the hot path of the tracker's periodic detection."""
    a = scores.interior.astype(jnp.int32)
    h, w = a.shape
    bs = block_size
    nbr, nbc = -(-h // bs), -(-w // bs)
    padded = jnp.pad(a, [(0, nbr * bs - h), (0, nbc * bs - w)],
                     constant_values=-1)
    blocks = padded.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
    flat = blocks.reshape(nbr, nbc, bs * bs)
    idx = jnp.argmax(flat, axis=-1)            # first max, row-major in block
    vmax = jnp.max(flat, axis=-1)
    pos_r = jnp.arange(nbr)[:, None] * bs + idx // bs
    pos_c = jnp.arange(nbc)[None, :] * bs + idx % bs
    cand_score = jnp.maximum(vmax, 0).reshape(-1)
    cand_pos = jnp.stack([pos_r, pos_c], axis=-1).reshape(-1, 2)
    nb = cand_score.shape[0]
    # bias by reverse block id so equal scores extract block-row-major
    key = cand_score * nb + (nb - 1 - jnp.arange(nb, dtype=jnp.int32))
    kk = min(k, nb)
    topv, topi = jax.lax.top_k(jnp.where(cand_score > 0, key, -1), kk)
    valid = topv >= 0
    pos = cand_pos[topi].astype(jnp.int32)
    score = jnp.where(valid, cand_score[topi], 0)
    if kk < k:
        pad = k - kk
        pos = jnp.concatenate([pos, jnp.zeros((pad, 2), jnp.int32)])
        score = jnp.concatenate([score, jnp.zeros((pad,), score.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return pos, score, valid


def fast9(img: Image2d, th: int, *, k: int = 512,
          local_maxima: bool = False, blockwise: bool = False,
          block_size: int = 10,
          mask: Optional[jax.Array] = None
          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Public entry (parity with fast9(), fast.hpp:930-955).

    Options mirror ``_local_maxima`` / ``_blockwise`` / ``_block_size`` /
    ``_mask``; ``k`` is the keypoint budget. Returns
    (positions (k,2) int32, scores (k,) int32, valid (k,) bool).
    """
    s = fast9_score_image(img, th, mask=mask)
    if local_maxima:
        s = local_maxima_filter(s)
    if blockwise:
        return _blockwise_keypoints(s, block_size, k)
    return select_keypoints(s, k)
