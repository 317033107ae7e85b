"""Gaussian image pyramids (reference /root/reference/vpp/core/pyramid.hh).

Semantics parity:

* ``antialiasing_lowpass_filter`` — separable binomial 1-4-6-4-1 / 16, columns
  then rows, mirror border between passes (pyramid.hh:12-59). Integer pixel
  types accumulate in a wider type and use integer division, floats stay
  float.
* ``subsample2`` — stride-2 decimation at even coordinates (pyramid.hh:61-81).
* level i+1 extent = ``1 + extent_i // factor`` (pyramid.hh:136-158) — the
  trailing sample reads one pixel into the mirror border, as in the
  reference.
* ``Pyramid`` — levels are a tuple of bordered Image2d; ``update`` = copy
  level 0 + propagate (pyramid.hh:169-198).

TPU-native: each pass is one fused XLA op over the whole level (shifted-view
stencil); no Pallas needed — the op is trivially bandwidth-bound and XLA
already emits a single tiled VPU loop. The whole pyramid build jits into one
program; levels are static shapes so it compiles once per geometry.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.border import fill_border_mirror
from ..core.image import Image2d, from_array

_BINOMIAL = (1.0, 4.0, 6.0, 4.0, 1.0)


def _lowpass_1d(padded: jax.Array, axis: int, h: int, w: int,
                offset: int, integer: bool) -> jax.Array:
    """5-tap binomial along ``axis`` of a border-padded array, returning the
    interior extent. ``offset`` is the border width."""
    taps = []
    trailing_start = (0,) * (padded.ndim - 2)
    trailing_stop = padded.shape[2:]
    for k, coef in enumerate(_BINOMIAL):
        d = k - 2
        if axis == 1:
            sl = jax.lax.slice(padded, (offset, offset + d) + trailing_start,
                               (offset + h, offset + d + w) + trailing_stop)
        else:
            sl = jax.lax.slice(padded, (offset + d, offset) + trailing_start,
                               (offset + d + h, offset + w) + trailing_stop)
        taps.append((sl.astype(jnp.int32) if integer
                     else sl.astype(jnp.float32)) * (int(coef) if integer
                                                     else coef))
    s = taps[0] + taps[1] + taps[2] + taps[3] + taps[4]
    return s // 16 if integer else s / 16


def antialiasing_lowpass_filter(img: Image2d) -> Image2d:
    """Separable 1-4-6-4-1/16 blur; needs border >= 2 (pyramid.hh:12-59)."""
    assert img.border >= 2, "lowpass filter needs border >= 2"
    h, w = img.shape
    b = img.border
    integer = jnp.issubdtype(img.dtype, jnp.integer)
    # Horizontal pass over the interior...
    tmp = _lowpass_1d(img.data, 1, h, w, b, integer)
    # ...mirror its border (fill_border_mirror(tmp), pyramid.hh:36) ...
    tmp_img = fill_border_mirror(
        Image2d(data=jnp.pad(tmp.astype(img.dtype) if integer else tmp,
                             [(b, b), (b, b)] + [(0, 0)] * (tmp.ndim - 2)),
                border=b))
    # ...then the vertical pass.
    out = _lowpass_1d(tmp_img.data, 0, h, w, b, integer)
    out = out.astype(img.dtype)
    return fill_border_mirror(from_array(out, border=b))


def subsample2(img: Image2d, out_shape: Tuple[int, int] | None = None,
               out_border: int = 0) -> Image2d:
    """Stride-2 decimation (pyramid.hh:61-81). ``out_shape`` defaults to the
    reference's ``(1 + h//2, 1 + w//2)``; samples past the edge read the
    mirror border (requires border >= 1 when out extent exceeds h//2)."""
    h, w = img.shape
    if out_shape is None:
        out_shape = (1 + h // 2, 1 + w // 2)
    oh, ow = out_shape
    b = img.border
    need = max(2 * (oh - 1) - (h - 1), 2 * (ow - 1) - (w - 1), 0)
    assert b >= need, f"subsample2 reads {need} past edge; border={b}"
    data = img.data[b:b + 2 * oh:2, b:b + 2 * ow:2]
    return from_array(data, border=out_border, border_mode="mirror"
                      if out_border else "zero")


def subsample(img: Image2d, out_shape: Tuple[int, int], factor: float,
              out_border: int = 0) -> Image2d:
    """Fractional nearest subsample (pyramid.hh:85-104): out(r,c) =
    in(int(r*factor), int(c*factor))."""
    oh, ow = out_shape
    rr = jnp.minimum((jnp.arange(oh) * factor).astype(jnp.int32),
                     img.shape[0] - 1 + img.border)
    cc = jnp.minimum((jnp.arange(ow) * factor).astype(jnp.int32),
                     img.shape[1] - 1 + img.border)
    b = img.border
    data = img.data[b + rr[:, None], b + cc[None, :]]
    return from_array(data, border=out_border, border_mode="mirror"
                      if out_border else "zero")


def antialias_subsample2(img: Image2d) -> Image2d:
    """Filter + decimate (pyramid.hh:107-124)."""
    src = img if img.border >= 2 else fill_border_mirror(
        from_array(img.interior, border=2, border_mode="mirror"))
    lp = antialiasing_lowpass_filter(src)
    return subsample2(lp, out_border=max(img.border, 1))


def level_shapes(shape: Tuple[int, int], nlevels: int,
                 factor: float = 2.0) -> Tuple[Tuple[int, int], ...]:
    """Static level geometry chain (pyramid.hh:136-158)."""
    shapes = [tuple(shape)]
    for _ in range(nlevels - 1):
        h, w = shapes[-1]
        shapes.append((1 + int(h / factor), 1 + int(w / factor)))
    return tuple(shapes)


@struct.dataclass
class Pyramid:
    """Tuple-of-levels pyramid (pyramid.hh:125-215). ``factor`` static."""

    levels: Tuple[Image2d, ...]
    factor: float = struct.field(pytree_node=False, default=2.0)

    def __getitem__(self, i: int) -> Image2d:
        return self.levels[i]

    def __len__(self) -> int:
        return len(self.levels)

    @property
    def size(self) -> int:
        return len(self.levels)


_DECIM_CACHE: dict = {}


def _decim_matrix(n: int, on: int) -> "np.ndarray":
    """(on, n) banded decimating-binomial matrix: row i holds the
    1-4-6-4-1/16 taps at source rows 2i-2..2i+2, mirror-reflected at the
    edges (symmetric boundary). Dense on purpose: on this TPU a
    (on, n) @ (n, m) matmul rides the MXU for ~free at image sizes, while
    strided slicing (``x[::2]``) measured ~0.8 ms per VGA frame and a
    1-channel strided conv ~0.6 ms — the decimation IS the matmul."""
    import numpy as np
    key = (n, on)
    if key not in _DECIM_CACHE:
        A = np.zeros((on, n), np.float32)
        for i in range(on):
            for t, kv in enumerate(_BINOMIAL):
                src = 2 * i + t - 2
                if src < 0:
                    src = -src - 1
                if src >= n:
                    src = 2 * n - src - 1
                A[i, src] += kv / 16.0
        _DECIM_CACHE[key] = A
    return _DECIM_CACHE[key]


def _binomial_decimate(interior: jax.Array, oh: int, ow: int) -> jax.Array:
    """Fused filter+decimate for float levels: separable 1-4-6-4-1/16 with
    stride 2 expressed as two banded matmuls (A @ x @ Bᵀ). Equivalent to
    antialiasing_lowpass_filter + subsample2 except on the outermost 2-px
    rim, where the reference mirrors the *filtered* values between passes
    while this mirrors the *input* (documented deviation; the pyramid is a
    smoothing chain, the rim difference is sub-quantisation)."""
    h, w = interior.shape
    A = jnp.asarray(_decim_matrix(h, oh))
    B = jnp.asarray(_decim_matrix(w, ow))
    t = jax.lax.dot(A, interior.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.dot(t, B.T, precision=jax.lax.Precision.HIGHEST)
    return out.astype(interior.dtype)


def pyramid(img: Image2d, nlevels: int, factor: float = 2.0,
            border: int = 3) -> Pyramid:
    """Build an ``nlevels`` pyramid from level-0 content (pyramid.hh:146-157,
    update → propagate_level0). Level 0 gets ``border`` mirror-filled.

    Float dtype + factor 2 takes a fused fast path (one strided binomial
    conv + one symmetric pad per level); other dtypes/factors use the
    reference-shaped filter/subsample chain."""
    shapes = level_shapes(img.shape, nlevels, factor)
    b = max(border, 3)
    if (factor == 2.0 and jnp.issubdtype(img.dtype, jnp.floating)
            and img.interior.ndim == 2):
        pad = [(b, b), (b, b)] + [(0, 0)] * (img.interior.ndim - 2)
        levels = [Image2d(data=jnp.pad(img.interior, pad, mode="symmetric"),
                          border=b)]
        cur = img.interior
        for i in range(1, nlevels):
            cur = _binomial_decimate(cur, *shapes[i])
            levels.append(Image2d(data=jnp.pad(cur, pad, mode="symmetric"),
                                  border=b))
        return Pyramid(levels=tuple(levels), factor=factor)
    lvl0 = fill_border_mirror(
        from_array(img.interior, border=b, border_mode="mirror"))
    levels = [lvl0]
    for i in range(1, nlevels):
        prev = levels[-1]
        lp = antialiasing_lowpass_filter(prev)
        if factor == 2.0:
            nxt = subsample2(lp, shapes[i], out_border=b)
        else:
            nxt = subsample(lp, shapes[i], factor, out_border=b)
        levels.append(fill_border_mirror(nxt))
    return Pyramid(levels=tuple(levels), factor=factor)


def pyramid_update(pyr: Pyramid, img: Image2d) -> Pyramid:
    """Functional ``update`` (pyramid.hh:192-196): same geometry, new data."""
    return pyramid(img, len(pyr.levels), pyr.factor,
                   border=pyr.levels[0].border)
