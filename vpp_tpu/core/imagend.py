"""N-dimensional bordered image container (imageNd) + 3-D alias.

Capability parity with the reference's ``imageNd<V, N>`` / ``image3d<V>``
(/root/reference/vpp/core/imageNd.hh:42-168, image3d.hh, boxNd.hh;
tests/imageNd.cc, tests/image3d.cc): an N-d pixel buffer with an explicit
border, O(1) subimage views, neighbour shifts, and multilinear
interpolation (the reference declares ``linear_interpolate`` 2-D-only;
here it works for any N).

TPU-native design, like Image2d: one HBM-resident array of shape
``(D1+2b, ..., DN+2b[, C])``; the border is materialised padding; views
are static slices that XLA fuses; pitch/alignment is XLA's concern. The
reference's pointer/offset machinery (coords_to_offset, row tables) has
no analogue — arrays are indexed, not addressed.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class BoxNd:
    """Inclusive N-d box (reference boxNd.hh:11-74): p1/p2 both inside."""

    p1: Tuple[int, ...]
    p2: Tuple[int, ...]

    def __post_init__(self):
        assert len(self.p1) == len(self.p2)

    @property
    def ndim(self) -> int:
        return len(self.p1)

    def size(self, axis: int) -> int:
        return self.p2[axis] - self.p1[axis] + 1

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.size(i) for i in range(self.ndim))

    def has(self, p: Sequence[int]) -> bool:
        return all(self.p1[i] <= p[i] <= self.p2[i]
                   for i in range(self.ndim))

    def grow(self, border: int) -> "BoxNd":
        return BoxNd(tuple(a - border for a in self.p1),
                     tuple(a + border for a in self.p2))

    def shrink(self, border: int) -> "BoxNd":
        return self.grow(-border)


def make_box3d(nslices: int, nrows: int, ncols: int) -> BoxNd:
    """make_box3d (boxNd.hh:100-108)."""
    return BoxNd((0, 0, 0), (nslices - 1, nrows - 1, ncols - 1))


def make_boxNd(shape: Sequence[int]) -> BoxNd:
    return BoxNd((0,) * len(shape), tuple(s - 1 for s in shape))


@struct.dataclass
class ImageNd:
    """Immutable bordered N-d image (imageNd.hh:42-168).

    ``data`` has shape ``(*[d + 2*border], C?)``; ``nsdim`` says how many
    leading axes are spatial (the rest are channels)."""

    data: jax.Array
    border: int = struct.field(pytree_node=False, default=0)
    nsdim: int = struct.field(pytree_node=False, default=3)

    @property
    def shape(self) -> Tuple[int, ...]:
        b = 2 * self.border
        return tuple(self.data.shape[i] - b for i in range(self.nsdim))

    @property
    def dtype(self):
        return self.data.dtype

    def domain(self) -> BoxNd:
        return make_boxNd(self.shape)

    def domain_with_border(self) -> BoxNd:
        return self.domain().grow(self.border)

    @property
    def interior(self) -> jax.Array:
        b = self.border
        if b == 0:
            return self.data
        sl = tuple(slice(b, -b) for _ in range(self.nsdim))
        return self.data[sl]

    def with_interior(self, values: jax.Array) -> "ImageNd":
        b = self.border
        if b == 0:
            return ImageNd(data=jnp.asarray(values), border=0,
                           nsdim=self.nsdim)
        start = (b,) * self.nsdim + (0,) * (self.data.ndim - self.nsdim)
        new = jax.lax.dynamic_update_slice(
            self.data, values.astype(self.data.dtype), start)
        return ImageNd(data=new, border=b, nsdim=self.nsdim)

    def shifted(self, *offsets: int) -> jax.Array:
        """Interior-shaped static slice shifted into the border
        (relative_access for N-d; requires |offset| <= border)."""
        b = self.border
        assert len(offsets) == self.nsdim
        assert all(abs(o) <= b for o in offsets), (offsets, b)
        starts = tuple(b + o for o in offsets) + \
            (0,) * (self.data.ndim - self.nsdim)
        stops = tuple(b + o + s for o, s in zip(offsets, self.shape)) + \
            self.data.shape[self.nsdim:]
        return jax.lax.slice(self.data, starts, stops)

    def subimage(self, box: BoxNd) -> "ImageNd":
        """Zero-copy domain restriction (imageNd.hpp:323-362). Keeps the
        full parent border with the parent's real neighbouring content
        (see Image2d.subimage) — stencils on a subimage read what they
        would read on the parent."""
        b = self.border
        sl = tuple(slice(box.p1[i], box.p2[i] + 1 + 2 * b)
                   for i in range(self.nsdim))
        return ImageNd(data=self.data[sl], border=b, nsdim=self.nsdim)

    def __or__(self, box: BoxNd) -> "ImageNd":
        return self.subimage(box)

    def __call__(self, *p):
        """Border-aware read; negative coords reach into the border."""
        b = self.border
        idx = tuple(b + q for q in p)
        return self.data[idx]

    def linear_interpolate(self, pos: jax.Array) -> jax.Array:
        """Multilinear interpolation at float position(s).

        ``pos``: (..., nsdim) in interior coordinates. The reference
        implements this for 2-D only (imageNd.hpp:280-300); this is the
        N-d generalisation (2^N corner blend)."""
        b = self.border
        nd = self.nsdim
        p = jnp.asarray(pos, jnp.float32) + b
        lo = jnp.floor(p).astype(jnp.int32)
        frac = p - lo
        out = 0.0
        for corner in range(1 << nd):
            bits = [(corner >> i) & 1 for i in range(nd)]
            w = 1.0
            idx = []
            for i, bit in enumerate(bits):
                w = w * jnp.where(bit, frac[..., i], 1.0 - frac[..., i])
                idx.append(jnp.clip(lo[..., i] + bit, 0,
                                    self.data.shape[i] - 1))
            val = self.data[tuple(idx)]
            extra = val.ndim - w.ndim
            out = out + val * w.reshape(w.shape + (1,) * extra)
        return out

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.interior)

    def astype(self, dtype) -> "ImageNd":
        return ImageNd(data=self.data.astype(dtype), border=self.border,
                       nsdim=self.nsdim)


def imagend(shape: Sequence[int], *, dtype=jnp.float32, border: int = 0,
            channels: int = 0) -> ImageNd:
    """Allocate a zero N-d image (imageNd ctor, imageNd.hpp:38-52)."""
    full = tuple(s + 2 * border for s in shape)
    if channels:
        full = full + (channels,)
    return ImageNd(data=jnp.zeros(full, dtype=dtype), border=border,
                   nsdim=len(shape))


def image3d(nslices: int, nrows: int, ncols: int, *, dtype=jnp.float32,
            border: int = 0, channels: int = 0) -> ImageNd:
    """3-D image (reference image3d.hh; tests/image3d.cc)."""
    return imagend((nslices, nrows, ncols), dtype=dtype, border=border,
                   channels=channels)


def from_array_nd(arr, *, nsdim: int | None = None, border: int = 0,
                  border_mode: str = "zero") -> ImageNd:
    """Wrap an array, materialising border padding on the spatial axes."""
    arr = jnp.asarray(arr)
    if nsdim is None:
        nsdim = arr.ndim
    if border == 0:
        return ImageNd(data=arr, border=0, nsdim=nsdim)
    pad = [(border, border)] * nsdim + [(0, 0)] * (arr.ndim - nsdim)
    mode = {"zero": "constant", "mirror": "symmetric",
            "closest": "edge"}[border_mode]
    return ImageNd(data=jnp.pad(arr, pad, mode=mode), border=border,
                   nsdim=nsdim)
