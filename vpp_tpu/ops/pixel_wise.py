"""``pixel_wise`` / ``block_wise`` / ``row_wise`` — the loop constructs.

Capability parity with the reference's parallel runtime
(/root/reference/vpp/core/pixel_wise.hh:38-50, pixel_wise.hpp:84-213,
block_wise.hh:26-78, relative_accessor.hh:17-33).

TPU-native stance: the reference forks OpenMP threads over rows and relies on
compiler auto-vectorisation of the column loop. Here the kernel is written in
elementwise ``jnp`` over *whole interior arrays*; XLA fuses every shifted-view
neighbour read, arithmetic op, and select into one tiled VPU loop — the
hand-scheduled row/column structure is the compiler's job. Neighbour access
(the reference's ``relative_access``) is a static slice of the pre-padded
buffer (see Image2d.shifted), which XLA folds into the fusion: zero extra HBM
traffic, identical to the reference's row-pointer trick but lane-parallel.

Directional sequential traversals (``_left_to_right`` etc., used for
recurrences) live in ``vpp_tpu.ops.scan`` as explicit scans — on TPU a
sequential sweep is a ``lax.scan``, not a loop-order flag.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.box import Box2d
from ..core.image import Image2d, from_array


class RelAccess:
    """Stencil accessor: ``nbh(dr, dc)`` → interior-shaped shifted array.

    Parity with relative_access (pixel_wise.hpp:13-25,
    relative_accessor.hh:26-33). Offsets must be static Python ints within
    the image border.
    """

    def __init__(self, img: Image2d):
        self.img = img

    def __call__(self, dr: int, dc: int) -> jax.Array:
        return self.img.shifted(dr, dc)

    @property
    def center(self) -> jax.Array:
        return self.img.interior


def relative_access(img: Image2d) -> RelAccess:
    return RelAccess(img)


class Coords:
    """Coordinate range: ``p[0]``/``p[1]`` are full (H, W) index arrays.

    Plays the role of passing a ``box2d`` range to pixel_wise (the kernel
    receives the current point, pixel_wise.hpp:44-48).
    """

    def __init__(self, box: Box2d):
        self.box = box
        h, w = box.shape
        self._r = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + box.r1)
        self._c = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + box.c1)

    def __getitem__(self, i: int) -> jax.Array:
        return self._r if i == 0 else self._c

    @property
    def rows(self) -> jax.Array:
        return self._r

    @property
    def cols(self) -> jax.Array:
        return self._c


def _range_shape(rng) -> Tuple[int, int] | None:
    if isinstance(rng, Image2d):
        return rng.shape
    if isinstance(rng, RelAccess):
        return rng.img.shape
    if isinstance(rng, Box2d):
        return rng.shape
    if isinstance(rng, jax.Array) or hasattr(rng, "shape"):
        return tuple(rng.shape[:2])
    return None


def _range_value(rng):
    if isinstance(rng, Image2d):
        return rng.interior
    if isinstance(rng, RelAccess):
        return rng
    if isinstance(rng, Box2d):
        return Coords(rng)
    return rng


class _PixelWise:
    def __init__(self, ranges: Sequence[Any], out_border: int = 0):
        self.ranges = ranges
        self.out_border = out_border
        shapes = [s for s in map(_range_shape, ranges) if s is not None]
        assert shapes, "pixel_wise needs at least one shaped range"
        # First range defines the iteration domain (pixel_wise.hpp:149-152).
        self.domain_shape = shapes[0]

    def __call__(self, **opts) -> "_PixelWise":
        # Named options (the reference's iod sio); currently geometry only.
        return _PixelWise(self.ranges,
                          out_border=opts.get("out_border", self.out_border))

    def __or__(self, fn: Callable):
        return self.apply(fn)

    def apply(self, fn: Callable):
        """Run the kernel over the domain; return Image2d(s) if it yields
        values, else None (pure side-effect kernels don't exist here —
        a void kernel in the reference mutates; we return the result)."""
        args = [_range_value(r) for r in self.ranges]
        out = fn(*args)
        if out is None:
            return None
        return jax.tree_util.tree_map(
            lambda a: from_array(a, border=self.out_border), out,
            is_leaf=lambda x: isinstance(x, jax.Array))


def pixel_wise(*ranges, out_border: int = 0) -> _PixelWise:
    """``pixel_wise(A, relative_access(B), box) | kernel``.

    The kernel receives, per range: interior array (Image2d), RelAccess
    (relative_access), Coords (Box2d), or the raw array. It computes with
    ordinary jnp ops (elementwise semantics == per-pixel kernel) and returns
    the output array(s); result is wrapped as Image2d with ``out_border``.
    """
    return _PixelWise(ranges, out_border=out_border)


# ---------------------------------------------------------------------------
# block_wise / row_wise (block_wise.hh:26-78)
# ---------------------------------------------------------------------------

def block_wise(block_size: Tuple[int, int], *imgs: Image2d):
    """``block_wise((bh, bw), imgs...) | fn`` — fn maps each (bh, bw[,C])
    block of every image; blocks on the right/bottom edge are padded to full
    size (the reference passes ragged subimages; static shapes require
    padding — kernels see a `valid` mask as their last argument).

    fn(*blocks, valid) -> block-shaped array(s) or per-block scalar(s).
    Returns reassembled Image2d (block-shaped output) or (nbr, nbc) array
    (scalar output).
    """
    bh, bw = block_size
    h, w = imgs[0].shape

    def runner(fn):
        nbr = -(-h // bh)
        nbc = -(-w // bw)
        blocks = []
        for im in imgs:
            a = im.interior
            pad = [(0, nbr * bh - h), (0, nbc * bw - w)] + \
                  [(0, 0)] * (a.ndim - 2)
            a = jnp.pad(a, pad)
            a = a.reshape((nbr, bh, nbc, bw) + a.shape[2:])
            a = jnp.moveaxis(a, 2, 1)  # (nbr, nbc, bh, bw, ...)
            blocks.append(a.reshape((nbr * nbc, bh, bw) + a.shape[4:]))
        rr = jax.lax.broadcasted_iota(jnp.int32, (nbr * nbc, bh, bw), 1) + \
            (jax.lax.broadcasted_iota(
                jnp.int32, (nbr * nbc, bh, bw), 0) // nbc) * bh
        cc = jax.lax.broadcasted_iota(jnp.int32, (nbr * nbc, bh, bw), 2) + \
            (jax.lax.broadcasted_iota(
                jnp.int32, (nbr * nbc, bh, bw), 0) % nbc) * bw
        valid = (rr < h) & (cc < w)
        out = jax.vmap(fn)(*blocks, valid)

        def reassemble(o):
            if o.ndim >= 3 and o.shape[1] == bh and o.shape[2] == bw:
                o = o.reshape((nbr, nbc, bh, bw) + o.shape[3:])
                o = jnp.moveaxis(o, 1, 2)
                o = o.reshape((nbr * bh, nbc * bw) + o.shape[4:])
                return from_array(o[:h, :w])
            return o.reshape((nbr, nbc) + o.shape[1:])

        return jax.tree_util.tree_map(
            reassemble, out, is_leaf=lambda x: isinstance(x, jax.Array))

    return _Runner(runner)


def row_wise(*imgs: Image2d):
    """``row_wise(imgs...) | fn`` — fn is vmapped over rows
    (block_wise.hh:70-78). fn(*rows) -> row array(s) or per-row scalar."""

    def runner(fn):
        rows = [im.interior for im in imgs]
        out = jax.vmap(fn)(*rows)

        def wrap(o):
            if o.ndim >= 2 and o.shape[:2] == rows[0].shape[:2]:
                return from_array(o)
            return o

        return jax.tree_util.tree_map(
            wrap, out, is_leaf=lambda x: isinstance(x, jax.Array))

    return _Runner(runner)


class _Runner:
    def __init__(self, runner):
        self._runner = runner

    def __or__(self, fn):
        return self._runner(fn)

    def apply(self, fn):
        return self._runner(fn)
