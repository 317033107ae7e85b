"""Sampling: bilinear interpolation and batched patch extraction.

Parity: ``imageNd::linear_interpolate`` (reference imageNd.hpp:280-300) and
``patch.hh:31-79`` (extract_patches / extract_patch).

TPU-native: everything is *batched* — a (N,2) array of sample points in, a
(N,...) array of values out, built from gathers / vmapped dynamic slices so
keypoint-parallel loops (reference pyrlk_match.hh:24, OMP for) become one
fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import Image2d


def bilinear(data: jax.Array, pts: jax.Array) -> jax.Array:
    """Bilinear sample of an (H, W[, C]) array at (N, 2) float (row, col).

    Matches linear_interpolate (imageNd.hpp:280-300): weights from the
    fractional parts of the coordinate; reads clamped to the buffer so
    out-of-range points return edge values instead of faulting.
    """
    h, w = data.shape[0], data.shape[1]
    r = pts[..., 0]
    c = pts[..., 1]
    r0 = jnp.floor(r)
    c0 = jnp.floor(c)
    fr = (r - r0)[..., None] if data.ndim == 3 else (r - r0)
    fc = (c - c0)[..., None] if data.ndim == 3 else (c - c0)
    r0 = jnp.clip(r0.astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(c0.astype(jnp.int32), 0, w - 1)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    v00 = data[r0, c0]
    v01 = data[r0, c1]
    v10 = data[r1, c0]
    v11 = data[r1, c1]
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr) + bot * fr


def bilinear_image(img: Image2d, pts: jax.Array) -> jax.Array:
    """Bilinear sample in *interior* coordinates; border reads are valid."""
    b = img.border
    return bilinear(img.data, pts + b)


def nearest(data: jax.Array, pts: jax.Array) -> jax.Array:
    """Nearest-neighbour sample at float (row, col) points, clamped."""
    h, w = data.shape[0], data.shape[1]
    r = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, w - 1)
    return data[r, c]


def extract_patches_at_tl(data: jax.Array, tl: jax.Array,
                          size: int) -> jax.Array:
    """(N, size, size[, C]) patches with given (N, 2) int top-lefts
    (already clamped into the buffer).

    TPU formulation: one-hot selector MATMULS instead of vmapped
    dynamic-slice gathers — rows via (N·size, H) @ (H, W·C), columns via
    a batched (N, size, W) x (N, W, size) einsum. With
    ``Precision.HIGHEST`` the contraction is EXACT (each selector row
    has a single 1.0, so no accumulation and no bf16 operand rounding),
    and ~8x faster than the gather on v5e (0.19 vs 1.5 ms per 1024
    13x13 patches from a VGA buffer — gathers serialise on the scalar
    unit, one-hot matmuls ride the MXU). Non-float dtypes fall back to
    the gather."""
    if not jnp.issubdtype(data.dtype, jnp.floating):
        def one(p):
            start = (p[0], p[1]) + (0,) * (data.ndim - 2)
            return jax.lax.dynamic_slice(
                data, start, (size, size) + data.shape[2:])
        return jax.vmap(one)(tl.astype(jnp.int32))
    h, w = data.shape[0], data.shape[1]
    n = tl.shape[0]
    hi = jax.lax.Precision.HIGHEST
    ridx = tl[:, 0:1] + jnp.arange(size, dtype=tl.dtype)[None]  # (N, S)
    rsel = (ridx.reshape(-1)[:, None]
            == jnp.arange(h, dtype=tl.dtype)[None]).astype(data.dtype)
    rows = jax.lax.dot(rsel, data.reshape(h, -1),
                       precision=hi).reshape((n, size, w)
                                             + data.shape[2:])
    cidx = tl[:, 1:2] + jnp.arange(size, dtype=tl.dtype)[None]  # (N, S)
    csel = (cidx[:, None, :]
            == jnp.arange(w, dtype=tl.dtype)[None, :, None]
            ).astype(data.dtype)                                # (N, W, S)
    if data.ndim == 2:
        return jnp.einsum("nsw,nwc->nsc", rows, csel, precision=hi)
    return jnp.einsum("nswk,nwc->nsck", rows, csel, precision=hi)


def extract_patches(data: jax.Array, centers: jax.Array,
                    size: int) -> jax.Array:
    """Integer-aligned (size × size) patches around (N, 2) int centers.

    Parity with extract_patch / extract_patches (patch.hh:31-79). Centers are
    clamped so every patch lies inside the buffer — the caller guarantees a
    border ≥ size//2 like the reference does.
    Returns (N, size, size[, C]).
    """
    h, w = data.shape[0], data.shape[1]
    half = size // 2
    tl = jnp.stack([centers[:, 0] - half, centers[:, 1] - half], axis=-1)
    tl = jnp.clip(tl, 0, jnp.array([h - size, w - size]))
    return extract_patches_at_tl(data, tl.astype(jnp.int32), size)


def extract_patches_bilinear(data: jax.Array, centers: jax.Array,
                             size: int) -> jax.Array:
    """(size × size) patches at fractional (N, 2) float centers.

    Each pixel is bilinearly sampled — the building block for LK / SAD
    matching at sub-pixel positions (lk.hh:53-72 samples gradients this way).
    Returns (N, size, size[, C]).
    """
    half = (size - 1) / 2.0
    offs = jnp.arange(size, dtype=centers.dtype) - half
    dr, dc = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([dr, dc], axis=-1)  # (size, size, 2)
    pts = centers[:, None, None, :] + grid[None]  # (N, size, size, 2)
    return bilinear(data, pts)
