"""Global image reductions (reference sum.hh:12-20, liie.hh:209-301).

The reference lowers each reduction to a serial pixel_wise scan; on TPU they
are single fused tree-reductions. ``argmin``/``argmax`` return the (row, col)
of the extremum like LIIE's ``_argmin/_argmax``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.image import Image2d


def _arr(img):
    return img.interior if isinstance(img, Image2d) else jnp.asarray(img)


def sum_(img, dtype=None) -> jax.Array:
    a = _arr(img)
    # plus_promotion semantics (vector.hh:36-50): accumulate wider than V.
    if dtype is None and jnp.issubdtype(a.dtype, jnp.integer):
        dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    return jnp.sum(a, dtype=dtype)


def min_(img) -> jax.Array:
    return jnp.min(_arr(img))


def max_(img) -> jax.Array:
    return jnp.max(_arr(img))


def avg(img) -> jax.Array:
    return jnp.mean(_arr(img).astype(jnp.float32))


def _arg(img, reducer):
    a = _arr(img)
    flat = a.reshape(a.shape[0] * a.shape[1], -1).sum(axis=-1) \
        if a.ndim == 3 else a.reshape(-1)
    idx = reducer(flat)
    w = a.shape[1]
    return jnp.stack([idx // w, idx % w]).astype(jnp.int32)


def argmin(img) -> jax.Array:
    """(row, col) of the minimum (liie.hh _argmin)."""
    return _arg(img, jnp.argmin)


def argmax(img) -> jax.Array:
    return _arg(img, jnp.argmax)
