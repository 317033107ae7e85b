"""Image expression language — LIIE parity (reference liie.hh:14-374).

The reference embeds an expression DSL (placeholders ``_1``/``_2``, ``_v(A)``
value-of, ``_if_(c)(t)(e)``, global reductions) on top of iod expression
templates and lowers it to pixel_wise. The original is bit-rotted
(tests/CMakeLists.txt:77-78 disables it); we provide the *capability* —
compose image expressions symbolically, evaluate them in one fused pass.

Here the AST is a tiny Python operator-overloading tree; ``evaluate`` maps it
onto jnp ops so XLA fuses the whole expression into a single kernel — which
is exactly what LIIE's metaprogramming worked so hard to achieve.
"""

from __future__ import annotations

import operator
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.image import Image2d, from_array


class Expr:
    def _bin(self, other, op):
        return _BinOp(self, _wrap(other), op)

    def _rbin(self, other, op):
        return _BinOp(_wrap(other), self, op)

    def __add__(self, o): return self._bin(o, operator.add)
    def __radd__(self, o): return self._rbin(o, operator.add)
    def __sub__(self, o): return self._bin(o, operator.sub)
    def __rsub__(self, o): return self._rbin(o, operator.sub)
    def __mul__(self, o): return self._bin(o, operator.mul)
    def __rmul__(self, o): return self._rbin(o, operator.mul)
    def __truediv__(self, o): return self._bin(o, operator.truediv)
    def __rtruediv__(self, o): return self._rbin(o, operator.truediv)
    def __lt__(self, o): return self._bin(o, operator.lt)
    def __le__(self, o): return self._bin(o, operator.le)
    def __gt__(self, o): return self._bin(o, operator.gt)
    def __ge__(self, o): return self._bin(o, operator.ge)
    def __neg__(self): return _UnOp(self, operator.neg)

    def eq(self, o): return self._bin(o, operator.eq)
    def ne(self, o): return self._bin(o, operator.ne)

    def evaluate(self, *imgs):
        raise NotImplementedError


def _wrap(x) -> "Expr":
    if isinstance(x, Expr):
        return x
    if isinstance(x, Image2d):
        return V(x)
    return _Const(x)


class _Const(Expr):
    def __init__(self, v):
        self.v = v

    def _eval(self, env):
        return self.v


class Placeholder(Expr):
    """``_1``, ``_2`` … — bound positionally by evaluate (liie.hh:31-45)."""

    def __init__(self, idx: int):
        self.idx = idx

    def _eval(self, env):
        return env[self.idx]


class V(Expr):
    """``_v(img)`` — value of a captured image (liie.hh:47-60)."""

    def __init__(self, img: Image2d):
        self.img = img

    def _eval(self, env):
        return self.img.interior


class _BinOp(Expr):
    def __init__(self, a, b, op):
        self.a, self.b, self.op = a, b, op

    def _eval(self, env):
        return self.op(self.a._eval(env), self.b._eval(env))


class _UnOp(Expr):
    def __init__(self, a, op):
        self.a, self.op = a, op

    def _eval(self, env):
        return self.op(self.a._eval(env))


class _If(Expr):
    """``if_(cond)(then)(else)`` — LIIE's _if_ (liie.hh:62-76)."""

    def __init__(self, cond, then_=None, else_=None):
        self.cond, self.then_, self.else_ = cond, then_, else_

    def __call__(self, x):
        if self.then_ is None:
            return _If(self.cond, _wrap(x), None)
        return _If(self.cond, self.then_, _wrap(x))

    def _eval(self, env):
        return jnp.where(self.cond._eval(env), self.then_._eval(env),
                         self.else_._eval(env))


def if_(cond) -> _If:
    return _If(_wrap(cond))


class _Reduction(Expr):
    def __init__(self, inner: Expr, kind: str):
        self.inner, self.kind = inner, kind

    def _eval(self, env):
        v = self.inner._eval(env)
        if self.kind == "sum":
            return jnp.sum(v)
        if self.kind == "min":
            return jnp.min(v)
        if self.kind == "max":
            return jnp.max(v)
        if self.kind == "avg":
            return jnp.mean(v.astype(jnp.float32))
        w = v.shape[1]
        idx = jnp.argmin(v.reshape(-1)) if self.kind == "argmin" \
            else jnp.argmax(v.reshape(-1))
        return jnp.stack([idx // w, idx % w]).astype(jnp.int32)


def sum_of(e): return _Reduction(_wrap(e), "sum")
def min_of(e): return _Reduction(_wrap(e), "min")
def max_of(e): return _Reduction(_wrap(e), "max")
def avg_of(e): return _Reduction(_wrap(e), "avg")
def argmin_of(e): return _Reduction(_wrap(e), "argmin")
def argmax_of(e): return _Reduction(_wrap(e), "argmax")


# Positional placeholders, LIIE's _1.._4.
P1, P2, P3, P4 = Placeholder(0), Placeholder(1), Placeholder(2), \
    Placeholder(3)


def evaluate(expr: Expr, *imgs):
    """``eval()`` (liie.hh:327-374): bind placeholders to images, run the
    fused expression. Image-shaped results come back as Image2d; reductions
    as scalars / coord pairs."""
    env = [i.interior if isinstance(i, Image2d) else jnp.asarray(i)
           for i in imgs]
    root = _wrap(expr)

    def first_shape(e):
        if isinstance(e, V):
            return e.img.shape
        for child in ("a", "b", "cond", "then_", "else_", "inner"):
            sub = getattr(e, child, None)
            if isinstance(sub, Expr):
                s = first_shape(sub)
                if s is not None:
                    return s
        return None

    ref_shape = env[0].shape[:2] if env else first_shape(root)
    out = root._eval(env)
    if ref_shape is not None and hasattr(out, "ndim") and out.ndim >= 2 \
            and out.shape[:2] == tuple(ref_shape):
        return from_array(out)
    return out
