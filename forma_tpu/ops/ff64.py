"""Float-float ("double-double" on f32) arithmetic.

TPUs have no native f64; the rasterizer's index estimation needs ~48 mantissa
bits (`forma/src/cpu/rasterizer.rs:44-47`).  The reference GPU backend solves
the same problem with an ff64 WGSL library (`rasterizer.wgsl:84-140`); this is
the JAX equivalent, usable inside jit and Pallas kernels.

`two_product` uses the Veltkamp/Dekker split rather than an FMA, because JAX
exposes no fused-multiply-add primitive; XLA does not contract float ops, so
the error-free transforms below hold exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FF(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def ff(val) -> FF:
    val = jnp.asarray(val, jnp.float32)
    return FF(val, jnp.zeros_like(val))


def _two_sum(x, y):
    r = x + y
    t = r - x
    e = (x - (r - t)) + (y - t)
    return r, e


def _two_sum_quick(x, y):
    r = x + y
    e = y - (r - x)
    return r, e


def _split(a):
    """Veltkamp split: a == hi + lo with hi, lo having <= 12 mantissa bits."""
    c = jnp.float32(4097.0) * a  # 2^12 + 1
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_product(x, y):
    r = x * y
    xh, xl = _split(x)
    yh, yl = _split(y)
    e = ((xh * yh - r) + xh * yl + xl * yh) + xl * yl
    return r, e


def add(x: FF, y: FF) -> FF:
    r, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return FF(*_two_sum_quick(r, e))


def sub(x: FF, y: FF) -> FF:
    r, e = _two_sum(x.hi, -y.hi)
    e = e + (x.lo - y.lo)
    return FF(*_two_sum_quick(r, e))


def mul(x: FF, y: FF) -> FF:
    r, e = _two_product(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return FF(*_two_sum_quick(r, e))


def div(x: FF, y: FF) -> FF:
    """Quotient as in `rasterizer.wgsl:119-129`."""
    r = x.hi / y.hi
    s_hi, s_lo = _two_product(r, y.hi)
    e = (((x.hi - s_hi) - s_lo) + x.lo - r * y.lo) / y.hi
    return FF(*_two_sum_quick(r, e))


def ceil(val: FF) -> jnp.ndarray:
    """Ceiling of the ff64 value as f32 (`rasterizer.wgsl:131-140`)."""
    ceil_hi = jnp.ceil(val.hi)
    ceil_lo = jnp.ceil(val.lo)
    return jnp.where(ceil_hi > val.hi, ceil_hi, ceil_hi + ceil_lo)
