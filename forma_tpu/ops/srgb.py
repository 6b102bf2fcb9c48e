"""Device linear -> sRGB conversion and u8 packing.

Mirrors `painter/mod.rs:96-162`: polynomial sRGB approximation on RGB, linear
alpha, channel mapping, and round-half-to-even u8 quantisation (the 2^23
trick — `jnp.round` has identical ties-to-even semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Channel codes (buffer.Channel values).
RED, GREEN, BLUE, ALPHA, ZERO, ONE = range(6)


def linear_to_srgb(l):
    a = jnp.float32(0.201_017_72)
    b = jnp.float32(-0.512_801_47)
    c = jnp.float32(1.344_401)
    d = jnp.float32(-0.030_656_587)
    s = jnp.sqrt(jnp.maximum(l, 0.0))
    n = a * (l * s) + (b * l + (c * s + d))
    return jnp.where(l <= 0.003_130_8, l * 12.92, n)


def _to_u8(v):
    return jnp.round(jnp.clip(v * 255.0, 0.0, 255.0)).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("channels",))
def pack_srgb(linear, channels=(RED, GREEN, BLUE, ALPHA)):
    """linear f32 [H, W, 4] -> u8 [H, W, len(channels)]."""
    r = linear_to_srgb(linear[..., 0])
    g = linear_to_srgb(linear[..., 1])
    b = linear_to_srgb(linear[..., 2])
    a = linear[..., 3]
    out = []
    for ch in channels:
        if ch == RED:
            out.append(r)
        elif ch == GREEN:
            out.append(g)
        elif ch == BLUE:
            out.append(b)
        elif ch == ALPHA:
            out.append(a)
        elif ch == ZERO:
            out.append(jnp.zeros_like(r))
        else:
            out.append(jnp.ones_like(r))
    return jnp.stack([_to_u8(v) for v in out], axis=-1)
