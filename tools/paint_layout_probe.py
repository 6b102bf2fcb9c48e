"""Probe: wave-fold carry layout — [T, 16, 16] vs [T, 256].

The paint wave fold carries the framebuffer as four [p, TH, TW] f32 arrays.
On TPU the minor dim (16) pads to the 128-lane register width, so every
loop-carry round trip may move 8x the useful bytes.  The tree fold already
avoids this ([T, 256] minor = two full lane groups); the WAVE fold — the
shipping backend — never got the same treatment.

This probe runs a faithful model of step_wave (grid row gather + unpack +
exclusive x-prefix + coverage + over-blend into a 4-channel carry) for D
sequential steps at first-wave scale, in both layouts.  The [T, 256]
variant does the in-row prefix with log2(16) masked lane rolls (the trick
the tree fold uses).

Usage: python tools/paint_layout_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

T = 8192  # first-wave tile prefix at 1080p (120x68 = 8160)
D = 40  # sequential fold steps
RUN_CAP = 1 << 18
PDW = 32  # PIXEL_DOUBLE_WIDTH
PDA = 512  # PIXEL_DOUBLE_AREA


def bench(name, fn, *args, iters=3, warmup=1):
    f = jax.jit(fn)
    t0 = time.time()
    jax.device_get(f(*args))
    compile_s = time.time() - t0
    for _ in range(warmup):
        jax.device_get(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.device_get(f(*args))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name:48s} {best * 1e3:9.3f} ms  ({best * 1e3 / D:6.3f} ms/step, compile {compile_s:.1f}s)", flush=True)
    return best


def coverage(da):
    recip = jnp.float32(1.0 / PDA)
    return jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)


def fold_16x16(grid, table, carry, fills):
    dst = tuple(jnp.zeros((T, 16, 16), jnp.float32) for _ in range(4))

    def step(k, dst):
        u = jax.lax.dynamic_index_in_dim(table, k, axis=0, keepdims=False)
        g = grid[u]  # [T, 256] i32
        cover = (g << 16) >> 16
        area = (g - cover) >> 16
        area = area.reshape(T, 16, 16)
        cover = cover.reshape(T, 16, 16)
        exc = jnp.cumsum(cover, axis=2) - cover
        acc = carry[u][:, :, None] + exc
        da = PDW * acc + area
        cov = coverage(da)
        f = fills[u]  # [T, 4]
        src_a = f[:, 3][:, None, None] * cov
        inv = 1.0 - src_a
        return tuple(
            dst[ch] * inv + f[:, ch][:, None, None] * src_a for ch in range(4)
        )

    dst = jax.lax.fori_loop(0, D, step, dst)
    return sum(d.sum() for d in dst)


def fold_256(grid, table, carry, fills):
    dst = tuple(jnp.zeros((T, 256), jnp.float32) for _ in range(4))
    lane16 = jnp.arange(256, dtype=jnp.int32) % 16

    def step(k, dst):
        u = jax.lax.dynamic_index_in_dim(table, k, axis=0, keepdims=False)
        g = grid[u]  # [T, 256] i32
        cover = (g << 16) >> 16
        area = (g - cover) >> 16
        acc = cover
        for s in (1, 2, 4, 8):
            acc = acc + jnp.where(lane16 >= s, jnp.roll(acc, s, axis=-1), 0)
        exc = acc - cover
        cr = jnp.repeat(carry[u], 16, axis=-1)  # [T, 256] row carry
        da = PDW * (cr + exc) + area
        cov = coverage(da)
        f = fills[u]  # [T, 4]
        src_a = f[:, 3][:, None] * cov
        inv = 1.0 - src_a
        return tuple(dst[ch] * inv + f[:, ch][:, None] * src_a for ch in range(4))

    dst = jax.lax.fori_loop(0, D, step, dst)
    return sum(d.sum() for d in dst)


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    grid = jax.random.randint(key, (RUN_CAP, 256), -512, 512, dtype=jnp.int32)
    table = jax.random.randint(key, (D, T), 0, RUN_CAP, dtype=jnp.int32)
    carry16 = jax.random.randint(key, (RUN_CAP, 16), -16, 16, dtype=jnp.int32)
    fills = jax.random.uniform(key, (RUN_CAP, 4), jnp.float32)

    a = bench("wave step, [T,16,16] carry (cumsum axis=2)", fold_16x16, grid, table, carry16, fills)
    b = bench("wave step, [T,256] carry (lane rolls)", fold_256, grid, table, carry16, fills)
    print(f"ratio 16x16/256: {a / b:.2f}x", flush=True)

    # Equality sanity: same math modulo the prefix formulation.
    va = jax.jit(fold_16x16)(grid, table, carry16, fills)
    vb = jax.jit(fold_256)(grid, table, carry16, fills)
    print("sums:", float(va), float(vb), "rel diff:",
          abs(float(va) - float(vb)) / max(abs(float(va)), 1e-9), flush=True)


if __name__ == "__main__":
    main()
