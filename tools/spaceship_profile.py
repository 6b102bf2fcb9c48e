"""Where does a damage-cached spaceship frame go?

Times the pieces of `Renderer.render_into` (host scene mutation, device
dispatch, diag fetch, frame fetch, host buffer write) separately for the
spaceship animation at 1080p, to find what bounds the damage-cached FPS
(the incremental-update workload of `demo/src/demos/spaceship.rs`).

Run on an idle host:  python tools/spaceship_profile.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import forma_tpu

forma_tpu.enable_compilation_cache()

from forma_tpu import RGBA, Buffer, Color, Composition, LinearLayout
from forma_tpu.demos.spaceship import Spaceship
from forma_tpu.renderer import Renderer

W, H = 1920, 1080
N = 20

comp = Composition()
ship = Spaceship(width=W, height=H)
ship.build(comp)
renderer = Renderer()
cache = renderer.create_buffer_layer_cache()
backing = np.zeros((H, W * 4), np.uint8)
layout = LinearLayout(W, W * 4, H)
buf = Buffer(buffer=backing, layout=layout, layer_cache=cache)
clear = Color(0.02, 0.02, 0.08, 1.0)

# Warm: compile + caps + cache priming.
for _ in range(3):
    ship.step()
    renderer.render_into(comp, buf, clear)

t_step = t_disp = t_write = 0.0
t0 = time.time()
for _ in range(N):
    t = time.time(); ship.step(); t_step += time.time() - t
    t = time.time()
    frame, diag = renderer._render_device_cached(comp, cache, W, H, clear, RGBA)
    t_disp += time.time() - t  # includes the diag+damage fetch fence inside
    t = time.time()
    renderer._write_back(
        Buffer(buffer=backing, layout=layout, layer_cache=cache),
        layout, frame, diag, H, W,
    )
    t_write += time.time() - t
total = time.time() - t0

print(f"frames               : {N}")
print(f"total                : {total * 1e3 / N:8.2f} ms/frame  ({N / total:.2f} FPS)")
print(f"  ship.step (host)   : {t_step * 1e3 / N:8.2f} ms")
print(f"  dispatch+dmg fence : {t_disp * 1e3 / N:8.2f} ms")
print(f"  write_back (host)  : {t_write * 1e3 / N:8.2f} ms")

# How many tiles actually change per frame?
import forma_tpu.ops.pipeline as pipe

d = renderer.last_diag
print(f"diag: vlines={int(d[pipe.DIAG_VLINES])} runs={int(d[pipe.DIAG_RUNS])} "
      f"virt={int(d[pipe.DIAG_VIRT])} k={int(d[pipe.DIAG_K])} dmg={int(d[pipe.DIAG_DMG])}")
