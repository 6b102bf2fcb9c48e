"""Device (JAX/XLA/Pallas) pipeline stages.

The TPU backend re-casts the reference's 4-stage pipeline as fixed-shape
array programs:

  line_setup  — elementwise XLA over SoA line arrays + prefix sum
  rasterize   — per-output-slot searchsorted + the O(1) grid-crossing math
                in float-float (TPU is f32-native)
  sort        — `jax.lax.sort` on packed (tile, layer) keys
  runs        — run extraction + cover-carry chains via sorted scans,
                replacing the reference's sequential tile walk
  paint       — dense K-slot blend fold over per-tile coverage grids
  srgb        — linear -> sRGB + channel mapping + u8 pack

Dynamic sizes (segments per frame, runs, layers per tile) become static
capacity buckets with validity masks, as XLA requires.
"""
