"""Reference-exact NumPy backend.

A sequential, host-only implementation of the full 4-stage pipeline
(lines -> pixel segments -> sort -> paint) mirroring the reference CPU
backend operation-for-operation.  It exists to

  * pin the exact semantics against the reference's golden images, and
  * act as the differential oracle for the TPU (JAX/XLA/Pallas) backend,
    the same role the CPU backend plays for the GPU backend in the
    reference (`forma/src/gpu/rasterizer/mod.rs:357-422`).

It is not a performance path.
"""

from .render import render  # noqa: F401
