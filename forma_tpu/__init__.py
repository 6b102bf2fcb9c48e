"""forma-tpu: a TPU-native 2D vector-graphics renderer.

A from-scratch rebuild of google/forma's capabilities on JAX/XLA/Pallas:
the same composition model and rendering semantics, re-designed as
fixed-shape array programs for TPU hardware.

Pipeline (README.md:27-38 of the reference):

    Bezier curves --flatten--> line segments --rasterize--> pixel segments
                 --sort (tile, layer)--> sorted segments --paint--> tiles
"""

from .buffer import (  # noqa: F401
    BGR0,
    BGR1,
    BGRA,
    RGB0,
    RGB1,
    RGBA,
    Buffer,
    BufferBuilder,
    BufferLayerCache,
    Channel,
    Flusher,
    Layout,
    LinearLayout,
    Rect,
)
from .profiling import Timings  # noqa: F401
from .composition import Composition, GeomId, Layer, Order, OrderError  # noqa: F401
from .math import AffineTransform, GeomPresTransform, Point  # noqa: F401
from .path import Path, PathBuilder  # noqa: F401
from .styling import (  # noqa: F401
    BlendMode,
    Color,
    Fill,
    FillRule,
    Func,
    Gradient,
    GradientBuilder,
    GradientType,
    Image,
    Props,
    Style,
    Texture,
)

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/tmp/forma_tpu_jax_cache"):
    """Persists compiled executables across processes; first-frame compiles
    of the fused pipeline are expensive (the TPU toolchain compiles
    remotely), so demos/benchmarks call this at startup."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

