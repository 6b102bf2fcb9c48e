"""Golden-image parity of the NumPy oracle backend.

Renders every scene of the reference's e2e suite and compares against its
golden PNGs (tolerance 8/255 per channel, `e2e-tests/tests/test_env.rs:278`).
The goldens are read from the mounted reference; tests skip when absent.
"""

import os

import numpy as np
import pytest

from forma_tpu import Color, Composition
from forma_tpu.backend_numpy import render

import e2e_scenes as S

GOLDENS = os.environ.get(
    "FORMA_REFERENCE_EXPECTED", "/root/reference/e2e-tests/expected"
)

CLEAR = Color(1.0, 1.0, 1.0, 0.0)


def _load_golden(name):
    from PIL import Image as PILImage

    path = os.path.join(GOLDENS, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not available")
    return np.asarray(PILImage.open(path).convert("RGBA"))


@pytest.mark.parametrize("name,scene", list(S.all_scenes()))
def test_golden(name, scene):
    from report import GLOBAL_REPORT

    expected = _load_golden(name)
    composition = Composition()
    scene(composition)
    actual = render(composition, 64, 64, clear_color=CLEAR)
    passed, bad = GLOBAL_REPORT.record(name + "__oracle", actual, expected)
    assert passed, f"{name}: {bad} pixels exceed tolerance"
