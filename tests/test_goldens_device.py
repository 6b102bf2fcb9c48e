"""Golden-image parity of the device (JAX/XLA) renderer."""

import os

import numpy as np
import pytest

from forma_tpu import Color, Composition
from forma_tpu.renderer import Renderer

import e2e_scenes as S

GOLDENS = os.environ.get(
    "FORMA_REFERENCE_EXPECTED", "/root/reference/e2e-tests/expected"
)
CLEAR = Color(1.0, 1.0, 1.0, 0.0)


@pytest.fixture(scope="module")
def renderer():
    return Renderer()


@pytest.mark.parametrize("name,scene", list(S.all_scenes()))
def test_golden_device(name, scene, renderer):
    from PIL import Image as PILImage

    from report import GLOBAL_REPORT

    path = os.path.join(GOLDENS, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not available")
    expected = np.asarray(PILImage.open(path).convert("RGBA"))

    composition = Composition()
    scene(composition)
    actual = renderer.render(composition, 64, 64, clear_color=CLEAR)
    passed, bad = GLOBAL_REPORT.record(name + "__device", actual, expected)
    assert passed, f"{name}: {bad} pixels exceed tolerance"
