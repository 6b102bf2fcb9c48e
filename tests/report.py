"""E2E golden-test HTML report.

The counterpart of the reference harness's self-updating report
(`e2e-tests/tests/test_env.rs:315-421`): every golden comparison records its
actual/expected images; at session end a browsable `report.html` with
base64-embedded images lands in `test-report/` — failures first, with
per-test max channel difference.
"""

from __future__ import annotations

import base64
import html
import io
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

REPORT_DIR = os.environ.get(
    "FORMA_REPORT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "test-report"),
)


def _png_b64(img: Optional[np.ndarray]) -> str:
    if img is None:
        return ""
    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(img.astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@dataclass
class Entry:
    name: str
    passed: bool
    max_diff: int
    bad_pixels: int
    actual: Optional[np.ndarray]
    expected: Optional[np.ndarray]
    note: str = ""


@dataclass
class Report:
    entries: List[Entry] = field(default_factory=list)

    def record(self, name, actual, expected, tolerance=8, note=""):
        """Compares, records, and returns (passed, bad_pixel_count)."""
        if expected is None:
            self.entries.append(Entry(name, False, 255, -1, actual, None, "no golden"))
            return False, -1
        diff = np.abs(actual.astype(int) - expected.astype(int))
        bad = int((diff.max(axis=-1) > tolerance).sum())
        self.entries.append(
            Entry(name, bad == 0, int(diff.max()), bad, actual, expected, note)
        )
        return bad == 0, bad

    def write(self, path: Optional[str] = None) -> str:
        os.makedirs(REPORT_DIR, exist_ok=True)
        path = path or os.path.join(REPORT_DIR, "report.html")
        rows = []
        for e in sorted(self.entries, key=lambda e: (e.passed, e.name)):
            color = "#2a2" if e.passed else "#c33"
            status = "PASS" if e.passed else "FAIL"
            imgs = ""
            for label, img in (("actual", e.actual), ("expected", e.expected)):
                if img is not None:
                    imgs += (
                        f'<figure style="display:inline-block;margin:4px">'
                        f'<img src="data:image/png;base64,{_png_b64(img)}" '
                        f'width="128" style="image-rendering:pixelated;border:1px solid #999">'
                        f"<figcaption>{label}</figcaption></figure>"
                    )
            rows.append(
                f'<tr><td style="color:{color};font-weight:bold">{status}</td>'
                f"<td>{html.escape(e.name)}</td><td>{e.max_diff}</td>"
                f"<td>{e.bad_pixels}</td><td>{html.escape(e.note)}</td>"
                f"<td>{imgs}</td></tr>"
            )
        n_fail = sum(not e.passed for e in self.entries)
        doc = (
            "<!doctype html><meta charset='utf-8'><title>forma-tpu golden report</title>"
            "<style>body{font-family:monospace}table{border-collapse:collapse}"
            "td{border:1px solid #ccc;padding:4px;vertical-align:top}</style>"
            f"<h1>forma-tpu golden report — {len(self.entries)} tests, "
            f"{n_fail} failing</h1>"
            "<table><tr><th></th><th>test</th><th>max diff</th>"
            "<th>bad pixels</th><th>note</th><th>images</th></tr>"
            + "".join(rows)
            + "</table>"
        )
        with open(path, "w") as f:
            f.write(doc)
        return path


GLOBAL_REPORT = Report()
