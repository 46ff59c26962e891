"""Debug sinks: bbox overlay image (S9) and HTML report (S10).

Re-expresses /root/reference/kiri_ocr/renderer.py:43-196 for a grayscale,
dependency-free world: box borders are drawn with per-tier intensities
instead of BGR colors (reference tiers: conf > 0.9 green, > 0.7 orange,
else red — renderer.py:76-89). These are driver-side, per-image debug
artifacts, never part of the distributed plan (SURVEY §2.1 S9/S10)."""

from __future__ import annotations

import html as _html

import numpy as np

# grayscale stand-ins for the reference's green / orange / red tiers
TIER_SHADES = (60, 150, 230)  # high, mid, low confidence


def conf_tier(conf: float) -> int:
    """0 = high (>0.9), 1 = mid (>0.7), 2 = low (renderer.py:76-89, A14)."""
    return 0 if conf > 0.9 else (1 if conf > 0.7 else 2)


def draw_overlay(page: np.ndarray, boxes: np.ndarray, thickness: int = 1) -> np.ndarray:
    """Draw box borders (x y w h conf rows) onto a copy of the page."""
    out = page.copy()
    H, W = out.shape
    for row in boxes:
        x, y, w, h = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        shade = TIER_SHADES[conf_tier(float(row[4]) if len(row) > 4 else 1.0)]
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W), min(y + h, H)
        t = thickness
        out[y0 : min(y0 + t, H), x0:x1] = shade
        out[max(y1 - t, 0) : y1, x0:x1] = shade
        out[y0:y1, x0 : min(x0 + t, W)] = shade
        out[y0:y1, max(x1 - t, 0) : x1] = shade
    return out


def html_report(results: list[dict]) -> str:
    """Per-region report + tier stats (renderer.py:131-196 shape):
    results rows need text / confidence / box keys."""
    tiers = [0, 0, 0]
    rows = []
    for i, r in enumerate(results, start=1):
        conf = float(r.get("confidence", 0.0))
        tiers[conf_tier(conf)] += 1
        box = r.get("box", (0, 0, 0, 0))
        rows.append(
            f"<tr><td>{i}</td><td>{_html.escape(str(r.get('text', '')))}</td>"
            f"<td>{conf:.3f}</td><td>{box}</td></tr>"
        )
    return (
        "<html><body><h1>Extraction report</h1>"
        f"<p>{len(results)} regions — high: {tiers[0]}, "
        f"mid: {tiers[1]}, low: {tiers[2]}</p>"
        "<table><tr><th>#</th><th>text</th><th>conf</th><th>box</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )
