"""PNG codec + glyph font unit tests (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kiri_ocr_spark.imaging.glyphs import (
    CHARSET,
    GLYPH_H,
    GLYPH_W,
    glyph_table,
    render_line_units,
    render_page,
    template_index,
)
from kiri_ocr_spark.imaging.png import decode_gray, encode_gray


def test_png_roundtrip_exact():
    rng = np.random.RandomState(42)
    for shape in [(1, 1), (7, 3), (48, 640), (131, 77)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert (decode_gray(encode_gray(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, size=(h, w), dtype=np.uint8)
    assert (decode_gray(encode_gray(img)) == img).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gray(b"not a png at all")


def test_glyphs_unique_and_full_coverage():
    table = glyph_table()
    assert len(table) == len(CHARSET)
    seen = set()
    for ch, g in table.items():
        assert g.shape == (GLYPH_H, GLYPH_W)
        assert g.any(axis=1).all(), f"{ch!r} missing a row"
        assert g.any(axis=0).all(), f"{ch!r} missing a column"
        key = np.packbits(g).tobytes()
        assert key not in seen, f"glyph collision for {ch!r}"
        seen.add(key)
    assert len(template_index()) == len(CHARSET)


def test_render_line_deterministic():
    a = render_line_units("hello world")
    b = render_line_units("hello world")
    assert (a == b).all()
    assert a.shape[0] == GLYPH_H


def test_render_page_geometry_and_invert():
    page = render_page(["ab", "cd"], scale=2)
    assert page.dtype == np.uint8
    assert set(np.unique(page)) <= {0, 255}
    inv = render_page(["ab", "cd"], scale=2, invert=True)
    assert (inv == 255 - page).all()
    # dark-background heuristic trigger: inverted page is mostly dark
    assert inv.mean() < 127 < page.mean()
