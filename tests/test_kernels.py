"""Detection + recognition kernel unit tests (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kiri_ocr_spark.imaging.glyphs import GLYPH_H, SCALE, render_page
from kiri_ocr_spark.operators.components import (
    component_stats,
    connected_components,
    filter_components,
    iou,
    merge_overlapping,
    nms,
    relative_size_filter,
)
from kiri_ocr_spark.operators.detect import (
    binarize,
    detect_lines,
    group_into_lines,
    invert_if_dark,
    line_bands,
    otsu_threshold,
    reading_order,
    segment_words,
    select_top_binarizations,
)
from kiri_ocr_spark.operators.recognize import (
    BLANK_ID,
    ctc_collapse,
    ctc_greedy_decode,
    extract_page_text,
)


# --- connected components -------------------------------------------------


def test_cc_simple_shapes():
    img = np.zeros((10, 12), dtype=bool)
    img[1:3, 1:4] = True  # component 1
    img[6:9, 7:11] = True  # component 2
    img[4, 5] = True  # single pixel
    labels = connected_components(img)
    assert labels.max() == 3
    stats = component_stats(labels)
    assert len(stats) == 3
    areas = sorted(stats[:, 4].tolist())
    assert areas == [1, 6, 12]


def test_cc_diagonal_is_8_connected():
    img = np.eye(5, dtype=bool)
    labels = connected_components(img)
    assert labels.max() == 1  # one diagonal component under 8-connectivity


def test_cc_u_shape_merges():
    # U shape: two columns joined at the bottom — requires union-find merge
    img = np.zeros((5, 5), dtype=bool)
    img[0:5, 0] = True
    img[0:5, 4] = True
    img[4, 0:5] = True
    assert connected_components(img).max() == 1


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_cc_label_count_matches_flood_fill(seed):
    rng = np.random.RandomState(seed)
    img = rng.rand(18, 18) < 0.35
    labels = connected_components(img)
    # oracle: BFS flood fill
    seen = np.zeros_like(img, dtype=bool)
    count = 0
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            if img[y, x] and not seen[y, x]:
                count += 1
                stack = [(y, x)]
                seen[y, x] = True
                while stack:
                    cy, cx = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = cy + dy, cx + dx
                            if (
                                0 <= ny < img.shape[0]
                                and 0 <= nx < img.shape[1]
                                and img[ny, nx]
                                and not seen[ny, nx]
                            ):
                                seen[ny, nx] = True
                                stack.append((ny, nx))
    assert labels.max() == count
    # foreground/background agreement
    assert ((labels > 0) == img).all()


# --- box algebra ----------------------------------------------------------


def test_iou_known_values():
    a = np.array([0, 0, 10, 10], dtype=float)
    assert iou(a, a) == 1.0
    assert iou(a, np.array([20, 20, 5, 5], dtype=float)) == 0.0
    b = np.array([5, 0, 10, 10], dtype=float)
    assert abs(iou(a, b) - 50 / 150) < 1e-12


def test_nms_keeps_highest_confidence():
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 10, 10, 0.8],  # IoU > 0.5 with first -> suppressed
            [30, 30, 10, 10, 0.7],
        ],
        dtype=float,
    )
    kept = nms(boxes, 0.5)
    assert len(kept) == 2
    assert 0.9 in kept[:, 4] and 0.7 in kept[:, 4]


def test_merge_overlapping_hull_and_mean_conf():
    boxes = np.array([[0, 0, 10, 10, 1.0], [0, 5, 10, 10, 0.5]], dtype=float)
    merged = merge_overlapping(boxes, 0.3)
    assert len(merged) == 1
    x, y, w, h, c = merged[0]
    assert (x, y, w, h) == (0, 0, 10, 15)
    assert abs(c - 0.75) < 1e-12


def test_filter_components_reference_predicates():
    img_w, img_h = 100, 100
    stats = np.array(
        [
            [10, 10, 5, 10, 50],  # good
            [0, 0, 1, 10, 10],  # too narrow (w<2)
            [0, 0, 10, 3, 30],  # too short (h<6)
            [0, 0, 10, 60, 600],  # too tall (>0.5*img_h)
            [0, 0, 99, 10, 990],  # too wide (>0.98*img_w)
        ],
        dtype=np.int64,
    )
    kept = filter_components(stats, img_w, img_h)
    assert len(kept) == 1 and kept[0, 4] == 50


def test_relative_size_filter():
    stats = np.array(
        [[0, 0, 5, 10, 1], [0, 0, 5, 11, 1], [0, 0, 5, 1, 1], [0, 0, 5, 100, 1]],
        dtype=np.int64,
    )
    kept = relative_size_filter(stats)
    assert len(kept) == 2  # median ~10.5; 1 and 100 dropped


# --- detection stages -----------------------------------------------------


def test_otsu_bimodal():
    img = np.concatenate([np.zeros(500), np.full(500, 255)]).astype(np.uint8)
    t = otsu_threshold(img.reshape(20, 50))
    assert 0 <= t < 255
    mask = img.reshape(20, 50) <= t
    assert mask.sum() == 500


def test_invert_if_dark():
    light = np.full((10, 10), 200, dtype=np.uint8)
    dark = np.full((10, 10), 50, dtype=np.uint8)
    assert (invert_if_dark(light) == light).all()
    assert (invert_if_dark(dark) == 205).all()


def test_line_bands_and_detect_lines():
    page = render_page(["first line", "second one", "third"], scale=SCALE)
    ink = binarize(page)
    bands = line_bands(ink)
    assert len(bands) == 3
    for y0, y1 in bands:
        assert y1 - y0 == GLYPH_H * SCALE  # full row coverage contract
    boxes = detect_lines(page)
    assert len(boxes) == 3
    assert (np.diff(boxes[:, 1]) > 0).all()  # top-to-bottom order


def test_group_into_lines_tolerance():
    # components on two visual lines, jittered within 0.6*median_h
    stats = np.array(
        [[0, 0, 5, 10, 1], [10, 2, 5, 10, 1], [0, 30, 5, 10, 1], [10, 29, 5, 10, 1]],
        dtype=np.int64,
    )
    lines = group_into_lines(stats)
    assert [len(ln) for ln in lines] == [2, 2]
    # within-line x order
    assert lines[0][0][0] < lines[0][1][0]


def test_reading_order_row_major():
    # three boxes: two on top row (out of x order), one below
    boxes = np.array(
        [[50, 0, 10, 10, 1], [0, 1, 10, 10, 1], [0, 40, 10, 10, 1]], dtype=float
    )
    order = reading_order(boxes)
    assert order.tolist() == [1, 0, 2]


def test_segment_words_by_gap():
    # components: tight cluster, big gap, tight cluster
    stats = np.array(
        [[0, 0, 5, 10, 1], [6, 0, 5, 10, 1], [40, 0, 5, 10, 1], [46, 0, 5, 10, 1]],
        dtype=np.int64,
    )
    words = segment_words(stats)
    assert [len(w) for w in words] == [2, 2]


def test_orient_and_binarize_bit_identical_to_unfused():
    """The fused hot-path (one histogram pass for P2 invert + F10 Otsu)
    must equal binarize(invert_if_dark(...)) exactly, on both polarities,
    noise, and degenerate flat images — it exists for speed only."""
    from kiri_ocr_spark.operators.detect import orient_and_binarize

    from kiri_ocr_spark.fixtures import _tint_page
    from kiri_ocr_spark.imaging.png import decode_gray, encode_rgb

    rng = np.random.default_rng(3)
    grad = np.tile(np.arange(120, dtype=np.uint8) * 2, (40, 1))
    three_level = np.full((20, 30), 255, dtype=np.uint8)
    three_level[5:10, 5:20] = 0
    three_level[12:15, 5:20] = 128
    pages = [
        render_page(["fused hot path"], scale=SCALE),  # bilevel fast path
        render_page(["inverted", "page"], scale=SCALE, invert=True),
        # tinted-codec page: the OTHER bilevel family (bg 239)
        decode_gray(encode_rgb(_tint_page(render_page(["tinted page"], scale=SCALE)))),
        (rng.random((40, 120)) * 255).astype(np.uint8),
        grad,  # smooth non-bilevel: histogram path
        three_level,  # almost-bilevel: must NOT take the fast path
        255 - three_level,
        np.full((16, 16), 255, dtype=np.uint8),
        np.zeros((16, 16), dtype=np.uint8),
    ]
    for p in pages:
        g0 = invert_if_dark(p)
        m0 = binarize(g0)
        g1, m1 = orient_and_binarize(p)
        assert (g0 == g1).all() and (m0 == m1).all()


def test_select_top_binarizations_prefers_text_like():
    page = render_page(["some words here to score"], scale=SCALE)
    top = select_top_binarizations(page, k=3)
    assert len(top) == 3
    ink = binarize(page)
    # the best candidate should essentially match plain Otsu ink
    assert (top[0] == ink).mean() > 0.99


# --- CTC ------------------------------------------------------------------


def test_ctc_collapse_laws():
    # decode(blank-extended repeats) == collapsed (model.py:120-144 law)
    ids = np.array([0, 3, 3, 0, 3, 4, 4, 0, 0, 5])
    assert ctc_collapse(ids).tolist() == [3, 3, 4, 5]
    assert ctc_collapse(np.array([])).size == 0
    assert ctc_collapse(np.array([0, 0, 0])).size == 0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 5), min_size=0, max_size=12))
def test_ctc_roundtrip_property(seq):
    """Encoding any sequence as blank-separated doubled frames decodes back."""
    frames: list[int] = []
    for s in seq:
        frames.extend([s, s, BLANK_ID])
    got = ctc_collapse(np.array(frames, dtype=np.int64)) if frames else np.array([])
    assert list(got) == seq


def test_ctc_greedy_decode_confidence():
    logp = np.full((4, 6), -20.0)
    for t, lab in enumerate([2, 2, 0, 3]):
        logp[t, lab] = 0.0
    ids, conf = ctc_greedy_decode(logp)
    assert ids.tolist() == [2, 3]
    assert conf == 1.0


# --- full kernel ----------------------------------------------------------


def test_extract_page_text_exact_and_inverted():
    lines = ["the quick brown fox", "jumps over 13 lazy dogs!"]
    for invert in (False, True):
        page = render_page(lines, scale=SCALE, invert=invert)
        text, conf, n = extract_page_text(page)
        assert text == "\n".join(lines)
        assert n == 2
        assert conf == 1.0


def test_reading_order_db_variant_sorts_by_left_edge():
    from kiri_ocr_spark.operators.detect import reading_order, reading_order_db

    # two boxes on one visual line: A is wide starting left but has center
    # RIGHT of B's center; B is narrow on the right half
    boxes = np.array(
        [
            [0.0, 0.0, 90.0, 10.0, 1.0],   # center x = 45
            [50.0, 1.0, 20.0, 10.0, 1.0],  # center x = 60 > 45, left edge 50
            [0.0, 40.0, 10.0, 10.0, 1.0],  # second line
        ]
    )
    # W1 sorts within line by CENTER: A(45) then B(60)
    assert reading_order(boxes).tolist() == [0, 1, 2]
    # W2 sorts by LEFT EDGE: A(0) then B(50) — same here; flip to expose:
    boxes2 = boxes.copy()
    boxes2[0, 0], boxes2[0, 2] = 30.0, 90.0   # A: left 30, center 75
    boxes2[1, 0], boxes2[1, 2] = 40.0, 20.0   # B: left 40, center 50
    assert reading_order(boxes2).tolist() == [1, 0, 2]      # by center
    assert reading_order_db(boxes2).tolist() == [0, 1, 2]   # by left edge


def test_bbox_hull():
    from kiri_ocr_spark.operators.detect import bbox_hull

    boxes = np.array([[0, 0, 10, 10, 0.8], [5, 5, 10, 10, 0.4]], dtype=float)
    hull = bbox_hull(boxes)
    assert hull[:4].tolist() == [0.0, 0.0, 15.0, 15.0]
    assert abs(hull[4] - 0.6) < 1e-12


def test_group_blocks_vertical_gap_and_overlap():
    from kiri_ocr_spark.operators.detect import group_blocks

    # three tight lines, a big gap, then one more; all x-aligned
    lines = np.array(
        [
            [0, 0, 100, 10, 1.0],
            [0, 14, 100, 10, 1.0],
            [0, 28, 100, 10, 1.0],
            [0, 100, 100, 10, 1.0],
        ],
        dtype=float,
    )
    blocks = group_blocks(lines)
    assert [b.tolist() for b in blocks] == [[0, 1, 2], [3]]
    # same gaps but no x-overlap -> separate blocks
    lines2 = lines.copy()
    lines2[1, 0] = 200.0
    blocks2 = group_blocks(lines2[:2])
    assert len(blocks2) == 2


def test_binarization_bank_covers_reference_candidates():
    """F9/F11/F12: the bank must carry the reference's full grayscale
    candidate set (otsu pair, adaptive gaussian/mean pairs, sauvola- and
    niblack-like pairs, morph-gradient; legacy:395-494) — >= 12 candidates,
    every one a boolean mask, and A1/A2 scoring still picks a text-like
    winner on a clean page AND on a low-contrast page (the CLAHE case)."""
    from kiri_ocr_spark.operators.detect import binarize_candidates, clahe

    page = render_page(["bank coverage test", "two lines"], scale=SCALE)
    bank = binarize_candidates(page)
    assert len(bank) >= 12
    assert all(c.dtype == bool and c.shape == page.shape for c in bank)
    # low-contrast page: squeeze the dynamic range; the selected top mask
    # must still recover the same ink pixels plain Otsu finds on the
    # original (CLAHE + adaptive candidates are what make this work)
    low = (page.astype(np.float64) * 0.25 + 96).astype(np.uint8)
    top_low = select_top_binarizations(low, k=1)[0]
    assert (top_low == binarize(page)).mean() > 0.95
    # clahe plumbing: uint8 out, shape preserved, deterministic
    e = clahe(low)
    assert e.dtype == np.uint8 and e.shape == low.shape
    assert (clahe(low) == e).all()


def test_color_channel_bank_and_counts():
    """F11: a 3-channel page runs the 15 RGB/HSV/LAB channel candidates on
    top of the 14-candidate grayscale bank (29 total >= the reference's
    26); a grayscale page keeps the 14-candidate bank."""
    from kiri_ocr_spark.imaging.glyphs import render_page
    from kiri_ocr_spark.operators.detect import binarize_candidates

    page = render_page(["color bank page"])
    assert len(binarize_candidates(page)) == 14
    # tint: dark blue ink on warm paper
    rgb = np.empty(page.shape + (3,), dtype=np.uint8)
    ink = page < 128
    for c, (i_v, p_v) in enumerate([(20, 245), (20, 240), (80, 220)]):
        ch = np.where(ink, i_v, p_v).astype(np.uint8)
        rgb[:, :, c] = ch
    cands = binarize_candidates(rgb)
    assert len(cands) == 29
    assert all(c.shape == page.shape and c.dtype == bool for c in cands)


def test_color_bank_recovers_luma_invisible_text():
    """The reason F11 exists (legacy:444 'for colored backgrounds'): red
    text on an equal-luma gray background vanishes in the luma projection
    — the grayscale bank scores ~nothing while a channel candidate
    recovers the glyph mask."""
    from kiri_ocr_spark.imaging.glyphs import render_page
    from kiri_ocr_spark.operators.detect import (
        binarize_candidates,
        color_channel_candidates,
        score_binarization,
    )
    from kiri_ocr_spark.imaging.png import rgb_to_gray

    page = render_page(["hidden in luma", "second line here"])
    ink = page < 128
    # red ink (200,60,62) has luma exactly 102; paint the paper gray 102
    rgb = np.empty(page.shape + (3,), dtype=np.uint8)
    rgb[:, :, 0] = np.where(ink, 200, 102)
    rgb[:, :, 1] = np.where(ink, 60, 102)
    rgb[:, :, 2] = np.where(ink, 62, 102)
    gray = rgb_to_gray(rgb)
    assert int(np.ptp(gray)) == 0  # text is truly invisible in luma
    color_scores = [score_binarization(c) for c in color_channel_candidates(rgb)]
    best = int(np.argmax(color_scores))
    best_mask = color_channel_candidates(rgb)[best]
    # the winning channel candidate recovers the ink mask (or its inverse
    # polarity twin — scoring may pick either; check overlap with ink)
    overlap = (best_mask & ink).sum() / ink.sum()
    assert overlap > 0.95
    assert max(color_scores) > 0
    # and the full bank's argmax lands on a COLOR candidate, not a gray one
    all_scores = [score_binarization(c) for c in binarize_candidates(rgb)]
    assert int(np.argmax(all_scores)) >= 14


def test_trained_ocr_kernel_decodes_and_quarantines():
    """_ocr_batches_trained (extract_spans_trained's media kernel): exact
    decode of plain and tinted pages through the trained weights, empty
    text on a blank page, and the same quarantine contract as the
    template kernel (None payload / corrupt PNG -> text NULL, conf 0,
    n_lines -1) — one corrupt payload must never fail the task."""
    import pandas as pd

    from kiri_ocr_spark.fixtures import _tint_page
    from kiri_ocr_spark.imaging.glyphs import SCALE, render_page
    from kiri_ocr_spark.imaging.png import encode_gray, encode_rgb
    from kiri_ocr_spark.pipeline import _ocr_batches_trained
    from kiri_ocr_spark.queries import trained_model_path

    plain = encode_gray(render_page(["the fast key"], scale=SCALE))
    tinted = encode_rgb(_tint_page(render_page(["order sort", "table"], scale=SCALE)))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 1, 2, 2],
            "offset": [0, 1, 0, 1],
            "kind": ["media"] * 4,
            "media_ref": ["a", "b", "c", "d"],
            "png_bytes": [plain, tinted, None, b"\x89PNG\r\n\x1a\ngarbage"],
        }
    )
    (out,) = list(_ocr_batches_trained(trained_model_path())([pdf]))
    rows = {r.media_ref: r for r in out.itertuples()}
    assert rows["a"].text == "the fast key" and rows["a"].n_lines == 1
    assert rows["b"].text == "order sort\ntable" and rows["b"].n_lines == 2
    assert rows["b"].conf > 0.5
    for ref in ("c", "d"):
        assert rows[ref].text is None
        assert rows[ref].conf == 0.0
        assert rows[ref].n_lines == -1
    assert (out["kernel_us"] >= 0).all()


def test_trained_kernel_mid_page_quarantine_rolls_back_crops(monkeypatch):
    """Advisor r5 (pipeline.py quarantine contract): a page that fails
    AFTER some of its line crops were appended must roll those crops
    back — otherwise the stacked decode assigns the partial text to the
    quarantined row, overwriting its text=NULL dead-letter marker while
    n_lines stays -1 (an inconsistent row the health query can't see)."""
    import pandas as pd

    from kiri_ocr_spark.imaging.glyphs import SCALE, render_page
    from kiri_ocr_spark.imaging.png import encode_gray
    from kiri_ocr_spark.operators import detect as detect_mod
    from kiri_ocr_spark.pipeline import _ocr_batches_trained
    from kiri_ocr_spark.queries import trained_model_path

    two_line = encode_gray(render_page(["order sort", "table"], scale=SCALE))
    one_line = encode_gray(render_page(["the fast key"], scale=SCALE))

    real_pad = detect_mod.pad_training_margins
    calls = {"n": 0}

    def exploding_pad(region):
        calls["n"] += 1
        if calls["n"] == 2:  # second line of the FIRST page: mid-page
            raise ValueError("simulated degenerate crop")
        return real_pad(region)

    monkeypatch.setattr(detect_mod, "pad_training_margins", exploding_pad)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "offset": [0, 0],
            "kind": ["media"] * 2,
            "media_ref": ["a", "b"],
            "png_bytes": [two_line, one_line],
        }
    )
    (out,) = list(_ocr_batches_trained(trained_model_path())([pdf]))
    rows = {r.media_ref: r for r in out.itertuples()}
    # quarantined page: full dead-letter contract, no partial text
    assert rows["a"].text is None
    assert rows["a"].conf == 0.0 and rows["a"].n_lines == -1
    # the following page is untouched by the rollback
    assert rows["b"].text == "the fast key" and rows["b"].n_lines == 1


def test_pad_training_margins_uses_crop_background():
    """Advisor r4: neural-path pad margins must carry the crop's OWN
    background luma (255 plain, 239 tinted-codec pages), not hardcoded
    255 — the trained artifact's preprocessing contract."""
    from kiri_ocr_spark.imaging.glyphs import PAD_X, PAD_Y
    from kiri_ocr_spark.operators.detect import pad_training_margins

    plain = np.full((10, 20), 255, dtype=np.uint8)
    plain[3:7, 5:15] = 0
    out = pad_training_margins(plain)
    assert out.shape == (10 + 2 * PAD_Y, 20 + 2 * PAD_X)
    assert out[0, 0] == 255

    tinted = np.full((10, 20), 239, dtype=np.uint8)
    tinted[3:7, 5:15] = 27
    out = pad_training_margins(tinted)
    assert out[0, 0] == 239  # background, not 255
    assert out[PAD_Y + 3, PAD_X + 5] == 27  # content preserved

    # advisor r5: an ALL-INK crop (solid block glyph) has no background
    # pixel — its max is ink luma; the pad must fall back to plain 255,
    # not pad with ink
    solid = np.full((10, 20), 27, dtype=np.uint8)
    out = pad_training_margins(solid)
    assert out[0, 0] == 255
    assert out[PAD_Y, PAD_X] == 27
