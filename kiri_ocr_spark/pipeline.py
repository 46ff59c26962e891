"""The flagship extraction dataflow (SURVEY.md §3.1 "our equivalent lifecycle").

    documents(doc_id, spans)                 media(media_ref, png_bytes, ...)
        |  posexplode(spans)                        |
        |  route by kind (P11, pure Catalyst)       |
        +-- text:  native trim/collapse + NFC pandas_udf (F1/F2)
        +-- media: salt (skew: media-heavy docs) -> repartition
                   -> join media payload (broadcast small / SMJ + AQE skew)
                   -> mapInPandas OCR kernel (detect F13 + recognize M2/F7)
                   -> bytes projected away immediately (§4.3 large-binary hygiene)
        \\-> unionByName (U5)
        -> groupBy(doc_id) ordered-span assembly (A8/W9) -- the only
           required shuffle carries only text rows, never image bytes.

Design notes for 100 TB / 1000 executors:
- the per-span explode breaks media-heavy documents apart BEFORE any
  expensive work, and the salt column spreads one hot doc's spans across
  the cluster (north_rule "explicit salting of skewed media-heavy
  partitions"); AQE skew-join covers the payload join side;
- glyph templates (the recognizer "weights") ride a broadcast variable and
  are materialized once per Python worker via an executor-side singleton
  (north_star "weights broadcast once per executor");
- everything outside the OCR kernel is native Catalyst -> whole-stage
  codegen; the kernel is Arrow-batched, never per-row Python.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import normalize_text

OCR_SCHEMA = (
    "doc_id long, offset int, kind string, text string, media_ref string, "
    "conf double, n_lines int, kernel_us long"
)

SPAN_SCHEMA = (
    "doc_id long, offset int, kind string, text string, media_ref string, "
    "conf double, n_lines int"
)

# executor-side singleton: resolved once per Python worker process
_TEMPLATES = {"index": None}


def _get_template_index(broadcast=None):
    if _TEMPLATES["index"] is None:
        if broadcast is not None:
            _TEMPLATES["index"] = broadcast.value
        else:  # deterministic rebuild — same bits everywhere
            from .imaging.glyphs import template_index

            _TEMPLATES["index"] = template_index()
    return _TEMPLATES["index"]


def _ocr_batches(broadcast):
    """mapInPandas kernel: decode PNG -> detect lines -> CTC recognize."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # warm the executor singleton before the first batch
        import struct
        import zlib

        import numpy as np  # noqa: F401

        from .imaging.png import decode_gray
        from .operators.recognize import extract_page_text

        # every failure mode of a corrupt-but-magic-valid payload:
        # bad magic / missing IHDR (ValueError), truncated chunk header
        # (struct.error), corrupt/truncated IDAT (zlib.error), malformed
        # scanline geometry (IndexError/KeyError on reshape/filter type)
        _QUARANTINE = (ValueError, KeyError, IndexError, struct.error, zlib.error)

        _get_template_index(broadcast)
        for pdf in batches:
            texts, confs, nlines, row_us = [], [], [], []
            t_prev = time.monotonic()
            for blob in pdf["png_bytes"]:
                # quarantine, don't crash: one corrupt payload among 10^12
                # docs must not fail the task (and with it the wave).
                # Marker: text NULL, conf 0, n_lines -1 — downstream can
                # route `n_lines = -1` rows to a dead-letter table.
                try:
                    if blob is None:  # payload missing from the store
                        raise ValueError("missing media payload")
                    gray = decode_gray(bytes(blob))
                    text, conf, n = extract_page_text(gray)
                except _QUARANTINE:
                    text, conf, n = None, 0.0, -1
                texts.append(text)
                confs.append(conf)
                nlines.append(n)
                # true per-row kernel time (µs), stamped inside the row
                # loop: summing the column over any row grouping (e.g.
                # checkpoint part_id) yields that group's actual kernel
                # wall — heavy rows (16-image skew-tail docs, corrupt
                # payloads) carry their own cost, not a batch average
                t_now = time.monotonic()
                row_us.append(int((t_now - t_prev) * 1_000_000))
                t_prev = t_now
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "kind": pdf["kind"],
                    "text": texts,
                    "media_ref": pdf["media_ref"],
                    "conf": confs,
                    "n_lines": nlines,
                    "kernel_us": row_us,
                }
            )

    return fn


def _ocr_batches_trained(
    model_path: str, det_method: str = "legacy", decode_method: str = "ctc"
):
    """mapInPandas kernel, trained-recognizer variant (the reference's
    actual architecture — core.py:719-793 always decodes through the
    model): decode PNG -> detect lines -> batched numpy-transformer CTC
    decode with the in-sandbox-trained weights. Crop preprocessing is
    the trained artifact's contract (pad_training_margins + resize),
    identical to q_model_decode_trained. Encodes are batched ACROSS
    pages (one stacked forward per chunk of crops), not per line; the
    model loads once per Python worker (M8 get_model cache).

    ``det_method``: 'legacy' = the CC line finder (detect_lines);
    'db' | 'craft' = the calibrated conv-forward detectors through the
    TextDetector facade + the same row normalization process_document
    applies (W3 row clustering + blank-row band split), followed by an
    ink-bounds tighten per box (neural boxes carry unclip padding; the
    training contract wants tight crops re-padded with
    pad_training_margins) — the table-scope equivalent of the
    reference's process_document(method='db'|'craft'),
    detector/__init__.py:161-192 -> core.py:770-792."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        from .imaging.png import decode_gray
        from .operators.detect import (
            binarize,
            detect_lines,
            merge_boxes_into_rows,
            orient_and_binarize,
            pad_training_margins,
            resize_keep_ratio_pad,
            split_box_at_blank_rows,
        )
        from .operators.model import get_model

        _QUARANTINE = (ValueError, KeyError, IndexError, struct.error, zlib.error)
        model = get_model(path=model_path)
        if det_method == "legacy":
            detector = None
            normalize_boxes = None
        else:
            from .operators.facade import TextDetector

            det_kwargs = (
                {"det_db_score_mode": "slow"} if det_method == "db" else {}
            )
            detector = TextDetector(method=det_method, **det_kwargs)

            def normalize_boxes(
                raw: np.ndarray, ink: np.ndarray
            ) -> list[np.ndarray]:
                """Detector boxes -> recognition-grade line crop boxes:
                W3 row clustering + blank-row band split + ink-bounds
                tighten (mirroring OCR._recognize_region)."""
                out = []
                for row in merge_boxes_into_rows(raw):
                    for b in split_box_at_blank_rows(ink, row):
                        # tighten to the ink bounds inside the (unclip-
                        # padded) region
                        x, y, w, h = (int(v) for v in b[:4])
                        sub = ink[y : y + h, x : x + w]
                        ys, xs = np.nonzero(sub)
                        if len(ys) == 0:
                            continue  # blank band: no line to decode
                        out.append(
                            np.array(
                                [
                                    x + int(xs.min()),
                                    y + int(ys.min()),
                                    int(xs.max()) - int(xs.min()) + 1,
                                    int(ys.max()) - int(ys.min()) + 1,
                                ]
                            )
                        )
                return out
        memo: dict = {}  # per-partition content-addressed decode memo
        for pdf in batches:
            n = len(pdf)
            texts: list = [None] * n
            confs = [0.0] * n
            nlines = [-1] * n
            row_us = [0] * n
            crops: list[np.ndarray] = []
            owners: list[int] = []  # crop -> row index
            t_prev = time.monotonic()
            pages: dict[int, tuple] = {}  # ri -> (gray, ink), neural path
            for ri, blob in enumerate(pdf["png_bytes"]):
                # snapshot so a mid-page quarantine rolls back any crops
                # already appended for this row — otherwise the decode
                # loop later overwrites the row's text=NULL dead-letter
                # marker with partial text while n_lines stays -1
                n_crops_at_row_start = len(crops)
                try:
                    if blob is None:
                        raise ValueError("missing media payload")
                    # fused P2+F10 (one pass, bilevel fast path) — the
                    # unfused invert_if_dark + detect_lines(gray) pair
                    # paid a second full Otsu here
                    gray, ink = orient_and_binarize(decode_gray(bytes(blob)))
                    if detector is not None:
                        # neural detection runs BATCHED below (the
                        # per-page conv forwards were call-overhead);
                        # this row only decodes and binarizes here
                        pages[ri] = (gray, ink)
                    else:
                        boxes = detect_lines(gray, ink=ink)
                        for b in boxes:
                            x, y, w, h = (int(v) for v in b[:4])
                            crops.append(
                                resize_keep_ratio_pad(
                                    pad_training_margins(
                                        gray[y : y + h, x : x + w]
                                    )
                                )
                            )
                            owners.append(ri)
                        nlines[ri] = len(boxes)
                        texts[ri] = ""  # no-line page -> empty text
                except _QUARANTINE:
                    del crops[n_crops_at_row_start:]
                    del owners[n_crops_at_row_start:]
                    # quarantine markers already in place
                t_now = time.monotonic()
                row_us[ri] = int((t_now - t_prev) * 1_000_000)
                t_prev = t_now
            if pages:
                # batched neural detect over the batch's decodable pages
                # (grouped by shape inside detect_boxes_batch, bitwise
                # the per-page path); detect wall spreads over the owning
                # rows' kernel time like the encode phase below
                t0d = time.monotonic()
                ris = list(pages)
                try:
                    raw_list = detector.detect_boxes_batch(
                        [pages[ri][0] for ri in ris]
                    )
                except _QUARANTINE:
                    # a pathological page must quarantine ITSELF, not the
                    # batch: fall back to per-page detection
                    raw_list = []
                    for ri in ris:
                        try:
                            raw_list.append(
                                detector.detect_boxes(pages[ri][0])
                            )
                        except _QUARANTINE:
                            raw_list.append(None)
                for ri, raw in zip(ris, raw_list):
                    if raw is None:
                        continue  # per-page fallback quarantined it
                    gray, ink = pages[ri]
                    n_crops_at_row_start = len(crops)
                    try:
                        boxes = normalize_boxes(raw, ink)
                        for b in boxes:
                            x, y, w, h = (int(v) for v in b[:4])
                            crops.append(
                                resize_keep_ratio_pad(
                                    pad_training_margins(
                                        gray[y : y + h, x : x + w]
                                    )
                                )
                            )
                            owners.append(ri)
                        nlines[ri] = len(boxes)
                        texts[ri] = ""
                    except _QUARANTINE:
                        del crops[n_crops_at_row_start:]
                        del owners[n_crops_at_row_start:]
                per = int((time.monotonic() - t0d) * 1_000_000 / len(ris))
                for ri in ris:
                    row_us[ri] += per
            # one stacked forward per chunk, sized by ENCODE_CHUNK (the
            # cache-bound optimum — see its definition in operators/model).
            # fp32: the reference's inference dtype (torch/ONNX float32),
            # ~2x on the GEMM-bound stem; oracle stays per-line text-exact
            from .operators.model import decode_crops_memo

            t0 = time.monotonic()
            decoded = decode_crops_memo(model, crops, memo, method=decode_method)
            if crops:  # spread encode cost over owning rows' kernel time
                per = int((time.monotonic() - t0) * 1_000_000 / len(crops))
                by_row: dict[int, list[tuple[str, float]]] = {}
                for ri, d in zip(owners, decoded):
                    by_row.setdefault(ri, []).append(d)
                    row_us[ri] += per
                for ri, items in by_row.items():
                    texts[ri] = "\n".join(t for t, _ in items)
                    confs[ri] = float(np.mean([c for _, c in items]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "kind": pdf["kind"],
                    "text": texts,
                    "media_ref": pdf["media_ref"],
                    "conf": confs,
                    "n_lines": nlines,
                    "kernel_us": row_us,
                }
            )

    return fn


def extract_span_rows(
    docs: DataFrame,
    media: DataFrame,
    *,
    salt_buckets: int = 64,
    media_partitions: int | None = None,
    broadcast_media: bool = False,
    keep_kernel_us: bool = False,
    recognizer: str = "trained",
    detector: str = "legacy",
) -> DataFrame:
    """Span-level extraction: one row per span with recognized/normalized
    text, confidence and lineage columns. No assembly shuffle yet.

    ``recognizer`` defaults to "trained" — every media line decodes
    through the in-sandbox-trained numpy transformer's CTC head, matching
    the reference's architecture (core.py:719-793 ALWAYS decodes through
    the model; it has no template mode). "template" keeps the glyph-
    template construction path reachable for fixture tests and as the
    no-weights fallback."""
    spark = docs.sparkSession
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")

    # ONE non-media branch handles both text spans and unknown kinds —
    # unknown kinds must not vanish (at 10^12 docs silent row loss is
    # unrecoverable): they dead-letter inline with text carried through,
    # conf 0 and an n_lines = -2 marker, folded into the text branch's
    # predicate so the robustness guard costs zero extra scans.
    # eqNullSafe: a NULL kind must land HERE — `kind != 'media'` evaluates
    # to NULL for NULL kind and both branch filters would drop the span.
    is_text = F.col("kind").eqNullSafe("text")
    text_rows = (
        spans.filter(~F.col("kind").eqNullSafe("media"))
        .select(
            "doc_id",
            "offset",
            "kind",
            F.when(is_text, normalize_text(F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(is_text, F.lit(None).cast("string"))
            .otherwise(F.col("media_ref"))
            .alias("media_ref"),
            F.when(is_text, F.lit(1.0)).otherwise(F.lit(0.0)).alias("conf"),
            F.when(is_text, F.lit(0)).otherwise(F.lit(-2)).alias("n_lines"),
        )
    )

    media_rows = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "kind", "media_ref"
    )
    # explicit skew salting: one media-heavy doc must spread across the
    # cluster, and the OCR stage must be partitioned by ROW COUNT, not
    # bytes — per-row kernel cost dwarfs per-row size, so AQE's byte-based
    # coalescing would starve it (it can't see CPU cost). repartition(n, …)
    # is REPARTITION_BY_NUM: AQE leaves the partition count alone.
    # offset joins the salt hash so even a document repeating the SAME
    # image N times spreads over the buckets — (doc_id, media_ref) alone
    # maps identical-ref spans to one bucket, a worst-case hot partition
    salted = media_rows.withColumn(
        "salt",
        F.pmod(
            F.xxhash64("doc_id", "media_ref", "offset"), F.lit(salt_buckets)
        ).cast("int"),
    )
    # 2x the shuffle partitioning for the OCR stage: tasks are CPU-heavy
    # (~2ms/image python kernel), so finer granularity smooths the last
    # wave's stragglers; measured best at both 8 and 32 cores.
    nparts = media_partitions or 2 * int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # LEFT join: a media_ref missing from the payload store must surface
    # as a quarantined row (n_lines -1, like a corrupt payload), never
    # silently drop the span from the document's sequence.
    if broadcast_media:
        # small media store: broadcast payload; the slim ref side is
        # pre-repartitioned and keeps its partitioning through the join,
        # so image bytes never shuffle at all.
        joined = (
            salted.repartition(nparts, "salt", "doc_id")
            .join(F.broadcast(media), "media_ref", "left")
        )
    else:
        # large media store: shuffle join on media_ref (unique per span ->
        # inherently skew-free), then an explicit row-count repartition on
        # the salt feeds the kernel uniform AQE-proof tasks. On a real
        # cluster, bucket media by media_ref to make the join co-located.
        joined = salted.join(media, "media_ref", "left").repartition(nparts, "salt")
    joined = joined.select("doc_id", "offset", "kind", "media_ref", "png_bytes")

    if recognizer not in ("trained", "beam", "template"):
        # fail fast on typos: 'Beam' silently producing template output
        # is a silent-wrong-answer bug at corpus scale (ADVICE r6)
        raise ValueError(
            f"unknown recognizer {recognizer!r}; "
            "expected 'trained', 'beam' or 'template'"
        )
    if recognizer in ("trained", "beam"):
        from .queries import trained_model_path

        kernel = _ocr_batches_trained(
            trained_model_path(),
            det_method=detector,
            # "beam" = the reference's flagship ACCURACY mode (BEAM=3 +
            # CTC fusion + anchor injection/rescoring, model.py:390-600)
            # driven through full extraction; "trained" = its fast path
            decode_method="beam" if recognizer == "beam" else "ctc",
        )
    else:
        if detector != "legacy":
            raise ValueError(
                "neural detectors require the trained recognizer "
                f"(got recognizer={recognizer!r}, detector={detector!r})"
            )
        from .imaging.glyphs import template_index

        bc = spark.sparkContext.broadcast(template_index())
        kernel = _ocr_batches(bc)
    ocr = joined.mapInPandas(kernel, schema=OCR_SCHEMA)
    if keep_kernel_us:
        text_rows = text_rows.withColumn("kernel_us", F.lit(0).cast("long"))
    else:
        ocr = ocr.drop("kernel_us")

    return text_rows.unionByName(ocr)


def assemble_documents(span_rows: DataFrame) -> DataFrame:
    """A8/W9: per-doc ordered span sequence. `ord` = dense rank of offset
    (array_sort on the offset-first struct, then index via transform)."""
    return span_rows.groupBy("doc_id").agg(
        F.expr(
            """
            transform(
              array_sort(collect_list(struct(offset, kind, text, media_ref))),
              (s, i) -> struct(s.kind as kind, s.text as text,
                               s.media_ref as media_ref, cast(i as int) as ord)
            )
            """
        ).alias("spans")
    )


def extract_flat(
    docs: DataFrame,
    media: DataFrame,
    **kwargs,
) -> DataFrame:
    """Flat (doc_id, ord, kind, text, media_ref) extraction output — the
    shape the DuckDB construction oracle checks."""
    assembled = assemble_documents(extract_span_rows(docs, media, **kwargs))
    return assembled.select(
        "doc_id", F.posexplode("spans").alias("ord", "s")
    ).select(
        "doc_id",
        F.col("ord").cast("int").alias("ord"),
        "s.kind",
        "s.text",
        "s.media_ref",
    )


def extract_from_sf_dir(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
    """Convenience: synthesize the fixture from a testdata dir and extract.
    Fixture media stores are small -> broadcast by default."""
    from .fixtures import build_fixture

    kwargs.setdefault("broadcast_media", True)
    docs, media = build_fixture(spark, sf_dir)
    return extract_flat(docs, media, **kwargs)
