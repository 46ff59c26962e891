"""CLI parity with the reference's `kiri-ocr <image>` entry point
(/root/reference/kiri_ocr/cli.py:81-160,516-530):

    python -m kiri_ocr_spark extract page.png [--out-dir D] [--json]
                                              [--overlay] [--html]
    python -m kiri_ocr_spark batch <png_dir> --out <parquet_dir>

`extract` runs the detect+recognize kernels on one image driver-side (no
Spark session — the reference's single-image path is single-machine too)
and writes the reference's sink set: extracted_text.txt (S7),
ocr_results.json (S8, indent=2 ensure_ascii=False like cli.py:120-124),
boxes overlay PNG (S9) and HTML report (S10) on request.

`batch` is the distributed path the reference lacks: a
`spark.read.format("binaryFile")` scan (SURVEY §2.1 S1 mapping) over a
directory of PNGs -> the same Arrow-batched OCR kernel -> parquet of
(path, text, conf, n_lines).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_extract(args: argparse.Namespace) -> int:
    import numpy as np

    from .imaging.overlay import draw_overlay, html_report
    from .imaging.png import decode_gray, encode_gray
    from .operators.detect import binarize, detect_lines, invert_if_dark
    from .operators.recognize import recognize_line

    with open(args.image, "rb") as f:
        gray = decode_gray(f.read())
    gray = invert_if_dark(gray)
    ink = binarize(gray)
    if getattr(args, "model", None):
        # trained weights: route through the OCR class's neural decode
        # paths (same result-dict contract as the inline path below)
        from .ocr import OCR

        ocr = OCR(
            model_path=args.model,
            det_method="legacy" if args.method == "projection" else args.method,
            decode_method=args.decode,
        )
        results = ocr.process_document(gray)
        return _write_extract_sinks(args, gray, results)
    if args.method != "projection":
        # the reference facade's method switch (detector/__init__.py:34)
        # through the OCR class: craft/db resolve the in-repo numpy
        # forwards, and process_document normalizes their word/region-
        # grade boxes to text rows (merge + blank-row band split, db
        # slow score) — the per-line-text-verified path
        # (media_text_db/_craft oracles), identical to the model route
        # above but with the template decode
        from .ocr import OCR

        results = OCR(det_method=args.method).process_document(gray)
        return _write_extract_sinks(args, gray, results)
    boxes = detect_lines(gray, ink=ink)
    results = []
    for i, box in enumerate(boxes, start=1):
        text, conf = recognize_line(ink, box)
        results.append(
            {
                "box": [int(v) for v in box[:4]],
                "text": text,
                "confidence": round(float(conf), 4),
                "det_confidence": round(float(box[4]), 4),
                "line_number": i,
            }
        )
    return _write_extract_sinks(args, gray, results)


def _write_extract_sinks(args, gray, results) -> int:
    """Reference sink set (cli.py:120-160): txt + stdout, optional JSON /
    overlay PNG / HTML report."""
    import numpy as np

    from .imaging.overlay import draw_overlay, html_report
    from .imaging.png import encode_gray

    full_text = "\n".join(r["text"] for r in results)
    out_dir = args.out_dir
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "extracted_text.txt"), "w") as f:
        f.write(full_text)
    print(full_text)
    if args.json:
        with open(os.path.join(out_dir, "ocr_results.json"), "w") as f:
            json.dump(results, f, indent=2, ensure_ascii=False)
    if args.overlay:
        over = draw_overlay(
            gray,
            np.array([r["box"] + [r["confidence"]] for r in results])
            if results
            else np.zeros((0, 5)),
        )
        with open(os.path.join(out_dir, "boxes.png"), "wb") as f:
            f.write(encode_gray(over))
    if args.html:
        with open(os.path.join(out_dir, "report.html"), "w") as f:
            f.write(html_report(results))
    return 0


def run_batch(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .pipeline import _ocr_batches
    from .session import get_spark

    spark = get_spark(app_name="kiri-batch")
    spark.sparkContext.setLogLevel("WARN")
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(args.png_dir)
        .select(
            F.col("path").alias("media_ref"),
            F.col("content").alias("png_bytes"),
            F.lit(-1).cast("long").alias("doc_id"),
            F.lit(0).alias("offset"),
            F.lit("media").alias("kind"),
        )
    )
    ocr = scan.mapInPandas(
        _ocr_batches(None),
        schema=(
            "doc_id long, offset int, kind string, text string, "
            "media_ref string, conf double, n_lines int, kernel_us long"
        ),
    ).select("media_ref", "text", "conf", "n_lines")
    ocr.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"images": n, "out": args.out}))
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kiri_ocr_spark", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract", help="OCR one image driver-side")
    ex.add_argument("image")
    ex.add_argument("--out-dir", default=".")
    ex.add_argument(
        "--method",
        default="projection",
        choices=["projection", "craft", "db", "legacy"],
        help="detector: 'projection' (CC+projection-profile exactness "
        "path, default) or the reference facade methods craft/db/legacy "
        "(craft/db run the in-repo numpy forwards by default)",
    )
    ex.add_argument(
        "--model",
        default=None,
        help="trained weights (.npz from scripts/train_model.py): route "
        "recognition through the neural decode paths",
    )
    ex.add_argument(
        "--decode",
        default="fast",
        choices=["fast", "accurate", "beam"],
        help="decode path when --model is given (reference aliases)",
    )
    ex.add_argument("--json", action="store_true")
    ex.add_argument("--overlay", action="store_true")
    ex.add_argument("--html", action="store_true")
    ex.set_defaults(fn=run_extract)
    ba = sub.add_parser("batch", help="distributed OCR over a PNG directory")
    ba.add_argument("png_dir")
    ba.add_argument("--out", required=True)
    ba.set_defaults(fn=run_batch)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
