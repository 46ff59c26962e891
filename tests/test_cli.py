"""CLI parity surface (__main__.py): extract sinks + batch OCR."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from kiri_ocr_spark.imaging.glyphs import render_page
from kiri_ocr_spark.imaging.png import decode_gray, encode_gray

REPO = "/root/repo"


@pytest.fixture(scope="module")
def page_png(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "page.png"
    p.write_bytes(encode_gray(render_page(["hello spark world", "second line"])))
    return str(p)


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "kiri_ocr_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
    )


def test_extract_writes_reference_sinks(page_png, tmp_path):
    out = str(tmp_path / "out")
    r = run_cli("extract", page_png, "--out-dir", out, "--json", "--overlay",
                "--html")
    assert r.returncode == 0
    assert r.stdout.strip() == "hello spark world\nsecond line"
    assert (tmp_path / "out" / "extracted_text.txt").read_text() == (
        "hello spark world\nsecond line"
    )
    results = json.loads((tmp_path / "out" / "ocr_results.json").read_text())
    assert [r["text"] for r in results] == ["hello spark world", "second line"]
    assert results[0]["line_number"] == 1
    overlay = decode_gray((tmp_path / "out" / "boxes.png").read_bytes())
    assert overlay.shape == decode_gray(open(page_png, "rb").read()).shape
    assert "2 regions" in (tmp_path / "out" / "report.html").read_text()


def test_extract_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    r = run_cli("extract", str(bad))
    assert r.returncode != 0
    assert "not a PNG stream" in r.stderr


def test_missing_subcommand_usage():
    r = run_cli()
    assert r.returncode != 0
    assert "required: cmd" in r.stderr


def test_extract_method_switch(page_png, tmp_path):
    """--method routes through the facade: legacy recognizes exactly, and
    craft (no neural weights in-sandbox) falls back to legacy with the
    facade warning — the reference's method contract."""
    r = run_cli(
        "extract", page_png, "--out-dir", str(tmp_path / "leg"), "--method", "legacy"
    )
    assert r.returncode == 0
    assert r.stdout.strip().splitlines() == ["hello spark world", "second line"]
    r2 = run_cli(
        "extract", page_png, "--out-dir", str(tmp_path / "cr"), "--method", "craft"
    )
    assert r2.returncode == 0
    assert r2.stdout.strip().splitlines() == ["hello spark world", "second line"]
    assert "falling back to legacy" in (r2.stderr or "")


def test_batch_binaryfile_scan_ocr(tmp_path):
    """S1 surface: spark.read.format('binaryFile') over a PNG directory ->
    the same Arrow-batched OCR kernel -> parquet of (path, text, conf)."""
    png_dir = tmp_path / "pngs"
    png_dir.mkdir()
    pages = {
        "a.png": "alpha beta",
        "b.png": "gamma delta line",
        "c.png": "zzz",
    }
    for name, text in pages.items():
        (png_dir / name).write_bytes(encode_gray(render_page([text])))
    out = str(tmp_path / "out_parquet")
    r = run_cli("batch", str(png_dir), "--out", out)
    assert r.returncode == 0, r.stderr[-800:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["images"] == 3

    import duckdb

    got = {
        row[0].rsplit("/", 1)[-1]: row[1]
        for row in duckdb.connect()
        .execute(f"SELECT media_ref, text FROM '{out}/*.parquet'")
        .fetchall()
    }
    assert got == pages
