"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship OCR extraction on sf0.001: synthesize the
                interleaved spans+media fixture from the flat documents
                table (deterministic, SQL-expressible rules — see
                kiri_ocr_spark/fixtures.py), render media PNGs, run the
                full detect+recognize pipeline, return the flat ordered
                span sequence.
queries()     — every implemented operator from SURVEY.md §2 plus the
                training-data-pipeline ops (dedup / similarity / text
                analysis), as (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL per query. The flagship extraction is
                oracle-checked too: DuckDB derives each span's expected
                text by construction while Spark actually renders and
                OCRs the images.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kiri_ocr_spark.queries import q_extract_spans

    return q_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kiri_ocr_spark.queries import query_registry

    return query_registry()


def oracle_sql() -> dict[str, str]:
    from kiri_ocr_spark.queries import oracle_registry

    return oracle_registry()
