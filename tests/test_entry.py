"""Driver-contract smoke: entry() runs, registries are consistent."""

from __future__ import annotations

import importlib.util


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "ord",
        "kind",
        "text",
        "media_ref",
    ]


def test_every_query_has_oracle():
    mod = _load_entry_module()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    # every query is oracle-checked except the genuinely non-SQL ones
    # (driver contract: those get a rows-only check)
    non_sql = {"model_decode", "finder_candidates"}
    assert set(q) - set(o) == non_sql
    assert len(q) >= 20
