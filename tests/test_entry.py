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
    # every query is oracle-checked — round 2 closed the last two
    # rows-only gaps (finder line counts, model decode laws)
    assert set(q) == set(o)
    assert len(q) >= 20
