#!/usr/bin/env python
"""Judge r4 item 6: show the LSH geometry rules actually STEP UP at a
10x corpus (~sf1) with the DuckDB oracle still matching — the CASE
chains in the oracle SQL encode the same integer-doubling rule, so this
exercises the transition, not just one operating point."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

REP_DIR = "/tmp/sf1rep"
SRC = "/root/testdata/sf0.1"
QUERIES = ["ann_lsh_buckets", "ann_lsh_topk", "ann_lsh_recall", "near_dup_cosine"]
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def build_replica():
    os.makedirs(REP_DIR, exist_ok=True)
    if not os.path.exists(f"{REP_DIR}/documents.parquet"):
        duckdb.sql(f"""
        COPY (SELECT doc_id + k.range * 10000000 AS doc_id,
                     text || ' rep' || k.range AS text, lang, source, n_chars
              FROM '{SRC}/documents.parquet', range(10) k)
        TO '{REP_DIR}/documents.parquet' (FORMAT PARQUET)
        """)
        duckdb.sql(f"""
        COPY (SELECT vec_id + k.range * 10000000 AS vec_id, embedding, label
              FROM '{SRC}/embeddings.parquet', range(10) k)
        TO '{REP_DIR}/embeddings.parquet' (FORMAT PARQUET)
        """)
    for t in TABLES:
        dst = f"{REP_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    build_replica()
    from kiri_ocr_spark import queries as Q
    from kiri_ocr_spark.session import get_spark

    # geometry at both operating points (pure rule, no Spark needed)
    n_docs = duckdb.sql(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    n_emb = duckdb.sql(f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    print(f"lsh_bits_for(emb): {n_emb}->{Q.lsh_bits_for(n_emb)} bits | "
          f"{10*n_emb}->{Q.lsh_bits_for(10*n_emb)} bits")
    nd1 = n_docs + n_docs // 5
    nd10 = 10 * n_docs + (10 * n_docs) // 5
    print(f"sign_lsh_geometry(docs): {nd1}->{Q.sign_lsh_geometry(nd1)} | "
          f"{nd10}->{Q.sign_lsh_geometry(nd10)}")

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{REP_DIR}/{t}.parquet'")
    queries, oracles = Q.query_registry(), Q.oracle_registry()
    ok = True
    for name in QUERIES:
        sp = canon(queries[name](spark, REP_DIR).toPandas())
        oc = canon(con.execute(oracles[name]).df())
        match = sp.shape == oc.shape and (sp.values == oc.values).all()
        print(f"{'OK  ' if match else 'FAIL'} {name:18s} rows={len(sp)}")
        ok = ok and match
    print("geometry after near_dup_cosine:", Q._LAST_SIGN_LSH_GEOMETRY)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
