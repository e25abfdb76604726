"""Local mirror of the driver's correctness gate: run the Spark query and the
DuckDB oracle over the same parquet, compare row count + values exactly
(order-insensitive, columns sorted by name) — if this passes, the driver's
value-hash compare should too.
"""

from __future__ import annotations

import math

import duckdb

from dampr_spark.sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    if isinstance(x, (list, tuple)):
        return tuple(_norm_cell(v) for v in x)
    return x


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_rel = con.sql(sql)
    d_cols = list(d_rel.columns)
    d_rows = [tuple(r) for r in d_rel.fetchall()]

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    bad = 0
    first = None
    for a, b in zip(sr, dr):
        if a != b:
            bad += 1
            if first is None:
                first = (a, b)
    if bad:
        return False, f"{bad}/{len(sr)} rows differ; first: spark={first[0]} duckdb={first[1]}"
    return True, f"ok ({len(sr)} rows)"
