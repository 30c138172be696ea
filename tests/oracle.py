"""Local replica of the driver's DuckDB differential oracle.

Runs a Spark query and its oracle SQL side-by-side, compares row count,
column names, and order-insensitive values (floats to tolerance). This is
what gates every queries() entry before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    """Execute oracle SQL in DuckDB with the testdata tables as views."""
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # quantize to tolerance so hash-style comparison is stable
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("f", round(float(v), 6))
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v) if v is not None else None)


def normalize_result(cols, rows):
    """Sort columns by name, normalize values, sort rows — the
    order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted_cols, canon


def compare_spark_duckdb(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d_cols, d_rows = run_oracle(sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")

    _, s_canon = normalize_result(s_cols, [tuple(r) for r in s_rows])
    _, d_canon = normalize_result(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        extra = abs(len(s_canon) - len(d_canon))
        problems.append(f"values differ (first diffs: {diffs}, len-delta {extra})")
    return problems
