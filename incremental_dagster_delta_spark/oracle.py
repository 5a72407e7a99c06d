"""Differential-test harness: Spark result vs DuckDB oracle.

Mirrors the driver's comparison: row count, column-name set, and an
order-insensitive value hash over cells normalized per type (floats to 6
significant digits). Used by ``tests/test_oracle.py`` and
``scripts/check_oracle.py``.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb

from incremental_dagster_delta_spark.tables import TABLE_NAMES


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int | None
    rows_match: bool
    cols_match: bool
    hash_match: bool
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.cols_match and self.hash_match


def compare_query(spark, con, name: str, spec, sf_dir: str) -> CompareResult:
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        return CompareResult(name, len(srows), None, True, True, True, "rows-only")
    rel = con.sql(spec.oracle)
    orows = [tuple(r) for r in rel.fetchall()]
    ocols = rel.columns
    rows_match = len(srows) == len(orows)
    cols_match = sorted(scols) == sorted(ocols)
    hash_match = cols_match and table_hash(srows, scols) == table_hash(orows, ocols)
    detail = ""
    if rows_match and cols_match and not hash_match and srows:
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        snorm = sorted("|".join(norm_cell(r[i]) for i in order) for r in srows)
        onorm = sorted("|".join(norm_cell(r[i]) for i in order) for r in orows)
        for a, b in zip(snorm, onorm):
            if a != b:
                detail = f"first diff: spark={a[:160]} oracle={b[:160]}"
                break
    return CompareResult(name, len(srows), len(orows), rows_match, cols_match, hash_match, detail)
