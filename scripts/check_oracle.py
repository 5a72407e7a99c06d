"""Driver-like correctness check for all registered queries.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incremental_dagster_delta_spark.oracle import compare_query, duckdb_con
from incremental_dagster_delta_spark.queries import QUERIES
from incremental_dagster_delta_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb_con(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            r = compare_query(spark, con, name, spec, sf_dir)
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {r.spark_rows} rows (no oracle)")
        elif r.ok:
            print(f"PASS  {name}: {r.spark_rows} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {r.spark_rows} vs {r.oracle_rows}; "
                f"cols={r.cols_match} hash={r.hash_match} {r.detail}"
            )
    print(f"\n{'OK' if failures == 0 else 'FAILURES'}: {len(QUERIES)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
