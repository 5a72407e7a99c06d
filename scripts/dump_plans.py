"""Regenerate docs/PLANS.md plan trees: formatted explain output for the
headline queries at $SPARK_GRAFT_SF_DIR (tree section only).

Usage: python scripts/dump_plans.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incremental_dagster_delta_spark.queries import QUERIES
from incremental_dagster_delta_spark.session import get_spark

DEFAULT = [
    "q_region_revenue",
    "q_top_orders",
    "q_dedup_minhash",
    "q_cosine_topk",
    "q_asof_join",
    "q_prefilter_semi_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    spark = get_spark()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        print(f"## {name}\n\n```\n{plan.split(chr(10) + chr(10))[0]}\n```\n")
    spark.stop()


if __name__ == "__main__":
    main()
