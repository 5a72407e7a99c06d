"""Query registry package.

Importing this package imports every query module, which registers each
query into ``registry.QUERIES`` via the ``@query`` decorator. The driver
contract (``__spark_entry__.py``) exposes exactly this registry.
"""

from incremental_dagster_delta_spark.queries.registry import QUERIES, QuerySpec, query, t

# Import for registration side effects — order defines registry order.
from incremental_dagster_delta_spark.queries import relational  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import reference_ops  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import text  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import dedup  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import similarity  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import events  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import multimodal_q  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import incremental_ops  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import advanced  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import formats  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import scale_patterns  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import sketches  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import relational_extra  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import analytics  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import training_prep  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import timeseries  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import modern  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import cdc  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import curation  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import assembly  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import warehouse  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import lines  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import retrieval  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import vector_compress  # noqa: E402,F401

# --------------------------------------------------------------------------
# Driver-visibility rotation. The driver's correctness sweep covers the
# FIRST 50 registry entries each round, so ordering is a coverage budget:
# every oracle-backed qid should earn a driver-verified row at least once
# across rounds. Round 2 verified the first 50 import-order entries; round 3
# front-loads the 50 highest-value rows the driver has not yet recorded —
# the 42 oracle-backed qids it never reached, the fixed q_pivot_counts
# (r2's one hash-red row), the two scans that now carry read_text() oracles,
# and the five flagship incremental write/rebuild ops (rows-only). Everything
# already driver-green in r2 keeps its relative order after the window.
# --------------------------------------------------------------------------
_R3_FRONT = [
    # fixed red row + newly-oracled scans
    "q_pivot_counts",
    "q_wholetext_ingest",
    "q_file_listing",
    # oracle-backed qids with no driver row yet (registry order)
    "q_asof_join",
    "q_range_join",
    "q_lead_lag",
    "q_cube_agg",
    "q_string_funcs",
    "q_quantiles",
    "q_exists_sql",
    "q_regex_parse",
    "q_grouping_sets",
    "q_jsonl_source",
    "q_csv_source",
    "q_orc_source",
    "q_salted_agg",
    "q_sql_udf",
    "q_grouped_pandas",
    "q_prefilter_semi_join",
    "q_window_battery",
    "q_array_funcs",
    "q_min_cost_supplier",
    "q_profit_by_nation_year",
    "q_funnel_conversion",
    "q_excess_shippers",
    "q_notin_filter",
    "q_custdist_outer",
    "q_daily_activity_outer",
    "q_promo_ratio",
    "q_above_avg_customers",
    "q_cohort_retention",
    "q_histogram",
    "q_pivot_api",
    "q_tfidf",
    "q_hash_split",
    "q_token_pack",
    "q_unpivot",
    "q_gap_fill",
    "q_incr_agg_maintain",
    "q_rolling_range_window",
    "q_udtf_chunks",
    "q_variant_json",
    "q_posexplode",
    "q_chunk_docs",
    "q_table_diff",
    # flagship incremental write/rebuild ops (rows-only ★)
    "q_delta_append",
    "q_partitioned_write",
    "q_replace_where",
    "q_backfill",
    "q_multi_hop",
]


def _rotate(front: list[str]) -> None:
    missing = [q for q in front if q not in QUERIES]
    assert not missing, f"rotation references unknown qids: {missing}"
    ordered = {q: QUERIES[q] for q in front}
    ordered.update({q: s for q, s in QUERIES.items() if q not in ordered})
    # Preserve dict identity — __spark_entry__ and tests hold references.
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R3_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
