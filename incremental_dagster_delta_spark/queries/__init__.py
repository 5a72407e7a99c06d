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
from incremental_dagster_delta_spark.queries import graph  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import selection  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import bpe  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import docsim  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import linalg  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import lm  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import unigram_lm  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import quality_clf  # noqa: E402,F401

# --------------------------------------------------------------------------
# Driver-visibility rotation. The driver's correctness sweep covers the
# FIRST 50 registry entries each round, so ordering is a coverage budget:
# every oracle-backed qid should earn a driver-verified row at least once
# across rounds. After r7, the stalest green rows are the 72-qid r3/r4
# cohort; the r7 verdict's ask is to EMPTY the r3 set this round and
# finish the r4 remainder in r9. The r8 front is therefore: (a) the new
# qid, (b) re-confirms for every code path changed this round — the
# tokenizer OOV-fallback + seg-join unhinting (bpe/unigram encode +
# fertility), the TF-IDF-class broadcast unhinting (q_tfidf/q_rp_embed/
# q_topic_terms/q_unigram_surprisal/q_surprisal_buckets/q_pmi_bigrams),
# the append_batch lease rework (q_delta_append/q_exactly_once_publish/
# q_multi_hop), and the shared ascending-peel refactor (q_kcore/
# q_kcore_corpus) — (c) the r3 cohort (q_tfidf among them). All seven
# new qids take front slots immediately (the "new qid = next-round
# debt" rule); the trained-classifier trio, the temperature-mixture
# qid, and the Kneser-Ney LM landed late in the round, so five r3
# re-confirms (q_string_funcs, q_array_funcs, q_posexplode,
# q_regex_parse, q_unpivot — pure function batteries on code untouched
# since r1) were displaced and join the r4 cohort (q_drip_source and
# peers) in r9's burn-down per the r7 verdict. Everything else rotating out holds a green r5-r7 row on an
# unchanged code path.
# --------------------------------------------------------------------------
_R8_FRONT = [
    # (a) new this round — first driver rows
    "q_substring_dedup",
    "q_dup_span_fraction",
    "q_quality_classifier",
    "q_quality_scores",
    "q_quality_holdout",
    "q_mixture_temperature",
    "q_kn_perplexity",
    # (b) code paths changed this round
    "q_bpe_encode",
    "q_tokenizer_fertility",
    "q_unigram_encode",
    "q_unigram_fertility",
    "q_rp_embed",
    "q_topic_terms",
    "q_unigram_surprisal",
    "q_surprisal_buckets",
    "q_pmi_bigrams",
    "q_delta_append",
    "q_exactly_once_publish",
    "q_multi_hop",
    "q_kcore",
    "q_kcore_corpus",
    # (c) the full r3 cohort — stalest rows in the registry (q_tfidf is
    # also a changed path this round)
    "q_above_avg_customers",
    "q_backfill",
    "q_chunk_docs",
    "q_csv_source",
    "q_cube_agg",
    "q_custdist_outer",
    "q_excess_shippers",
    "q_exists_sql",
    "q_file_listing",
    "q_grouped_pandas",
    "q_grouping_sets",
    "q_hash_split",
    "q_jsonl_source",
    "q_lead_lag",
    "q_min_cost_supplier",
    "q_notin_filter",
    "q_orc_source",
    "q_partitioned_write",
    "q_prefilter_semi_join",
    "q_profit_by_nation_year",
    "q_promo_ratio",
    "q_salted_agg",
    "q_sql_udf",
    "q_table_diff",
    "q_tfidf",
    "q_token_pack",
    "q_udtf_chunks",
    "q_wholetext_ingest",
    "q_window_battery",
]


# --------------------------------------------------------------------------
# Per-query shuffle sizing. These qids materialize their result INSIDE the
# call (materialize_release / localCheckpoint), so a scoped
# spark.sql.shuffle.partitions takes effect for their whole execution.
# Each shuffles an exploded view of one small corpus table (shingles,
# tokens, LSH bands, IVF cells); sizing the partition count from that
# table's on-disk bytes removes the per-task constant costs that dominate
# sub-GB shuffles under a session-wide default (see tables.sized_shuffle
# — measured 2.3× on the q_ngram_jaccard pair join). q_ngram_jaccard and
# q_doc_similarity scope themselves inside their shared pair-finding
# helpers (ngram_jaccard_pairs / tfidf_cosine_pairs).
# --------------------------------------------------------------------------
# A/B-measured at sf0.1 against the session default (median of 3):
# q_containment 7.05→2.14 s, q_bpe_encode 4.33→3.24, q_ngram_jaccard_prefix
# 3.50→3.16, q_dedup_minhash 2.03→1.98; round 8: q_substring_dedup
# 3.04→2.60, q_dup_span_fraction 3.08→2.68 (fan_out on the raw docs was
# also tried there and LOST, 3.0→4.5 — the family is shuffle-task-
# overhead bound, not explode-parallelism bound). Qids where the scoped
# count LOST (array-verify or window stages that want full-core
# parallelism more than low task overhead: q_incremental_dedup
# 2.58→4.88, q_semdedup, q_boilerplate_lines, q_dedup_lines,
# q_dedup_embedding) stay unwrapped.
_SIZED_SHUFFLE = {
    "q_ngram_jaccard_prefix": "documents",
    "q_dedup_minhash": "documents",
    "q_containment": "documents",
    "q_bpe_encode": "documents",
    "q_substring_dedup": "documents",
    "q_dup_span_fraction": "documents",
}


def _sized(fn, table: str):
    import functools

    from incremental_dagster_delta_spark.tables import load_table, sized_shuffle

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        with sized_shuffle(spark, load_table(spark, sf_dir, table)):
            return fn(spark, sf_dir)

    return wrapped


for _name, _table in _SIZED_SHUFFLE.items():
    QUERIES[_name].fn = _sized(QUERIES[_name].fn, _table)


def _rotate(front: list[str]) -> None:
    missing = [q for q in front if q not in QUERIES]
    assert not missing, f"rotation references unknown qids: {missing}"
    ordered = {q: QUERIES[q] for q in front}
    ordered.update({q: s for q, s in QUERIES.items() if q not in ordered})
    # Preserve dict identity — __spark_entry__ and tests hold references.
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R8_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
