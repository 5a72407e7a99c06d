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
from incremental_dagster_delta_spark.queries import kmeans  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import mmr  # noqa: E402,F401

# --------------------------------------------------------------------------
# Driver-visibility rotation. The driver's correctness sweep covers the
# FIRST 50 registry entries each round, so ordering is a coverage budget:
# every oracle-backed qid should earn a driver-verified row at least once
# across rounds, and no row should age past ~6 rounds. After the r13
# sweep the stalest rows were the 13 r7-aged re-confirms (VERDICT r13
# #1), which lead the r14 front; r14's new operator comes next, and the
# 36 alphabetically-first of the 50 r8-aged rows fill to exactly 50.
# The 14 r8 rows left for the r15 front: q_sql_udf, q_substring_dedup,
# q_surprisal_buckets, q_table_diff, q_tfidf, q_token_pack,
# q_tokenizer_fertility, q_topic_terms, q_udtf_chunks, q_unigram_encode,
# q_unigram_fertility, q_unigram_surprisal, q_wholetext_ingest,
# q_window_battery.
# --------------------------------------------------------------------------
_R14_FRONT = [
    # (a) new this round — first driver rows
    "q_bitext_mine",
    # (b) the 13 r7-aged re-confirms (every row then ≤7 rounds old)
    "q_set_ops",
    "q_sql_frontend",
    "q_subword_counts",
    "q_suffix_filter",
    "q_text_quality",
    "q_token_counts",
    "q_top_orders",
    "q_topk",
    "q_unigram_lm",
    "q_vocab_coverage",
    "q_window_running",
    "q_winnow_fingerprint",
    "q_word_length",
    # (c) the 36 alphabetically-first r8-aged rows, filling to exactly 50
    "q_above_avg_customers",
    "q_backfill",
    "q_bpe_encode",
    "q_chunk_docs",
    "q_csv_source",
    "q_cube_agg",
    "q_custdist_outer",
    "q_delta_append",
    "q_dup_span_fraction",
    "q_exactly_once_publish",
    "q_excess_shippers",
    "q_exists_sql",
    "q_file_listing",
    "q_grouped_pandas",
    "q_grouping_sets",
    "q_hash_split",
    "q_jsonl_source",
    "q_kcore",
    "q_kcore_corpus",
    "q_kn_perplexity",
    "q_lead_lag",
    "q_min_cost_supplier",
    "q_mixture_temperature",
    "q_multi_hop",
    "q_notin_filter",
    "q_orc_source",
    "q_partitioned_write",
    "q_pmi_bigrams",
    "q_prefilter_semi_join",
    "q_profit_by_nation_year",
    "q_promo_ratio",
    "q_quality_classifier",
    "q_quality_holdout",
    "q_quality_scores",
    "q_rp_embed",
    "q_salted_agg",
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
    # round 9 late: the CMS build/exact shuffles are exploded-documents
    # shaped; A/B at sf0.1: 2.23 → 1.07 s (median of 5).
    "q_cms_heavy_hitters": "documents",
    # round 9: the Lloyd's loop is ~25 tiny stages whose cost is task
    # overhead; sizing from the embeddings bytes (≈8 partitions at
    # sf0.1) also sets _prepared_vec's split target. A/B in kmeans.py.
    # The trained-IVF qid runs the same loop inside.
    "q_kmeans_centroids": "embeddings",
    "q_cosine_ann_ivf_trained": "embeddings",
    "q_pq_train": "embeddings",
    "q_kmeans_maximin": "embeddings",
    # round 11: the mini-batch fold is the same tiny-stage profile as
    # the trainer it derives from.
    "q_kmeans_minibatch": "embeddings",
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


_rotate(_R14_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
