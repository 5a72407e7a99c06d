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
# across rounds, and no row should age past ~6 rounds. After the r12
# sweep all 261 qids have a driver row; the r13 front = the round's new
# operator + the 20 re-confirms whose rows date to r6 (staged in r12's
# comment, VERDICT r12 #1 — q_pca_topk and q_dedup_simhash matter most:
# their oracles changed character since r6) + the 28 alphabetically-first
# of the 41 r7-aged rows. The 13 r7 rows left for the r14 tail:
# q_set_ops, q_sql_frontend, q_subword_counts, q_suffix_filter,
# q_text_quality, q_token_counts, q_top_orders, q_topk, q_unigram_lm,
# q_vocab_coverage, q_window_running, q_winnow_fingerprint,
# q_word_length.
# --------------------------------------------------------------------------
_R13_FRONT = [
    # (a) new this round — first driver rows
    "q_bloom_paragraph_dedup",
    "q_concat_chunk",
    # (b) the 20 r6-aged re-confirms (every row then ≤7 rounds old)
    "q_dedup_fuzzy",
    "q_dedup_simhash",
    "q_doc_similarity_gamma",
    "q_knn_eval",
    "q_lateral_topn",
    "q_mutual_info",
    "q_ngram_novelty",
    "q_partition_delete",
    "q_pca_topk",
    "q_pit_join",
    "q_quantile_bins",
    "q_quarantine_split",
    "q_rfm_features",
    "q_rolling_median",
    "q_schema_evolution",
    "q_seasonality_profile",
    "q_time_travel",
    "q_triangle_count",
    "q_triangle_doulion",
    "q_weighted_sample",
    # (c) the 28 alphabetically-first r7-aged rows, filling to exactly 50
    "q_bigram_perplexity",
    "q_date_format",
    "q_date_parts",
    "q_dedup_cluster",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_near_keep",
    "q_dedup_prefix_key",
    "q_dedup_survivors",
    "q_distinct",
    "q_doc_fingerprint",
    "q_dsir_weights",
    "q_embedding_norm",
    "q_frame_sample",
    "q_iso_week",
    "q_lang_id",
    "q_leakage_free_split",
    "q_lit_partition_cols",
    "q_multimodal_features",
    "q_new_file_antijoin",
    "q_pricing_summary",
    "q_rank_in_group",
    "q_recall_at_k",
    "q_region_revenue",
    "q_reverse",
    "q_rollup_agg",
    "q_row_construction",
    "q_semi_join",
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


_rotate(_R13_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
