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
# across rounds. Round 11 executes the carried r10 burn-down (r10 stalled
# with zero rotation): the round's NEW qids, the three rewritten-plan
# qids (q_ndcg_eval / q_mrr_eval / q_offset_slice), the FULL 32-qid r5
# cohort (five rounds without a driver row), and as many of the oldest
# r6 qids as the remaining slots hold. The rest of the r6 cohort is
# r12's tail.
# --------------------------------------------------------------------------
_R11_FRONT = [
    # (a) new this round — first driver rows (new qids outrank
    # re-confirms for front slots, as established r9; each new qid
    # displaces the tail r6 re-confirm it replaced — q_stream_join,
    # q_late_data, q_sessionize_stateful, q_quota_stateful,
    # q_stream_dedup, q_gram_matrix, q_doc_similarity, q_ann_ivf_pq,
    # q_pq_codes, q_containment, q_replace_where and q_cosine_topk move
    # to the r12 tail, keeping their green r6 rows).
    "q_kmeans_minibatch",
    "q_dedup_dhash",
    "q_bm25_incremental",
    "q_hll_incremental",
    "q_cc_incremental",
    "q_shot_boundaries",
    "q_quantile_incremental",
    "q_exact_median",
    "q_kmv_source_overlap",
    "q_dhash_incremental",
    "q_decayed_counts",
    "q_coordinated_sample",
    # (a continued) session-2 additions. Twenty-seven new qids landed this
    # session (ACF, CUSUM, RRF fusion, matryoshka eval, deletion
    # vectors, recursive CTE, neighbor-Jaccard, incremental reservoir,
    # incremental SemDeDup, Holt smoothing, Pareto frontier, Zipf fit,
    # RBO, KS drift, centroid separation, change data feed, chi² mix
    # drift, bitemporal reads, rolling distinct, rolling CMS, SQL pipe
    # syntax, collation grouping, MAP battery, generator null
    # semantics, FK audit, Benford, FD profiling — all with
    # sf0.001+sf0.01 parity runs); only the EIGHT most
    # seam-critical take front slots, because every extra new-qid slot
    # displaces an r5-cohort re-confirm (the round's #1 ask). The others
    # (q_neighbor_jaccard, q_holt_smoothing, q_pareto_frontier,
    # q_zipf_fit, q_rbo_eval, q_ks_drift, q_centroid_separation,
    # q_change_data_feed, q_chi2_drift, q_bitemporal,
    # q_rolling_distinct, q_rolling_cms, q_sql_pipe, q_collation_group,
    # q_map_funcs, q_generator_nulls, q_fk_audit, q_benford,
    # q_fd_profile) plus the three r6 picks and the displaced r5 tail
    # (q_compaction_stats, q_group_impute, q_interval_merge,
    # q_event_transitions, q_skew_report) head r12's front. Net: 27 of
    # the 32 r5-cohort qids get their overdue driver rows this round.
    "q_autocorrelation",
    "q_cusum_changepoint",
    "q_rrf_fusion",
    "q_matryoshka_eval",
    "q_deletion_vectors",
    "q_recursive_cte",
    "q_reservoir_incremental",
    "q_semdedup_incremental",
    # (b) changed-path this round: the unpartitioned-window scale-killer
    # rewrites (VERDICT r10 "What's wrong" #2/#3/#4). q_ndcg_eval and
    # q_mrr_eval are simultaneously the stalest-r6 priority picks.
    "q_ndcg_eval",
    "q_mrr_eval",
    "q_offset_slice",
    # (b) the full 32-qid r5 cohort — five rounds without a driver row.
    "q_pivot_counts",
    "q_refresh_overwrite",
    "q_embedding_quantize",
    "q_winsorize",
    "q_regression_by_group",
    "q_kl_drift",
    "q_cdc_apply",
    "q_char_entropy",
    "q_cluster_size_histogram",
    "q_dup_rate_by_source",
    "q_column_stats",
    "q_media_resize",
    "q_funnel_multistep",
    "q_bootstrap_ci",
    "q_bpe_merges",
    "q_zorder_layout",
    "q_bucketed_join",
    "q_embedding_outliers",
    "q_pagerank",
    "q_hard_negatives",
    "q_class_balance",
    "q_ts_similarity",
    "q_expectations",
    "q_mad_outliers",
    "q_skew_join",
    "q_ab_test",
    "q_ts_anomaly",
    "q_compaction_stats",
    "q_group_impute",
    "q_interval_merge",
    "q_event_transitions",
    "q_skew_report",
    # (c) the next-oldest r6 qids in registry order, as many as the
    # new-qid slots above leave room for; the rest of the r6 cohort
    # (including the displaced re-confirms named above) is r12's tail.
    "q_ngram_jaccard",
    "q_ngram_jaccard_prefix",
    "q_dedup_minhash",
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


_rotate(_R11_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
