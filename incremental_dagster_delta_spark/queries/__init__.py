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

# --------------------------------------------------------------------------
# Driver-visibility rotation. The driver's correctness sweep covers the
# FIRST 50 registry entries each round, so ordering is a coverage budget:
# every oracle-backed qid should earn a driver-verified row at least once
# across rounds. After round 5, 18 qids registered after that round's
# front-50 froze had never been driver-sampled, and 4 qids shipped no
# oracle at all — round 6 closes both gaps. Front-loads: the 18
# never-driver-checked qids (all oracle-backed, all green in the local
# driver-faithful harness), the 4 newly-oracled qids (literal-scenario
# VALUES oracles landed this round — their only prior rows were
# `no_oracle` reds), q_cosine_ann_ivf (full DuckDB CTE oracle landed in
# r5 but its only driver row predates it), changed-code-path
# re-confirmations (rationale inline), and a re-confirmation sample of
# the round-5 first-checks. With this list every registered qid has
# been driver-sampled at least once across rounds 2-6 EXCEPT the
# round-5 first-checks that rotate out this round — each of those
# already holds a green r5 row.
# --------------------------------------------------------------------------
_R6_FRONT = [
    # 18 registered-after-the-r5-freeze qids — first driver rows
    "q_topic_terms",
    "q_knn_eval",
    "q_exactly_once_publish",
    "q_schema_evolution",
    "q_partition_delete",
    "q_time_travel",
    "q_lateral_topn",
    "q_binary_source",
    "q_quantile_bins",
    "q_auc_eval",
    "q_calibration_bins",
    "q_mutual_info",
    "q_rfm_features",
    "q_rolling_median",
    "q_seasonality_profile",
    "q_pit_join",
    "q_quarantine_split",
    "q_ndcg_eval",
    # 4 formerly oracle-less qids — literal-scenario oracles this round
    "q_pca_topk",
    "q_approx_sketches",
    "q_dedup_simhash",
    "q_cosine_ann_rplsh",
    # oracle landed r5 after its only (r2, no_oracle) driver row
    "q_cosine_ann_ivf",
    # changed-code-path re-confirmations: q_dedup_minhash and
    # q_ngram_jaccard_prefix last earned rows in r2, BEFORE r5 wrapped
    # them in sized_shuffle — and sized_shuffle's byte-sizing changed
    # again this round (URI parsing), so all four wrapped qids plus the
    # two helpers that scope themselves re-confirm; the five streaming
    # qids re-confirm under the new awaitTermination handling.
    "q_dedup_minhash",
    "q_ngram_jaccard_prefix",
    "q_containment",
    "q_bpe_encode",
    "q_ngram_jaccard",
    "q_doc_similarity",
    "q_stream_join",
    "q_stream_dedup",
    "q_quota_stateful",
    "q_sessionize_stateful",
    "q_late_data",
    # re-confirmation sample of round-5 first-checks / fixes
    "q_gram_matrix",
    "q_replace_where",
    "q_ann_ivf_pq",
    "q_dedup_fuzzy",
    "q_triangle_count",  # cosupplier_edges factored out this round
    "q_cosine_topk",
    "q_pq_codes",
    # new this round: DIMSUM-sampled doc similarity (md5-uniform sampling
    # both engines compute identically), bigram-LM perplexity, vocabulary
    # coverage, Doulion-sampled triangle estimate, n-gram novelty — first
    # driver rows. (q_embedding_quantize, q_funnel_multistep, q_pagerank
    # and q_semdedup rotate out to make room; all hold green r5/r4 rows
    # and their code paths are unchanged this round.)
    "q_doc_similarity_gamma",
    "q_bigram_perplexity",
    "q_vocab_coverage",
    "q_triangle_doulion",
    "q_ngram_novelty",
    "q_kcore",
    "q_weighted_sample",
    "q_tokenizer_fertility",
    "q_mrr_eval",
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
# 3.50→3.16, q_dedup_minhash 2.03→1.98. Qids where the scoped count LOST
# (array-verify or window stages that want full-core parallelism more than
# low task overhead: q_incremental_dedup 2.58→4.88, q_semdedup,
# q_boilerplate_lines, q_dedup_lines, q_dedup_embedding) stay unwrapped.
_SIZED_SHUFFLE = {
    "q_ngram_jaccard_prefix": "documents",
    "q_dedup_minhash": "documents",
    "q_containment": "documents",
    "q_bpe_encode": "documents",
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


_rotate(_R6_FRONT)

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
