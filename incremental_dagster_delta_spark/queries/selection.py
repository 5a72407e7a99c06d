"""Data selection by importance weighting (DSIR-style).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): score every raw document by how much more
likely its hashed n-gram bag is under a TARGET distribution than under
the RAW distribution, then resample proportionally to the weight. The
estimator needs only two bag-of-features models:

    log w(doc) = Σ_tokens [ log p_target(bucket(tok)) − log p_raw(bucket(tok)) ]

Hashed buckets (here: first 3 hex nibbles of md5(token) → 4096 features,
identical bytes on Spark and DuckDB so the oracle can reproduce the
hash) with add-one smoothing. Scale shape: one token explode, one
(doc, bucket) count, one 4096-row ratio table that BROADCASTS to every
executor — the per-doc scoring join never shuffles the corpus side, so
the whole operator is ~two map-side-combinable aggregations at 100 TB.
The target model here is the ``lang = 'en'`` slice standing in for "a
trusted high-quality corpus"; any predicate slots in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

N_BUCKETS = 4096  # 3 hex nibbles
TARGET_LANG = "en"

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py

_DSIR_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, lang, substring(md5(tok), 1, 3) AS bucket
      FROM (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM documents)
    ),
    doc_bucket AS (
      SELECT doc_id, bucket, COUNT(*) AS c FROM tok GROUP BY doc_id, bucket
    ),
    raw_counts AS (SELECT bucket, COUNT(*) AS c_raw FROM tok GROUP BY bucket),
    tgt_counts AS (
      SELECT bucket, COUNT(*) AS c_tgt FROM tok WHERE lang = '{TARGET_LANG}' GROUP BY bucket
    ),
    totals AS (
      SELECT (SELECT COUNT(*) FROM tok) AS n_raw,
             (SELECT COUNT(*) FROM tok WHERE lang = '{TARGET_LANG}') AS n_tgt
    ),
    ratio AS (
      SELECT r.bucket,
             ln((COALESCE(t.c_tgt, 0) + 1.0) / (tt.n_tgt + {N_BUCKETS}))
           - ln((r.c_raw + 1.0) / (tt.n_raw + {N_BUCKETS})) AS log_ratio
      FROM raw_counts r
      LEFT JOIN tgt_counts t USING (bucket)
      CROSS JOIN totals tt
    )
    SELECT d.doc_id,
           CAST(ROUND(SUM(d.c * ratio.log_ratio), 4) AS DOUBLE) AS log_weight,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens
    FROM doc_bucket d JOIN ratio USING (bucket)
    GROUP BY d.doc_id
"""


@query("q_dsir_weights", tags=("curation", "sampling", "llm"), oracle=_DSIR_ORACLE)
def q_dsir_weights(spark, sf_dir):
    """Per-document DSIR log importance weight of the raw corpus toward
    the ``lang='en'`` target slice, over 4096 hashed unigram features
    with add-one smoothing. The 4096-row log-ratio table is broadcast —
    the corpus-side scoring join is map-only; the only wide shuffles are
    the (doc, bucket) and bucket counts, both map-side combinable."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    tok = d.select(
        "doc_id", "lang", F.explode(toks).alias("tok")
    ).select(
        "doc_id", "lang", F.substring(F.md5(F.col("tok").cast("binary")), 1, 3).alias("bucket")
    ).persist()
    # ^ persisted: tok feeds FOUR aggregations below — unpersisted, the
    # corpus tokenize + md5 bucketing ran four times (r15 review; the
    # lines.py pattern)
    doc_bucket = tok.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    raw_counts = tok.groupBy("bucket").agg(F.count("*").alias("c_raw"))
    tgt_counts = (
        tok.where(F.col("lang") == TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").alias("c_tgt"))
    )
    totals = tok.agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("lang") == TARGET_LANG, 1)).alias("n_tgt"),
    )
    ratio = (
        raw_counts.join(tgt_counts, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.coalesce("c_tgt", F.lit(0)) + 1.0) / (F.col("n_tgt") + N_BUCKETS))
                - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + N_BUCKETS))
            ).alias("log_ratio"),
        )
    )
    from incremental_dagster_delta_spark.tables import materialize_release

    out = (
        doc_bucket.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("c") * F.col("log_ratio")), 4).alias("log_weight"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    return materialize_release(out, tok)
