"""Training-data preparation operators: deterministic splits and
sequence packing (SURVEY.md §2.5 extensions).

Two steps every LLM training pipeline runs after dedup/filtering:

- **hash split** — assign each document to train/val/test by a stable
  content-independent hash of its id. Hash-based assignment (vs random)
  is reproducible across runs, engines, and backfills, and survives
  re-sharding: a doc keeps its split forever. md5 is used because both
  engines implement it identically (xxhash64 is Spark-only).
- **sequence packing** — greedily pack documents into fixed token-budget
  bins (next-fit, in deterministic doc_id order) so training batches
  waste no padding. A sequential scan per group: Spark runs it as
  ``applyInPandas`` over the ``source`` grouping (parallel across
  groups); the oracle replays the identical recurrence as a DuckDB
  recursive CTE. At 100 TB you'd sub-shard each source by a hash bucket
  (source, xxhash64(doc_id) % k) to bound group size — the packing
  quality loss is negligible and the parallelism becomes k× sources.
"""

import pandas as pd
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py

PACK_BUDGET = 256  # tokens per training sequence bin


@query(
    "q_hash_split",
    tags=("llm", "sampling"),
    oracle="""
    SELECT split, lang,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             CASE
               WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND '9'
                 OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('a', 'b')
               THEN 'train'
               WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    GROUP BY split, lang
    """,
)
def q_hash_split(spark, sf_dir):
    """Deterministic 12/2/2-nibble train/val/test split on
    md5(doc_id) — first hex nibble 0-b → train (75%), c-d → val
    (12.5%), e-f → test (12.5%) — aggregated per (split, lang) to
    verify both assignment and stratification. Pure scan + map-side
    partial agg; no shuffle beyond the tiny (split × lang) domain."""
    d = t(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(nib.between("0", "9") | nib.isin("a", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "doc_id", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "q_token_pack",
    bench=True,
    tags=("llm", "pandas"),
    oracle=f"""
    WITH RECURSIVE
    docs AS (
      SELECT source, doc_id,
             len({_TOKS_SQL}) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack(source, rn, doc_id, n_tokens, bin_id, fill) AS (
      SELECT source, rn, doc_id, n_tokens, 0, n_tokens FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.fill + d.n_tokens > {PACK_BUDGET}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + d.n_tokens > {PACK_BUDGET}
                  THEN d.n_tokens ELSE p.fill + d.n_tokens END
      FROM pack p JOIN docs d ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT source, doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(bin_id AS BIGINT) AS bin_id
    FROM pack
    """,
)
def q_token_pack(spark, sf_dir):
    """Next-fit sequence packing: walk each source's documents in
    doc_id order, open a new bin whenever the running token count would
    exceed PACK_BUDGET. Token counts are computed JVM-side; only the
    tiny (doc_id, n_tokens) frame crosses into Arrow for the inherently
    sequential per-group scan."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    counted = d.select("source", "doc_id", F.size(toks).cast("long").alias("n_tokens"))

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, bin_id = [], 0, 0
        for i, nt in enumerate(pdf["n_tokens"]):
            if i == 0:
                fill = nt
            elif fill + nt > PACK_BUDGET:
                bin_id += 1
                fill = nt
            else:
                fill += nt
            bins.append(bin_id)
        pdf["bin_id"] = bins
        return pdf[["source", "doc_id", "n_tokens", "bin_id"]]

    return counted.groupBy("source").applyInPandas(
        pack_group, "source string, doc_id long, n_tokens long, bin_id long"
    )


# --- deterministic class balancing ------------------------------------------


@query(
    "q_class_balance",
    tags=("training", "llm", "sampling"),
    oracle="""
    WITH counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ), m AS (SELECT MIN(n) AS m FROM counts),
    ranked AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
             ) AS rk
      FROM embeddings
    )
    SELECT vec_id, label, CAST(rk AS BIGINT) AS rank
    FROM ranked, m
    WHERE rk <= m.m
    """,
)
def q_class_balance(spark, sf_dir):
    """Deterministic class balancing: undersample every label to the
    minority-class count, picking rows by md5(vec_id) order — a seedless
    shuffle that is reproducible across runs, engines, and re-shards
    (the q_hash_split determinism trick applied to sampling order). The
    balanced subset is therefore STABLE: adding new rows to one class
    never changes which existing rows of another class are kept. One
    window per label plus a 1-row broadcast of the minority count; no
    collect, no RNG."""
    e = t(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = counts.agg(F.min("n").alias("m"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("label").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    return (
        e.select("vec_id", "label")
        .withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .where(F.col("rank") <= F.col("m"))
        .select("vec_id", "label", F.col("rank").cast("long").alias("rank"))
    )


# --- concat-and-chunk sequence boundaries -------------------------------------

SEQ_LEN = 256  # tokens per training sequence (chunked, GPT-style)


def _global_weighted_cumsum(df, order_cols, weight_col: str):
    """df + ``_start``: the EXCLUSIVE global running sum of
    ``weight_col`` under ORDER BY ``order_cols`` — the weighted
    generalization of :func:`analytics._global_order`, and like it built
    without a single-partition sort: range-repartition on the key
    (disjoint ordered ranges, one per task), cumsum WITHIN each
    partition, add each partition's broadcast weight offset. The
    partition-less window runs over numPartitions aggregate rows only.
    The input is localCheckpointed once so the sampled range boundaries
    cannot shift between the offsets subtree and the final plan.
    ``order_cols`` MUST be a UNIQUE key: with ties the per-row prefix
    sums are a valid disjoint packing but the assignment among tied rows
    is not deterministic across runs — the helper therefore REFUSES tied
    keys at execution time (VERDICT r13: loud beats silently unstable
    for an exported helper). The check is free: equal keys always land
    in the same range partition, so a per-partition ``lag`` comparison
    inside the window stage the cumsum already pays catches every
    global tie — no extra scan, shuffle, or action."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    npart = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        df.repartitionByRange(npart, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = ranged.groupBy("_pid").agg(F.sum(weight_col).alias("_w"))
    w_before = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid", F.coalesce(F.sum("_w").over(w_before), F.lit(0)).alias("_off")
    )
    # ROWS frame, not the default RANGE frame: RANGE includes all ORDER
    # BY peers, which double-counts tied keys into every peer's sum
    w_local = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    key = F.struct(*[F.col(c) for c in order_cols])
    w_order = Window.partitionBy("_pid").orderBy(*order_cols)
    # lag(NULL) on each partition's first row eqNullSafe's to False —
    # never a tie; assert_true throws task-side with this message
    no_tie = ~F.lag(key).over(w_order).eqNullSafe(key)
    guard = F.assert_true(
        no_tie,
        F.lit(
            "_global_weighted_cumsum: order_cols "
            f"{list(order_cols)} must form a UNIQUE key — a tied key makes "
            "the packing assignment nondeterministic across runs"
        ),
    )
    running = F.sum(weight_col).over(w_local) - F.col(weight_col) + F.col("_off")
    # guard is always NULL (or the task throws); folding it into _start
    # keeps Catalyst from pruning the unused assertion column away
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("_start", F.when(guard.isNull(), running).cast("long"))
        .drop("_pid", "_off")
    )


@query(
    "q_concat_chunk",
    tags=("llm", "training"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS start_off
      FROM d WHERE n_tokens > 0
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_off AS BIGINT) AS start_off,
           CAST(start_off // {SEQ_LEN} AS BIGINT) AS first_seq,
           CAST((start_off + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS last_seq,
           (start_off // {SEQ_LEN}) <> ((start_off + n_tokens - 1) // {SEQ_LEN})
             AS crosses_boundary
    FROM c
    """,
)
def q_concat_chunk(spark, sf_dir):
    """Concat-and-chunk sequence boundaries (the GPT-style data-loader
    contract): all documents form ONE token stream in doc_id order, cut
    into fixed SEQ_LEN sequences; each document reports its global token
    offset and which sequences it lands in. This is the packing mode
    actually used at pretraining scale — q_token_pack's next-fit bins
    need a sequential scan per group, while the chunk boundary of every
    document here depends only on the global prefix sum of token counts,
    which distributes exactly (:func:`_global_weighted_cumsum` — range
    repartition + per-partition cumsum + numPartitions broadcast
    offsets, no single-partition sort at any scale). Downstream, a
    loader uses (first_seq, last_seq) to route shards, and
    crosses_boundary counts the attention-masking fragmentation the
    chunking introduces."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    counted = d.select("doc_id", F.size(toks).cast("long").alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    c = _global_weighted_cumsum(counted, ["doc_id"], "n_tokens")
    first = F.floor(F.col("_start") / SEQ_LEN).cast("long")
    last = F.floor((F.col("_start") + F.col("n_tokens") - 1) / SEQ_LEN).cast("long")
    return c.select(
        "doc_id",
        "n_tokens",
        F.col("_start").alias("start_off"),
        first.alias("first_seq"),
        last.alias("last_seq"),
        (first != last).alias("crosses_boundary"),
    )
