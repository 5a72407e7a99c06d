"""Corpus assembly & accounting operators (SURVEY.md §2.5, round 3).

The bookkeeping layer of a training-data pipeline — what gets reported,
planned and packed once filtering/dedup is done:

- **corpus stats** — per-source doc/token/char counts and corpus shares;
  the accounting table every data card and mixture decision starts from.
- **mixture plan** — turn target source proportions + a token budget into
  per-source epoch multipliers (the "how many passes over Wikipedia vs
  one pass over CommonCrawl" computation).
- **sequence-length buckets** — power-of-two token-length histogram, the
  input to batch-shape planning (bucketed batching wastes less padding
  than global max-length).
- **SemDeDup-style cell-scoped embedding dedup** — assign vectors to IVF
  cells (broadcast centroids, map-side argmin), then find duplicate pairs
  (cos ≥ threshold) WITHIN cells only and keep the min vec_id. The
  all-pairs comparison is confined to a cell, so cost is Σ|cell|², not
  N² — the SemDeDup recipe (Abbas et al. 2023) re-expressed as two
  narrow Spark joins.

All four hash-match DuckDB oracles. The SemDeDup oracle is the GLOBAL
exact dedup decision — equal to the cell-scoped result here because
duplicate pairs are identical vectors, which always land in the same cell
(deterministic argmin); corpora whose near-dups straddle cell boundaries
would diverge, which is SemDeDup's documented recall trade.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py


# --- corpus accounting -------------------------------------------------------


@query(
    "q_corpus_stats",
    tags=("assembly", "llm"),
    oracle=f"""
    WITH per_doc AS (
      SELECT source, len({_TOKS_SQL}) AS n_toks, length(text) AS n_chars FROM documents
    ),
    agg AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_chars,
           CAST(ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 4) AS DOUBLE)
               AS token_share
    FROM agg
    """,
)
def q_corpus_stats(spark, sf_dir):
    """Per-source corpus accounting: doc/token/char totals + each
    source's token share. One partial-agg shuffle on source; the share
    divides by a windowed grand total (tiny post-agg table — the window
    runs over |sources| rows, not the corpus)."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    agg = (
        d.select("source", F.size(toks).alias("n_toks"), F.length("text").alias("n_chars"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    total = Window.partitionBy()
    return agg.withColumn(
        "token_share",
        F.round(F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total), 4).cast("double"),
    )


# --- mixture planning --------------------------------------------------------

# Target mixture proportions and total token budget for the assembled
# corpus. Sources not listed share the remainder equally.
_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2}
_TOKEN_BUDGET = 1_000_000
# The remainder share is THE SAME Python double on both engines — the
# oracle previously hardcoded 0.1 while Spark computed
# 1.0 - (0.4 + 0.3 + 0.2) = 0.10000000000000009 (r15 review).
_MIX_REMAINDER = 1.0 - sum(_MIX_TARGETS.values())


@query(
    "q_mixture_plan",
    tags=("assembly", "llm"),
    oracle=f"""
    WITH avail AS (
      SELECT source, CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT source, avail_tokens,
             CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 0.2
                  ELSE {_MIX_REMAINDER!r} / greatest((SELECT COUNT(*) FROM avail WHERE source NOT IN ('src0','src1','src2')), 1)
             END AS target_share
      FROM avail
    )
    SELECT source, avail_tokens,
           CAST(ROUND(target_share, 4) AS DOUBLE) AS target_share,
           -- floor(x + 0.5), not CAST: Spark's double->BIGINT cast
           -- truncates while DuckDB's rounds-to-nearest (r15 review;
           -- the q_mixture_temperature device)
           CAST(floor(target_share * {_TOKEN_BUDGET} + 0.5) AS BIGINT) AS target_tokens,
           CAST(ROUND(target_share * {_TOKEN_BUDGET} / avail_tokens, 4) AS DOUBLE) AS epochs
    FROM t
    """,
)
def q_mixture_plan(spark, sf_dir):
    """Mixture planning: target proportions × token budget ÷ available
    tokens per source = epoch multiplier (epochs > 1 → upsample/repeat,
    < 1 → subsample). The whole computation runs on the per-source
    aggregate (|sources| rows), so the only corpus-scale work is one
    token-count shuffle; the unlisted-source remainder share is derived
    with a broadcast scalar subquery, no driver collect."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    avail = (
        d.select("source", F.size(toks).alias("n_toks"))
        .groupBy("source")
        .agg(F.sum("n_toks").cast("long").alias("avail_tokens"))
    )
    listed = list(_MIX_TARGETS)
    n_unlisted = avail.where(~F.col("source").isin(listed)).agg(
        F.greatest(F.count("*"), F.lit(1)).alias("n")
    )
    share = F.when(F.col("source") == listed[0], F.lit(_MIX_TARGETS[listed[0]]))
    for s in listed[1:]:
        share = share.when(F.col("source") == s, F.lit(_MIX_TARGETS[s]))
    share = share.otherwise(F.lit(_MIX_REMAINDER) / F.col("n"))
    return (
        avail.crossJoin(F.broadcast(n_unlisted))  # 1-row scalar — broadcast, not a real cross
        .withColumn("target_share_raw", share)
        .select(
            "source",
            "avail_tokens",
            F.round("target_share_raw", 4).cast("double").alias("target_share"),
            F.floor(F.col("target_share_raw") * _TOKEN_BUDGET + 0.5)
            .cast("bigint")
            .alias("target_tokens"),
            F.round(F.col("target_share_raw") * _TOKEN_BUDGET / F.col("avail_tokens"), 4)
            .cast("double")
            .alias("epochs"),
        )
    )


MIX_TEMP_ALPHA = 0.7  # temperature exponent (Conneau & Lample 2019 α)


@query(
    "q_mixture_temperature",
    tags=("assembly", "llm"),
    oracle=f"""
    WITH avail AS (
      SELECT source, CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, avail_tokens,
             CAST(avail_tokens AS DOUBLE) / (SELECT SUM(avail_tokens) FROM avail) AS nat,
             POWER(avail_tokens, {MIX_TEMP_ALPHA})
               / (SELECT SUM(POWER(avail_tokens, {MIX_TEMP_ALPHA})) FROM avail) AS tmp
      FROM avail
    )
    SELECT source, avail_tokens,
           CAST(ROUND(nat, 4) AS DOUBLE) AS nat_share,
           CAST(ROUND(tmp, 4) AS DOUBLE) AS temp_share,
           CAST(FLOOR(tmp * {_TOKEN_BUDGET} + 0.5) AS BIGINT) AS target_tokens,
           CAST(ROUND(tmp * {_TOKEN_BUDGET} / avail_tokens, 4) AS DOUBLE) AS epochs
    FROM p
    """,
)
def q_mixture_temperature(spark, sf_dir):
    """Temperature-scaled mixture rates: sampling shares ∝ (per-source
    token count)^α with α = 0.7 — the standard upweighting of
    low-resource sources against the natural distribution (Conneau &
    Lample 2019; the GPT-3 dataset-weighting shape), reported next to
    the natural share so the rebalancing is visible, plus the resulting
    token targets and epoch multipliers under the fixed budget. Same
    scale shape as q_mixture_plan: one map-side-combinable token-count
    shuffle to the |sources|-row grain, then broadcast scalar totals —
    nothing corpus-sized moves. Float surface: POWER(·, 0.7) crosses
    engines and is rounded to 4 dp on both sides before compare
    (targets use the floor(x+0.5) device on the raw share)."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    avail = (
        d.select("source", F.size(toks).alias("n_toks"))
        .groupBy("source")
        .agg(F.sum("n_toks").cast("long").alias("avail_tokens"))
    )
    tots = avail.agg(
        F.sum("avail_tokens").cast("double").alias("tot_nat"),
        F.sum(F.pow("avail_tokens", F.lit(MIX_TEMP_ALPHA))).alias("tot_tmp"),
    )
    p = avail.crossJoin(F.broadcast(tots)).select(
        "source",
        "avail_tokens",
        (F.col("avail_tokens") / F.col("tot_nat")).alias("nat"),
        (F.pow("avail_tokens", F.lit(MIX_TEMP_ALPHA)) / F.col("tot_tmp")).alias("tmp"),
    )
    return p.select(
        "source",
        "avail_tokens",
        F.round("nat", 4).cast("double").alias("nat_share"),
        F.round("tmp", 4).cast("double").alias("temp_share"),
        F.floor(F.col("tmp") * _TOKEN_BUDGET + 0.5).cast("long").alias("target_tokens"),
        F.round(F.col("tmp") * _TOKEN_BUDGET / F.col("avail_tokens"), 4)
        .cast("double")
        .alias("epochs"),
    )


# --- sequence-length bucketing ----------------------------------------------


@query(
    "q_seq_len_buckets",
    tags=("assembly", "llm"),
    oracle=f"""
    WITH per_doc AS (
      SELECT greatest(len({_TOKS_SQL}), 1) AS n_toks FROM documents
    )
    SELECT CAST(power(2, ceil(log2(n_toks))) AS BIGINT) AS bucket_max_len,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(ROUND(AVG(CAST(n_toks AS DOUBLE)), 4) AS DOUBLE) AS avg_len
    FROM per_doc
    GROUP BY 1
    """,
)
def q_seq_len_buckets(spark, sf_dir):
    """Power-of-two sequence-length histogram: every doc lands in the
    smallest 2^k bucket that fits it — the batch-shape planning input
    (padding waste per bucket is bounded by 2×). Map-only projection +
    one tiny groupBy on the bucket id; log2 on integers ≤ 2⁵³ is exact
    at powers of two in both engines, so the bucket boundaries agree."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(n_toks))).cast("long")
    return (
        d.select(bucket.alias("bucket_max_len"), n_toks.alias("n_toks"))
        .groupBy("bucket_max_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.round(F.avg(F.col("n_toks").cast("double")), 4).cast("double").alias("avg_len"),
        )
    )


# --- SemDeDup: cell-scoped embedding dedup -----------------------------------

SEMDEDUP_COS = 0.999

_COS_SQL = """
    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
    (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
     sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
"""


@query(
    "q_semdedup",
    tags=("assembly", "dedup", "llm"),
    bench=True,
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 8 = 0
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= {SEMDEDUP_COS}
    )
    SELECT vec_id FROM corpus WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
)
def q_semdedup(spark, sf_dir):
    """SemDeDup: semantic dedup scoped to IVF cells. Corpus = embeddings
    plus a re-keyed copy of every 8th vector; broadcast-centroid argmin
    assigns every vector to a cell (map-side, zero shuffle); duplicate
    pairs (cos ≥ 0.999) are searched WITHIN cells only — Σ|cell|² work,
    never N² — and the higher vec_id of each pair is dropped. Oracle is
    the global exact decision, which matches because identical vectors
    always share a cell (see module docstring for the recall caveat on
    boundary-straddling near-dups). The kernel fans the unioned corpus
    out itself (r15 — fanning the input here doubled the partition
    count through the union)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_kept(e)


def semdedup_kept(e, centroids=None):
    """The SemDeDup kernel factored for centroid swapping (r9):
    ``centroids`` is any (centroid_id, ce) table; None = the stride
    sample. The KEPT SET is invariant to the quantizer for exact
    duplicates — identical vectors land in the same cell under any
    argmin — which tests/test_ann.py pins by running the kernel under
    both the stride and the trained centroid tables."""
    from incremental_dagster_delta_spark.queries.similarity import (
        IVF_CENTROID_STRIDE,
        _dot,
        _norm,
        assign_nearest_centroid,
    )
    from incremental_dagster_delta_spark.tables import fan_out, materialize_release

    dupes = (
        e.where(F.col("vec_id") % 8 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    # fan_out AFTER the union: fanning the input out first doubles the
    # partition count through the union (64 + 64 = 128 near-empty
    # partitions at sf0.1 — r15 profile: every downstream stage paid
    # 128 tasks of per-task constants), and the cached assignment
    # inherits whatever width the union has.
    corpus = fan_out(e.unionByName(dupes), e.sparkSession)
    if centroids is None:
        centroids = e.where(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    # The cached assignment carries each vector's norm so the Σ|cell|²
    # pair predicate runs ONE O(d) fold (the dot) per candidate pair
    # instead of three — same sqrt-of-sum expression as cosine(), so
    # the compared values are bit-identical (r15).
    assigned = (
        assign_nearest_centroid(corpus, centroids)
        .withColumn("nrm", _norm(F.col("embedding")))
        .persist()
    )
    den = F.col("a.nrm") * F.col("b.nrm")
    pair_cos = F.when(den != 0, _dot(F.col("a.embedding"), F.col("b.embedding")) / den)
    dropped = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(pair_cos >= SEMDEDUP_COS)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    kept = corpus.join(dropped, "vec_id", "left_anti").select("vec_id")
    return materialize_release(kept, assigned)


# --- incremental SemDeDup (batch × corpus cell probe) ---------------------------
#
# Round 11 continuation: the third near-duplicate family gets its
# incremental probe, completing the symmetry — MinHash bands
# (q_incremental_dedup), perceptual dHash (q_dhash_incremental), and
# now semantic cells. A served corpus is already deduped; each new
# ingest batch probes ONLY its own cell-mates, defers to the corpus
# (served rows never retract), and among batch rows keeps the lower id.

SEMDEDUP_INC_MOD = 3  # vec_id % 3 == 0 → the new batch; else corpus
SEMDEDUP_PLANT = 10  # corpus vec_id % 10 == 1 re-keyed +100000 into the batch


@query(
    "q_semdedup_incremental",
    tags=("assembly", "dedup", "incremental", "llm"),
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % {SEMDEDUP_INC_MOD} <> 0
    ), batch AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % {SEMDEDUP_INC_MOD} = 0
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
      WHERE vec_id % {SEMDEDUP_INC_MOD} <> 0 AND vec_id % {SEMDEDUP_PLANT} = 1
    ), pool AS (
      SELECT vec_id, embedding, TRUE AS in_corpus FROM corpus
      UNION ALL
      SELECT vec_id, embedding, FALSE AS in_corpus FROM batch
    ), dropped AS (
      SELECT DISTINCT a.vec_id
      FROM batch a JOIN pool b
        ON (b.in_corpus OR b.vec_id < a.vec_id)
      WHERE {_COS_SQL} >= {SEMDEDUP_COS}
    )
    SELECT b.vec_id, d.vec_id IS NOT NULL AS is_dup
    FROM batch b LEFT JOIN dropped d ON d.vec_id = b.vec_id
    """,
)
def q_semdedup_incremental(spark, sf_dir):
    """SemDeDup under incremental maintenance: the new batch (every
    third vector, plus re-keyed copies of corpus vectors planted as
    guaranteed hits) is assigned to the CORPUS-trained quantizer's
    cells map-only, then probes cell-mates only — corpus rows always
    win (a served corpus never retracts), batch-internal ties keep the
    lower id. Emits every batch row with its is_dup verdict.

    The oracle makes the same decision globally (no cells), which
    matches because duplicates at cos ≥ 0.999 here are exact copies and
    identical vectors share a cell under ANY argmin (q_semdedup's
    recall argument, module docstring). Per-batch cost at 100 TB: one
    broadcast-argmin pass over the batch plus a join that touches only
    cells containing batch rows — with the corpus index stored
    cell-partitioned, that is partition pruning, and the corpus is
    never re-embedded or re-assigned."""
    from incremental_dagster_delta_spark.queries.similarity import (
        IVF_CENTROID_STRIDE,
        _dot,
        _norm,
        assign_nearest_centroid,
    )
    from incremental_dagster_delta_spark.tables import materialize_release

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.where(F.col("vec_id") % SEMDEDUP_INC_MOD != 0)
    batch = e.where(F.col("vec_id") % SEMDEDUP_INC_MOD == 0).unionByName(
        corpus.where(F.col("vec_id") % SEMDEDUP_PLANT == 1).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    centroids = corpus.where(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    # assignments carry each vector's norm so the cell probe runs one
    # O(d) fold per candidate pair (the q_semdedup device, r15)
    a_corpus = (
        assign_nearest_centroid(corpus, centroids)
        .withColumn("nrm", _norm(F.col("embedding")))
        .withColumn("in_corpus", F.lit(True))
    )
    a_batch = (
        assign_nearest_centroid(batch, centroids)
        .withColumn("nrm", _norm(F.col("embedding")))
        .withColumn("in_corpus", F.lit(False))
    )
    pool = a_corpus.unionByName(a_batch).persist()
    probe = a_batch.select(
        F.col("vec_id").alias("x_id"),
        F.col("embedding").alias("x_emb"),
        F.col("nrm").alias("x_nrm"),
        F.col("centroid_id").alias("x_cell"),
    )
    den = F.col("x_nrm") * F.col("nrm")
    probe_cos = F.when(den != 0, _dot(F.col("x_emb"), F.col("embedding")) / den)
    dropped = (
        probe.join(
            pool,
            (F.col("x_cell") == F.col("centroid_id"))
            & (F.col("in_corpus") | (F.col("vec_id") < F.col("x_id"))),
        )
        .where(probe_cos >= SEMDEDUP_COS)
        .select(F.col("x_id").alias("vec_id"))
        .distinct()
    )
    out = (
        batch.select("vec_id")
        .join(dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select("vec_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    )
    return materialize_release(out, pool)
