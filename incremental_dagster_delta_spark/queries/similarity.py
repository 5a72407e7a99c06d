"""Similarity search over embeddings (SURVEY.md §2.5).

The ``embeddings`` table carries (vec_id BIGINT, embedding ARRAY<FLOAT>,
label INT), 64-dim. Two search paths:

- **brute-force cosine top-k** (the correctness baseline): broadcast the
  query set, score every (query, candidate) with JVM-side ``zip_with`` /
  ``aggregate`` in double precision, rank per query. Cost O(|Q|·N) — the
  right baseline when |Q| is small; at 100 TB the candidate scan is
  embarrassingly parallel and never shuffles the big side (ranking
  shuffles only |Q|·N score rows, and per-query top-k could further be
  cut map-side with a partial sort).
- **IVF (inverted-file) ANN**: deterministic coarse quantizer (every
  50th vector is a centroid), one map-side pass assigns each vector to
  its nearest centroid (broadcast centroids); queries probe the
  ``NPROBE`` nearest centroid buckets only. Scan cost drops by
  ~(probed buckets / all buckets); recall is whatever the quantizer
  gives — reported rows-only, with the brute-force query as the
  ground-truth baseline next to it.

Float determinism: all arithmetic in double, final scores rounded to 4
decimals; ordering ties broken by vec_id, so Spark and DuckDB agree
bit-for-bit.
"""

# NOTE: no `from __future__ import annotations` here — it would stringify
# the pandas_udf type hints and PySpark's signature inference rejects them.
from pyspark.sql import Column, DataFrame, functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

TOP_K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors
IVF_CENTROID_STRIDE = 50  # vec_id % 50 == 0 → centroid (10 at sf0.01)
# probed buckets per query. Measured recall@5 at sf0.01 (10 centroids):
# NPROBE 2/3/4/5 → 0.425/0.575/0.675/0.775. The probed corpus fraction
# is NPROBE·STRIDE/N — it SHRINKS as the corpus grows (fixed bucket
# count probed out of N/50), so unlike LSH tables this dial is nearly
# free at scale; 4 keeps the test floor honest at small N.
NPROBE = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm vector: NULL, DuckDB's x/0 convention — unguarded, one
    # all-zero embedding ABORTS every cosine consumer under ANSI Spark
    # while the oracles keep serving rows (r15 review). NULLs sort last
    # under DESC on both engines, so rankings are unaffected.
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _dot(a, b) / den)


_EXACT_TOPK_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_aggregate(list_transform(list_zip(q.qe, e.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
             (sqrt(list_aggregate(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
              sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
             AS cos
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(ROUND(cos, 4) AS DOUBLE) AS cosine,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    WHERE rk <= {TOP_K}
    """


@query(
    "q_cosine_topk",
    tags=("similarity", "llm"),
    bench=True,
    oracle=_EXACT_TOPK_ORACLE,
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the exact-ANN baseline. Queries are
    broadcast; every candidate partition scores locally (zip_with dot
    product in double), then a per-query window ranks. Deterministic
    tie-break on neighbor_id."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.tables import fan_out

    e = fan_out(t(spark, sf_dir, "embeddings"), spark)
    q = F.broadcast(
        e.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        e.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).cast("double").alias("cosine"),
            F.col("rank").cast("long"),
        )
    )


def assign_nearest_centroid(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Map-only nearest-centroid assignment: collect the (small) centroid
    set into ONE row as an array of structs, broadcast it to every
    partition, and fold the arg-max cosine per row with JVM higher-order
    functions. No shuffle, no N×C row explosion — each task scores its
    rows against the in-memory centroid array, the k-means-assign shape
    you want at 10⁹ vectors. Ties break to the lower centroid_id, making
    the fold independent of collect_list order.

    ``vectors``: (vec_id, embedding); ``centroids``: (centroid_id, ce).
    Returns (vec_id, embedding, centroid_id).
    """
    # Norms are hoisted out of the per-(row, centroid) fold: each
    # centroid's norm is computed once into the broadcast struct and the
    # row's norm once into a projection column, so the argmin fold runs
    # ONE O(d) fold (the dot product) per centroid instead of three
    # (r15; same sqrt-of-sum expressions → bit-identical cosines).
    cent_row = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct("centroid_id", "ce", _norm(F.col("ce")).alias("cn"))
            ).alias("cents")
        )
    )

    def _cos(c):
        den = c["cn"] * F.col("_ne")
        return F.when(den != 0, _dot(c["ce"], F.col("embedding")) / den)

    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(_cos(c).alias("cos"), c["centroid_id"].alias("cid")),
    )
    init = F.struct(F.lit(-2.0).alias("cos"), F.lit(-1).cast("long").alias("cid"))
    best = F.aggregate(
        scored,
        init,
        lambda acc, s: F.when(
            (s["cos"] > acc["cos"]) | ((s["cos"] == acc["cos"]) & (s["cid"] < acc["cid"])), s
        ).otherwise(acc),
    )
    return (
        # project to exactly the two consumed columns first (ADVICE r15):
        # collision-proofs the internal _ne name against a caller frame
        # that already carries it, and drops unused columns before the
        # broadcast cross-join (guide §2.3 — project early)
        vectors.select("vec_id", "embedding")
        .withColumn("_ne", _norm(F.col("embedding")))
        .crossJoin(cent_row)
        .select("vec_id", "embedding", best["cid"].alias("centroid_id"))
    )


def ivf_assign(e: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid — zero-shuffle path
    (see assign_nearest_centroid)."""
    centroids = e.where(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    return assign_nearest_centroid(e.select("vec_id", "embedding"), centroids)


_IVF_ORACLE = f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
      WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
    ), assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_aggregate(list_transform(list_zip(c.ce, e.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / (sqrt(list_aggregate(list_transform(c.ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) DESC, c.centroid_id) AS rk
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rk = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ), probes AS (
      SELECT query_id, qe, centroid_id FROM (
        SELECT q.query_id, q.qe, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_aggregate(list_transform(list_zip(c.ce, q.qe), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / (sqrt(list_aggregate(list_transform(c.ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * sqrt(list_aggregate(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) DESC, c.centroid_id) AS rk
        FROM q CROSS JOIN cents c
      ) WHERE rk <= {NPROBE}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_aggregate(list_transform(list_zip(p.qe, a.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / (sqrt(list_aggregate(list_transform(p.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
      FROM probes p JOIN assigned a USING (centroid_id)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(ROUND(cos, 4) AS DOUBLE) AS cosine,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    WHERE rk <= {TOP_K}
    """


@query("q_cosine_ann_ivf", tags=("similarity", "llm"), oracle=_IVF_ORACLE)
def q_cosine_ann_ivf(spark, sf_dir):
    """IVF approximate top-k: probe only the NPROBE nearest centroid
    buckets per query instead of the full corpus. HASH-checked since r5:
    the oracle replicates the whole IVF pipeline (strided centroids →
    argmax assignment with id tiebreak → NPROBE probe selection →
    in-cell scoring) in DuckDB CTEs with the same sequential-double
    cosine the exact-topk oracle already proved bit-stable; recall vs
    the exact baseline is separately floored in tests/test_ann.py. The
    bucket join keys on centroid_id — candidate volume is the probed
    buckets, not N."""
    return ivf_topk(t(spark, sf_dir, "embeddings"))


def ivf_topk(
    e: DataFrame,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
    extra_cols: tuple = (),
) -> DataFrame:
    """The full IVF pipeline as a reusable helper (r9: factored so the
    trained k-means quantizer can be swapped in). ``centroids`` is a
    (centroid_id, ce) table; None = the default stride sample (the
    qid's oracle replicates the stride, so the default must stay it).
    Pass ``kmeans.trained_centroids(e)`` for the trained variant —
    recall delta pinned in tests/test_ann.py.

    ``assigned`` (r15) overrides the in-pipeline assignment with a
    precomputed (vec_id, embedding, centroid_id, *extra_cols) postings
    table — the incremental-index fold (q_ivf_incremental) probes
    through here so the production probe and the fold-equals-rebuild
    pin share one pipeline. ``extra_cols`` ride from the postings to
    the output (e.g. from_batch provenance)."""
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = e.where(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    if assigned is None:
        assigned = assign_nearest_centroid(e.select("vec_id", "embedding"), centroids)
    assigned = assigned.persist()
    queries = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    centroids = F.broadcast(centroids)
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id"))
    probes = (
        queries.join(centroids)
        .select("query_id", "qe", "centroid_id", cosine(F.col("ce"), F.col("qe")).alias("ccos"))
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= NPROBE)
        .select("query_id", "qe", "centroid_id")
    )
    cand = probes.join(assigned, "centroid_id").where(F.col("vec_id") != F.col("query_id"))
    out = (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                    cosine(F.col("qe"), F.col("embedding")).alias("cos"), *extra_cols)
        .withColumn("rank", F.row_number().over(Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).cast("double").alias("cosine"),
                F.col("rank").cast("long"), *extra_cols)
        .orderBy("query_id", "rank")
    )
    from incremental_dagster_delta_spark.tables import materialize_release

    return materialize_release(out, assigned)


# Recall@k of the IVF shortlist against the exact brute-force top-k —
# the one number an ANN deployment is judged by (probe more buckets vs
# scan less corpus is THE IVF dial, and this metric prices it). Both
# shortlists come from the already-oracled pipelines, so the oracle is a
# pure composition: the exact CTE and the IVF CTE joined per query.
_RECALL_ORACLE = f"""
    WITH exact AS ({_EXACT_TOPK_ORACLE}),
         approx AS ({_IVF_ORACLE})
    SELECT exact.query_id,
           CAST(count(approx.neighbor_id) AS BIGINT) AS n_hits,
           CAST(ROUND(1.0 * count(approx.neighbor_id) / {TOP_K}, 4) AS DOUBLE)
             AS recall_at_k
    FROM exact
    LEFT JOIN approx
      ON approx.query_id = exact.query_id
     AND approx.neighbor_id = exact.neighbor_id
    GROUP BY exact.query_id
    """


@query("q_recall_at_k", tags=("similarity", "analytics", "llm"), oracle=_RECALL_ORACLE)
def q_recall_at_k(spark, sf_dir):
    """Per-query recall@{{TOP_K}} of the IVF ANN shortlist vs the exact
    brute-force top-k — completes the eval family (AUC/NDCG/MRR/kNN).
    Runs both already-verified pipelines and left-joins the exact
    shortlist against the approximate one on (query_id, neighbor_id);
    the per-query hit count over TOP_K is the recall. All-integer until
    the final division (rounded 4 dp). Scale shape: both shortlists are
    |Q|·k rows — the join and aggregation are trivially small regardless
    of corpus size; the cost lives in the (already scale-shaped) search
    pipelines. The corpus-level recall floor this metric summarizes is
    asserted in tests/test_ann.py."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_cosine_ann_ivf(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(TOP_K)), 4
            )
            .cast("double")
            .alias("recall_at_k"),
        )
    )


# Margin-based mining (LASER/CCMatrix shape, Artetxe & Schwenk 2019):
# a candidate pair is "mined" when its similarity stands OUT of the
# query's neighborhood — cos(x,y) divided by the mean similarity of the
# query's k nearest neighbors (forward ratio margin). Absolute-cosine
# thresholds break when neighborhood density varies (hubness); the
# margin self-normalizes per query, which is why CCMatrix mines with it
# at web scale. MARGIN_THRESHOLD > 1 means "strictly above the
# neighborhood average"; 1.05 flags clear outliers on this corpus.
MARGIN_THRESHOLD = 1.05

# the threshold in margin-times-10⁴ integer space (1.05 → 10500)
_MARGIN_T4 = int(round(MARGIN_THRESHOLD * 10000))

_BITEXT_ORACLE = f"""
    WITH approx AS ({_IVF_ORACLE}),
    scaled AS (
      SELECT query_id, neighbor_id, cosine, rank,
             CAST(ROUND(cosine * 10000) AS BIGINT) AS icos
      FROM approx
    ),
    denom AS (
      SELECT query_id, SUM(icos) AS s, COUNT(*) AS k
      FROM scaled GROUP BY query_id
    ),
    m AS (
      SELECT sc.query_id, sc.neighbor_id, sc.cosine, sc.rank,
             CASE WHEN d.s <> 0
                  THEN (2 * sc.icos * d.k * 10000 + d.s) // (2 * d.s)
             END AS m4
      FROM scaled sc JOIN denom d USING (query_id)
    )
    SELECT query_id, neighbor_id, cosine, rank,
           CAST(m4 AS DOUBLE) / 10000 AS margin,
           COALESCE(m4 >= {_MARGIN_T4}, FALSE) AS mined
    FROM m
    """


@query("q_bitext_mine", tags=("similarity", "llm"), oracle=_BITEXT_ORACLE)
def q_bitext_mine(spark, sf_dir):
    """Margin-based nearest-neighbor mining over the IVF shortlist: each
    query's candidates get margin = cos / mean(top-k cos), and pairs
    above MARGIN_THRESHOLD are flagged as mined (the CCMatrix bitext
    criterion, applied to whatever the corpus embeddings represent).

    Determinism discipline: the shortlist cosines are already rounded to
    4 dp, so the margin stays in EXACT integer arithmetic END TO END —
    icos = round(cos·10⁴) is an exact BIGINT; the rounded 4-dp margin is
    m4 = (2·icos·k·10⁴ + s) ÷ (2s) (round-half-up by construction,
    BIGINT floor division in both engines), and ``mined`` compares m4
    against the integer-scaled threshold. No double ROUND ever runs, so
    the Spark-BigDecimal-vs-DuckDB-std::round boundary seam (r14 review)
    cannot flip a flag; the only float op left is m4/10⁴, exact for
    these magnitudes. Both engines' integer divisions truncate toward
    zero (DuckDB ``//`` included — verified -7//2 = -3, it is NOT floor
    division), so there is no cross-engine seam even on an adversarial
    corpus with negative shortlist cosines; the s > 0 / icos ≥ 0 shape a
    top-k shortlist gives by construction only matters for the ROUNDING
    label — on a negative numerator the formula degrades from
    round-half-up to round-half-toward-zero, identically in both
    engines. s == 0 (a degenerate shortlist whose rounded cosines sum
    to exactly zero) is guarded EXPLICITLY rather than left to the
    engines' division-by-zero conventions (a real seam — r14 ADVICE
    #3): both plans emit margin NULL and mined FALSE on that branch.

    Scale shape: everything downstream of ivf_topk operates on |Q|·k
    rows — one tiny query-partitioned window, no corpus contact. The
    expensive part is the shortlist itself, which probes NPROBE buckets
    instead of scanning N (the batch×corpus shape pinned in
    tests/test_plans.py)."""
    from pyspark.sql.window import Window

    shortlist = ivf_topk(t(spark, sf_dir, "embeddings"))
    icos = F.round(F.col("cosine") * 10000).cast("long")
    w = Window.partitionBy("query_id")
    scaled = (
        shortlist.withColumn("icos", icos)
        .withColumn("_k", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.sum("icos").over(w))
        # Spark's DIV and DuckDB's // both truncate toward zero — the
        # m4 arithmetic is engine-identical for ANY sign (see docstring).
        # _s == 0 takes an explicit NULL branch in BOTH plans instead of
        # relying on either engine's division-by-zero convention.
        .withColumn(
            "_m4",
            F.when(
                F.col("_s") != 0,
                F.expr("(2 * icos * _k * 10000 + _s) DIV (2 * _s)"),
            ),
        )
    )
    return scaled.select(
        "query_id",
        "neighbor_id",
        "cosine",
        "rank",
        (F.col("_m4") / F.lit(10000)).cast("double").alias("margin"),
        F.coalesce(F.col("_m4") >= F.lit(_MARGIN_T4), F.lit(False)).alias("mined"),
    )


# OR-construction: candidate if colliding in ANY table; AND within a
# table: all LSH_BITS sign bits agree. This corpus is LSH-hard — true
# top-5 neighbors sit at cos≈0.4-0.5 (p_bit = 1-θ/π ≈ 0.65), so per
# table P[collide] ≈ 0.65⁶ ≈ 0.06 while a random pair (cos≈0) collides
# at 0.5⁶ = 1/64. Measured recall@5 vs table count at sf0.01 (test
# floor asserts ≥0.5): 8 → 0.425, 16 → 0.600, 24 → 0.725; random-pair
# candidate fraction 1-(63/64)^T: 0.12 / 0.22 / 0.31. 16 balances
# recall against the fraction of the corpus the rerank must scan; for
# truly-near duplicates (cos ≥ 0.9, p_bit ≥ 0.86) the same 16 tables
# give recall ≈ 1 - (1-0.86⁶)¹⁶ ≈ 0.9996.
LSH_TABLES = 16
LSH_BITS = 6


def _rp_table_sigs(vec: Column) -> Column:
    """Array of LSH_TABLES bucket signatures (LSH_BITS sign bits each)
    under deterministic pseudo-random hyperplanes: plane (t, j)'s i-th
    coefficient derives from murmur3((t*LSH_BITS+j)*1024 + i) mapped to
    [-1, 1] — fully reproducible, no stored model.

    The coefficients ARE per-row recomputed constants of (k, i), but
    replacing them with precomputed literal coefficient arrays LOST an
    interleaved A/B at sf0.1 (old 5.50 s vs literal-array 6.45 s median
    of 4, same session — docs/PLANS.md r15): murmur3 of an int is a few
    JIT'd instructions inside the codegen'd fold, while 96 × 64-element
    CreateArray literals cost per-row allocation. Keep the inline
    derivation.

    r15 optimization session: the 96 planes fold over RUNTIME table/bit
    indices (transform over sequence) instead of 96 unrolled fold
    expressions — the per-element arithmetic is unchanged (same murmur3
    of k·1024+i, same ascending-i double fold, integer bit sum), so the
    signatures are bit-identical (asserted in-session over the sf0.1
    corpus), but the expression TREE shrinks ~100×, which is where the
    wall time lived: Catalyst analysis + codegen of the unrolled tree
    dominated the qid (0.9 s executor vs 6.7 s wall). Interleaved A/B:
    unrolled 10.3-34 s vs HOF 5.4-9.8 s across a capacity swing, HOF
    ahead in every pair. (shiftleft goes through call_function — the
    python wrapper insists on a literal bit count.)"""

    def table_sig(tbl):
        def bit(acc, j):
            k = tbl * F.lit(LSH_BITS) + j

            def term(x, i):
                coef = (
                    F.pmod(F.hash(k * F.lit(1024) + i), F.lit(2001)) - F.lit(1000)
                ) / F.lit(1000.0)
                return x.cast("double") * coef

            dot_k = F.aggregate(
                F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), term),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            return acc + F.when(
                dot_k > 0, F.call_function("shiftleft", F.lit(1), j)
            ).otherwise(F.lit(0))

        return F.aggregate(F.sequence(F.lit(0), F.lit(LSH_BITS - 1)), F.lit(0), bit)

    return F.transform(
        F.sequence(F.lit(0), F.lit(LSH_TABLES - 1)), table_sig
    ).alias("sigs")


def rp_lsh_topk(e, n_queries: int = N_QUERIES, top_k: int = TOP_K):
    """Random-hyperplane LSH ANN, standard AND-OR construction: LSH_TABLES
    (=16) hash tables of 6 sign bits; a vector is a candidate when it shares a
    bucket with the query in ANY table (P[bit agree] = 1 - θ/π, so the
    OR over tables amplifies recall while each table's AND keeps buckets
    selective). Exact cosine ranks the candidate union. Scan cost is the
    probed buckets, never N. Input: (vec_id, embedding)."""
    from pyspark.sql.window import Window

    signed = e.select("vec_id", "embedding", _rp_table_sigs(F.col("embedding"))).persist()
    buckets = signed.select(
        "vec_id",
        "embedding",
        F.posexplode("sigs").alias("tbl", "sig"),
    )
    queries = buckets.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("tbl").alias("qtbl"),
        F.col("sig").alias("qsig"),
    )
    cand = (
        queries.join(buckets, (F.col("qtbl") == F.col("tbl")) & (F.col("qsig") == F.col("sig")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", "embedding")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    out = (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cosine(F.col("qe"), F.col("embedding")).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", F.round("cos", 4).cast("double").alias("cosine"), F.col("rank").cast("long"))
        .orderBy("query_id", "rank")
    )
    from incremental_dagster_delta_spark.tables import materialize_release

    return materialize_release(out, signed)


def _rplsh_scenario_rows():
    """Deterministic integer-valued embedding set for the pinned RP-LSH
    scenario: 4 cluster centroids × 6 members each (member = centroid ×10
    plus a ±1 integer perturbation), so within-cluster cosines are ≈1 and
    every query has genuine bucket-mates in most of the 16 tables. Ids
    interleave the clusters (id % 4 = cluster) so the three query ids
    0/1/2 probe three DIFFERENT clusters."""
    rows = []
    for g in range(4):
        base = [((g * 7 + j * 3) % 11) - 5 for j in range(64)]
        for m in range(6):
            vec = [
                float(10 * base[j] + (((g * 31 + m * 13 + j * 5) % 3) - 1))
                for j in range(64)
            ]
            rows.append((m * 4 + g, vec))
    return rows


# Pinned output of rp_lsh_topk over the scenario: each query's top-5 are
# exactly its five cluster-mates (ids ≡ query_id mod 4), duplicate-member
# first at cosine 1.0 — cross-cluster vectors never survive the bucket
# screen + rerank. Verified stable across repeated runs.
# IMPLEMENTATION PIN — hyperplanes derive from Spark 4.1.2's murmur3
# `hash()`; a version bump that changes that hash re-rolls the planes
# and buckets: a red after an upgrade is pin drift, not a kernel bug —
# re-pin (the exact-rerank cosines are data properties and stay valid).
_RPLSH_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(12 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT)),
      (0, 4, 0.999, 2),
      (0, 16, 0.999, 3),
      (0, 8, 0.999, 4),
      (0, 20, 0.999, 5),
      (1, 13, 1.0, 1),
      (1, 9, 0.999, 2),
      (1, 21, 0.999, 3),
      (1, 5, 0.999, 4),
      (1, 17, 0.999, 5),
      (2, 14, 1.0, 1),
      (2, 10, 0.999, 2),
      (2, 22, 0.999, 3),
      (2, 6, 0.999, 4),
      (2, 18, 0.999, 5)
    ) AS t(query_id, neighbor_id, cosine, rank)
    """


@query("q_cosine_ann_rplsh", tags=("similarity", "llm"), oracle=_RPLSH_ORACLE)
def q_cosine_ann_rplsh(spark, sf_dir):
    """RP-LSH ANN through :func:`rp_lsh_topk`, hash-checked via the
    literal-scenario pattern: a pinned 24-vector clustered embedding set
    (integer-valued, so every dot product is exact) runs through the same
    murmur3-hyperplane AND-OR kernel and the ranked neighbor lists must
    equal the VALUES oracle — any drift in the hyperplane derivation, the
    bucketing, or the rerank flips the comparison. Corpus-scale recall vs
    the exact q_cosine_topk baseline stays pinned in tests/test_ann.py."""
    from incremental_dagster_delta_spark.tables import literal_df

    e = literal_df(spark, _rplsh_scenario_rows(), "vec_id long, embedding array<double>")
    return rp_lsh_topk(e, n_queries=3, top_k=TOP_K)


NEARDUP_COS = 0.999


@query(
    "q_dedup_embedding",
    tags=("similarity", "dedup", "llm"),
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(ROUND(
             list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
             (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
              sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
           , 4) AS DOUBLE) AS cosine
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
          >= {NEARDUP_COS}
    """,
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine duplicate detection, bucketed (never all-pairs).
    See :func:`near_dup_pairs` for the grid + multi-probe construction.
    The corpus plants a re-keyed copy of every 10th vector; the oracle is
    exact all-pairs (feasible only at test scale)."""
    from incremental_dagster_delta_spark.tables import fan_out

    e = fan_out(t(spark, sf_dir, "embeddings"), spark).select("vec_id", "embedding")
    dupes = (
        e.where(F.col("vec_id") % 10 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    return near_dup_pairs(e.unionByName(dupes))


GRID_CELL = 0.01
GRID_OFFSETS = (0.0, 0.005)  # second grid shifted by half a cell


def near_dup_pairs(corpus: DataFrame, threshold: float = NEARDUP_COS) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine ≥ ``threshold``, bucketed.

    Candidate generation quantizes the L2-normalized vector to 2 decimals
    under TWO grids (the second shifted by half a cell) plus a T=1
    multi-probe per grid: alongside the base cell, each vector also emits
    the cell with its closest-to-boundary component flipped to the
    adjacent cell, so a pair split by one grid boundary collides via the
    probe (both points sit within ε of the same boundary, making that
    component their argmax |frac|). Exact double-precision
    cosine verifies every candidate, so false candidates never leak into
    the output. Guarantees: byte-identical duplicates always collide;
    near-exact pairs whose components straddle at most one cell boundary
    per grid collide via the shifted grid or the probe. With 64
    components an adversarial residual miss rate remains (this is a DEDUP
    screen for exact/near-exact copies, not an ANN substitute — use
    q_cosine_ann_* for genuine similarity search). At 100 TB the bucket
    joins replace an O(n²) cross join with shuffles on quantized-vector
    hashes at constant (4×) key fan-out.
    """
    corpus = corpus.select("vec_id", "embedding")
    norm = _norm(F.col("embedding"))
    with_cells = corpus.withColumn("nrm", norm)
    keyed_parts = []
    for g, off in enumerate(GRID_OFFSETS):
        part = (
            with_cells.withColumn(
                "shifted",
                F.expr(f"transform(embedding, x -> CAST(x AS DOUBLE) / nrm + {off})"),
            )
            .withColumn("cells", F.expr("transform(shifted, x -> round(x, 2))"))
            .withColumn("fracs", F.expr("zip_with(shifted, cells, (n, c) -> n - c)"))
            .withColumn(
                "idx",
                F.expr("array_position(transform(fracs, v -> abs(v)), array_max(transform(fracs, v -> abs(v))))"),
            )
            .select(
                "vec_id",
                F.lit(g).alias("grid"),
                F.explode(
                    F.array(
                        F.md5(F.to_json(F.col("cells")).cast("binary")),
                        F.md5(
                            F.to_json(
                                F.expr(
                                    f"""transform(cells, (c, i) ->
                                        IF(i = idx - 1,
                                           round(c + sign(element_at(fracs, CAST(idx AS INT))) * {GRID_CELL}, 2),
                                           c))"""
                                )
                            ).cast("binary")
                        ),
                    )
                ).alias("cell"),
            )
        )
        keyed_parts.append(part)
    keyed = keyed_parts[0].unionByName(keyed_parts[1])
    cand = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.grid") == F.col("b.grid"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
        .join(corpus.withColumnsRenamed({"vec_id": "vec_a", "embedding": "emb_a"}), "vec_a")
        .join(corpus.withColumnsRenamed({"vec_id": "vec_b", "embedding": "emb_b"}), "vec_b")
        .select("vec_a", "vec_b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cos"))
    )
    return (
        cand.where(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).cast("double").alias("cosine"))
    )


@query(
    "q_embedding_norm",
    tags=("similarity", "llm", "pandas_udf"),
    oracle="""
    SELECT vec_id,
           CAST(ROUND(sqrt(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS DOUBLE) AS l2_norm,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
)
def q_embedding_norm(spark, sf_dir):
    """Vectorized pandas_udf surface (SURVEY.md §2.4): L2 norm per
    embedding computed in one Arrow-batched numpy call per partition —
    the fast Python path when an operator genuinely needs numpy."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(v: pd.Series) -> pd.Series:
        return v.map(lambda a: float(np.sqrt(np.sum(np.asarray(a, dtype=np.float64) ** 2))))

    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 4).cast("double").alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


# --- per-label centroid outliers (mislabel / noise QA) ----------------------

OUTLIER_Z = 2.0


@query(
    "q_embedding_outliers",
    tags=("similarity", "llm", "quality"),
    oracle=f"""
    WITH comp AS (
      SELECT vec_id, label,
             unnest(generate_series(1, len(embedding))) - 1 AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), cent AS (
      SELECT label, idx, AVG(x) AS c FROM comp GROUP BY label, idx
    ), dist AS (
      SELECT comp.vec_id, comp.label,
             sqrt(SUM((comp.x - cent.c) * (comp.x - cent.c))) AS d
      FROM comp JOIN cent USING (label, idx)
      GROUP BY comp.vec_id, comp.label
    ), stats AS (
      SELECT label, AVG(d) AS mu, stddev_samp(d) AS sd FROM dist GROUP BY label
    )
    SELECT dist.vec_id, dist.label,
           CAST(ROUND(dist.d, 4) AS DOUBLE) AS dist,
           CAST(ROUND((dist.d - stats.mu) / stats.sd, 4) AS DOUBLE) AS z,
           ROUND((dist.d - stats.mu) / stats.sd, 6) >= {OUTLIER_Z} AS is_outlier
    FROM dist JOIN stats USING (label)
    """,
)
def q_embedding_outliers(spark, sf_dir):
    """Per-label embedding outliers — the mislabeled/noisy-example sweep
    every labeled training set needs before fine-tuning: distance of
    each vector to its label centroid, z-scored within the label, flag
    at z ≥ 2. Scale shape: centroids come from ONE posexplode aggregation
    (map-side combined; the 64x row blowup never shuffles raw — only
    (label, idx) partial sums travel), are reassembled into 20 tiny
    arrays, and broadcast back; distances are then a zero-shuffle
    zip_with fold per row, and the label z-stats are a second small
    aggregation. The z-threshold comparison is made on the ROUNDED score
    on both engines so the boolean can't flip on a last-ulp difference."""
    e = t(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("idx", "x"))
        .groupBy("label", "idx")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "c"))).alias("ic"))
        .select("label", F.col("ic.c").alias("centroid"))
    )
    dist = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.sqrt(
            F.aggregate(
                F.zip_with("embedding", "centroid", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("d"),
    )
    stats = dist.groupBy("label").agg(F.avg("d").alias("mu"), F.stddev_samp("d").alias("sd"))
    z = (F.col("d") - F.col("mu")) / F.col("sd")
    return dist.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.round("d", 4).cast("double").alias("dist"),
        F.round(z, 4).cast("double").alias("z"),
        (F.round(z, 6) >= F.lit(OUTLIER_Z)).alias("is_outlier"),
    )


# --- hard-negative mining (contrastive training prep) -----------------------

HN_ANCHOR_STRIDE = 25  # vec_id % 25 == 0 -> anchor (the "training batch")
HN_TOP_K = 3
HN_MARGIN = 0.2


@query(
    "q_hard_negatives",
    tags=("similarity", "llm", "training"),
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS ae, label AS alabel
      FROM embeddings WHERE vec_id % {HN_ANCHOR_STRIDE} = 0
    ), scored AS (
      SELECT a.anchor_id, a.alabel, e.vec_id AS neighbor_id, e.label,
             list_aggregate(list_transform(list_zip(a.ae, e.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
             (sqrt(list_aggregate(list_transform(a.ae, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
              sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
             AS cos
      FROM a JOIN embeddings e ON e.vec_id <> a.anchor_id
    ), pos AS (
      SELECT anchor_id, MAX(cos) AS pos_cos FROM scored WHERE label = alabel GROUP BY anchor_id
    ), neg AS (
      SELECT anchor_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored WHERE label <> alabel
    )
    SELECT neg.anchor_id, neg.neighbor_id,
           CAST(ROUND(neg.cos, 4) AS DOUBLE) AS neg_cos,
           CAST(ROUND(pos.pos_cos, 4) AS DOUBLE) AS pos_cos,
           ROUND(neg.cos, 6) > ROUND(pos.pos_cos, 6) - {HN_MARGIN} AS semi_hard,
           CAST(neg.rk AS BIGINT) AS rank
    FROM neg JOIN pos USING (anchor_id)
    WHERE neg.rk <= {HN_TOP_K}
    """,
)
def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each anchor of
    a deterministic "batch" (vec_id stride), the top-k highest-cosine
    DIFFERENT-label neighbors, each labeled semi-hard when it lands
    within the triplet margin of the anchor's best positive — exactly
    the pairs a triplet/InfoNCE loss learns most from. Scale shape is
    batch-times-corpus (the q_incremental_dedup lesson): the anchor
    batch broadcasts, the corpus streams once and never self-joins, the
    per-anchor rank is one window over batch-sized groups. The
    semi-hard boolean compares ROUNDED scores on both engines so it
    cannot flip on a last-ulp difference."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.tables import fan_out

    e = fan_out(t(spark, sf_dir, "embeddings"), spark)
    a = F.broadcast(
        e.where(F.col("vec_id") % HN_ANCHOR_STRIDE == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("ae"),
            F.col("label").alias("alabel"),
        )
    )
    scored = e.join(a, F.col("vec_id") != F.col("anchor_id")).select(
        "anchor_id",
        "alabel",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        cosine(F.col("ae"), F.col("embedding")).alias("cos"),
    )
    pos = (
        scored.where(F.col("label") == F.col("alabel"))
        .groupBy("anchor_id")
        .agg(F.max("cos").alias("pos_cos"))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    neg = (
        scored.where(F.col("label") != F.col("alabel"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HN_TOP_K)
    )
    return neg.join(F.broadcast(pos), "anchor_id").select(
        "anchor_id",
        "neighbor_id",
        F.round("cos", 4).cast("double").alias("neg_cos"),
        F.round("pos_cos", 4).cast("double").alias("pos_cos"),
        (F.round("cos", 6) > F.round("pos_cos", 6) - HN_MARGIN).alias("semi_hard"),
        F.col("rank").cast("long"),
    )


# --- k-NN classification evaluation ------------------------------------------

_KNN_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS true_label
      FROM embeddings WHERE vec_id < {{N_QUERIES}}
    ), scored AS (
      SELECT q.query_id, q.true_label, e.label,
             list_aggregate(list_transform(list_zip(q.qe, e.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
             (sqrt(list_aggregate(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
              sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
             AS cos,
             e.vec_id AS neighbor_id
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ), topk AS (
      SELECT query_id, true_label, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= {{TOP_K}}
    ), votes AS (
      SELECT query_id, true_label, label AS predicted, COUNT(*) AS n_votes
      FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(predicted AS BIGINT) AS predicted,
           CAST(n_votes AS BIGINT) AS n_votes,
           predicted = true_label AS correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY n_votes DESC, predicted) AS vr
      FROM votes
    ) WHERE vr = 1
    """.replace("{N_QUERIES}", str(N_QUERIES)).replace("{TOP_K}", str(TOP_K))


@query("q_knn_eval", tags=("similarity", "analytics", "llm"), oracle=_KNN_ORACLE)
def q_knn_eval(spark, sf_dir):
    """k-NN classification readout: each held-out query vector predicts
    a label by majority vote among its TOP_K exact cosine neighbors
    (tie → smaller label id), reported against the true label — the
    standard embedding-quality probe (better embeddings → higher k-NN
    accuracy). Reuses the brute-force top-k shape (broadcast queries ×
    streamed corpus); the vote is a |queries|·k-row aggregate. At
    production scale the same readout runs over the ANN shortlist
    instead of the exact scan — identical plan downstream of candidate
    generation."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("label").alias("true_label"),
        )
    )
    scored = e.join(q, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "true_label",
        "label",
        "vec_id",
        cosine(F.col("qe"), F.col("embedding")).alias("cos"),
    )
    topk = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
            ),
        )
        .where(F.col("rk") <= TOP_K)
    )
    votes = topk.groupBy(
        "query_id", "true_label", F.col("label").alias("predicted")
    ).agg(F.count("*").alias("n_votes"))
    best = (
        votes.withColumn(
            "vr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), F.col("predicted"))
            ),
        )
        .where(F.col("vr") == 1)
    )
    return best.select(
        "query_id",
        F.col("true_label").cast("long").alias("true_label"),
        F.col("predicted").cast("long").alias("predicted"),
        F.col("n_votes").cast("long").alias("n_votes"),
        (F.col("predicted") == F.col("true_label")).alias("correct"),
    )
