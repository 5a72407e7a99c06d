"""Embedding compression: int8 scalar quantization and product quantization.

ANN at 10⁹+ vectors is memory-bound before it is compute-bound; the
standard fixes are scalar quantization (4× smaller, exact-ish) and
product quantization (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — 32× smaller, approximate). Both are
map-only passes over the embedding column, which is exactly what you
want at scale: no shuffle, codebooks broadcast.

Determinism: all arithmetic in double precision on both engines;
rounding to int8 uses ``floor(x + 0.5)`` (identical IEEE ops in Spark
and DuckDB) rather than each engine's ``round`` (whose half-way tie
rules differ). Distance ties in PQ break to the lower centroid id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

EMB_DIM = 64
PQ_M = 4  # subspaces
PQ_SUBDIM = EMB_DIM // PQ_M
PQ_STRIDE = 25  # vec_id % 25 == 0 → codebook entry (deterministic "training")


@query(
    "q_embedding_quantize",
    tags=("similarity", "llm"),
    oracle="""
    WITH q AS (
      SELECT vec_id, embedding,
             CASE WHEN s0 = 0 THEN 1.0 ELSE s0 / 127.0 END AS s
      FROM (
        SELECT vec_id, embedding,
               list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS s0
        FROM embeddings
      )
    )
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS INTEGER) AS VARCHAR)), ',') AS qvec,
           CAST(ROUND(s, 6) AS DOUBLE) AS scale,
           CAST(ROUND(sqrt(list_aggregate(list_transform(embedding,
             x -> pow(floor(CAST(x AS DOUBLE) / s + 0.5) * s - CAST(x AS DOUBLE), 2)), 'sum')), 4) AS DOUBLE)
             AS recon_err
    FROM q
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization per vector: scale =
    max|component| / 127, components rounded to int8 range, plus the L2
    reconstruction error. Pure JVM higher-order functions over the
    array — a zero-shuffle projection that compresses a 100 TB float32
    embedding store to 25 TB while keeping cosine rankings nearly intact
    (the recon_err column is the audit trail for "nearly").

    The code vector is emitted as a comma-joined string: the driver's
    canonicalizer hashes cells via pandas ``sort_values``, which cannot
    hash raw list cells (r4: ``TypeError: unhashable type: 'list'``) —
    serializing on BOTH sides keeps the check exact and hashable."""
    e = t(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    s0 = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.when(s0 == 0.0, F.lit(1.0)).otherwise(s0 / 127.0)
    base = e.select("vec_id", emb_d.alias("emb"), scale.alias("s"))
    qvec = F.transform("emb", lambda v: F.floor(v / F.col("s") + 0.5).cast("int"))
    recon = F.sqrt(
        F.aggregate(
            F.transform(
                "emb",
                lambda v: F.pow(F.floor(v / F.col("s") + 0.5) * F.col("s") - v, F.lit(2.0)),
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    return base.select(
        "vec_id",
        F.array_join(F.transform(qvec, lambda x: x.cast("string")), ",").alias("qvec"),
        F.round("s", 6).alias("scale"),
        F.round(recon, 4).alias("recon_err"),
    )


@query(
    "q_pq_codes",
    tags=("similarity", "llm"),
    bench=True,
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % {PQ_STRIDE} = 0
    ),
    d AS (
      SELECT e.vec_id, s.s, c.cid,
             list_aggregate(list_transform(range(1, {PQ_SUBDIM} + 1),
               j -> pow(CAST(e.embedding[s.s * {PQ_SUBDIM} + j] AS DOUBLE)
                        - CAST(c.ce[s.s * {PQ_SUBDIM} + j] AS DOUBLE), 2)), 'sum') AS dist
      FROM embeddings e
      CROSS JOIN range(0, {PQ_M}) s(s)
      CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, s, cid,
             row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
      FROM d
    )
    SELECT vec_id, array_to_string(list(CAST(cid AS VARCHAR) ORDER BY s), ',') AS codes
    FROM best WHERE rk = 1
    GROUP BY vec_id
    """,
)
def q_pq_codes(spark, sf_dir):
    """Product-quantization encoding: split each 64-dim vector into 4
    16-dim subvectors and store, per subspace, the id of the nearest
    codebook centroid (deterministic codebook: every PQ_STRIDE-th
    vector). Encoding is map-only — the codebook collapses to ONE
    broadcast row of structs and each task arg-mins its rows against it
    with JVM fold expressions (same zero-shuffle shape as
    ``similarity.assign_nearest_centroid``); no N×C row explosion, no
    Python. At 10⁹ vectors this turns a 256 GB float store into 8 GB of
    codes scanned by ADC distance tables."""
    from incremental_dagster_delta_spark.tables import fan_out

    e = fan_out(t(spark, sf_dir, "embeddings"), spark)
    codes = pq_encode(e, pq_codebook_row(e))
    # Comma-joined string, not array<long>: the driver's canonicalizer
    # cannot hash list cells (r4 red) — serialize on BOTH sides.
    return codes.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias("codes"),
    )


def _sq_dist(a, b):
    """L2² between two equal-length float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.pow(x.cast("double") - y.cast("double"), F.lit(2.0))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebook_row(e):
    """ONE broadcastable row holding the PQ codebook with each centroid
    pre-sliced into its per-subspace subvectors — the per-row argmin then
    compares 16-dim arrays directly instead of re-slicing every 64-dim
    centroid for every row (4×N×C slice() calls saved; measured ~8×
    faster at sf0.1). Columns ``cents0..cents{{M-1}}``, each an array of
    (cid, ce) structs."""
    cents = e.where(F.col("vec_id") % PQ_STRIDE == 0).select(
        F.col("vec_id").alias("cid"),
        *[
            F.slice(F.col("embedding"), s * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"sub{s}")
            for s in range(PQ_M)
        ],
    )
    return F.broadcast(
        cents.agg(
            *[
                F.collect_list(F.struct("cid", F.col(f"sub{s}").alias("ce"))).alias(f"cents{s}")
                for s in range(PQ_M)
            ]
        )
    )


def pq_encode(vectors, cent_row):
    """(vec_id, codes array<long>) — nearest-centroid code per subspace,
    computed entirely with JVM fold expressions against the broadcast
    codebook row; ties break to the lower centroid id."""

    def code_for(s: int):
        sub = F.slice(F.col("embedding"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
        scored = F.transform(
            F.col(f"cents{s}"),
            lambda c: F.struct(
                _sq_dist(c["ce"], sub).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
        init = F.struct(
            F.lit(float("inf")).alias("dist"), F.lit(-1).cast("long").alias("cid")
        )
        best = F.aggregate(
            scored,
            init,
            lambda acc, x: F.when(
                (x["dist"] < acc["dist"])
                | ((x["dist"] == acc["dist"]) & (x["cid"] < acc["cid"])),
                x,
            ).otherwise(acc),
        )
        return best["cid"]

    return vectors.crossJoin(cent_row).select(
        "vec_id", F.array(*[code_for(s) for s in range(PQ_M)]).alias("codes")
    )


# ADC keeps TOP_K × this many candidates for exact re-rank. Measured
# recall@5 vs q_cosine_topk at sf0.01 (uniform-random embeddings, 20-entry
# codebooks — ANN's worst case): factor 4/8/16/32 → 0.15/0.275/0.425/0.65,
# ceiling 0.675 (= the NPROBE=4 IVF probe's own recall). The tiny test
# codebook (N/25 entries ≈ 17 bits/vector) makes ADC deliberately coarse
# here; at production scale (256 entries/subspace over 10⁹ vectors) the
# table is ~10× finer and the shortlist prunes far harder.
RERANK_FACTOR = 16




def _ivf_pq_oracle() -> str:
    """DuckDB replica of the full IVF-PQ pipeline (normalize → coarse
    assign → per-subspace PQ argmin → probe → ADC shortlist → exact
    re-rank). Float parity notes: every dot/L2 folds doubles in list
    order (the same sequential accumulation Spark's F.aggregate does —
    bit-stability proven by the q_cosine_topk oracle since r2); the ADC
    sum is written as an explicit left-to-right chain of the PQ_M
    subspace terms so its addition order matches Spark's fold; all
    argmin/argmax selections share the (value, id) tiebreak on both
    sides."""
    from incremental_dagster_delta_spark.queries.similarity import (
        IVF_CENTROID_STRIDE,
        N_QUERIES,
        NPROBE,
        TOP_K,
    )

    def dot(a, b):
        return (
            f"list_aggregate(list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
        )

    def cos(a, b):
        return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"

    def sq(a, b):
        return (
            f"list_aggregate(list_transform(list_zip({a}, {b}), "
            f"p -> power(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE), 2)), 'sum')"
        )

    def sl(col, s):
        return f"{col}[{s * PQ_SUBDIM + 1}:{(s + 1) * PQ_SUBDIM}]"

    code_ctes = [
        f"""codes{s} AS (
      SELECT vec_id, cid AS c{s} FROM (
        SELECT a.vec_id, c.cid,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq(sl('a.embedding', s), sl('c.ce', s))} ASC, c.cid) AS rk
        FROM norm a CROSS JOIN pqcents c
      ) WHERE rk = 1
    )"""
        for s in range(PQ_M)
    ]
    adc_terms = " + ".join(sq(sl("p.qe", s), sl(f"cb{s}.ce", s)) for s in range(PQ_M))
    cb_joins = "\n      ".join(f"JOIN pqcents cb{s} ON cb{s}.cid = ix.c{s}" for s in range(PQ_M))
    return f"""
    WITH nrm AS (
      SELECT vec_id, sqrt({dot('embedding', 'embedding')}) AS n FROM embeddings
    ), norm AS (
      SELECT e.vec_id,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE) / nrm.n) AS embedding
      FROM embeddings e JOIN nrm USING (vec_id)
    ), cents AS (
      SELECT vec_id AS centroid_id, embedding AS ce FROM norm
      WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos('c.ce', 'e.embedding')} DESC, c.centroid_id) AS rk
        FROM norm e CROSS JOIN cents c
      ) WHERE rk = 1
    ), pqcents AS (
      SELECT vec_id AS cid, embedding AS ce FROM norm WHERE vec_id % {PQ_STRIDE} = 0
    ), {', '.join(code_ctes)},
    ix AS (
      SELECT a.vec_id, a.centroid_id, {', '.join(f'codes{s}.c{s}' for s in range(PQ_M))}
      FROM assigned a {' '.join(f'JOIN codes{s} USING (vec_id)' for s in range(PQ_M))}
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM norm WHERE vec_id < {N_QUERIES}
    ), probes AS (
      SELECT query_id, qe, centroid_id FROM (
        SELECT q.query_id, q.qe, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {cos('c.ce', 'q.qe')} DESC, c.centroid_id) AS rk
        FROM q CROSS JOIN cents c
      ) WHERE rk <= {NPROBE}
    ), shortlist AS (
      SELECT query_id, qe, vec_id FROM (
        SELECT p.query_id, p.qe, ix.vec_id,
               row_number() OVER (PARTITION BY p.query_id
                 ORDER BY {adc_terms} ASC, ix.vec_id) AS ark
        FROM probes p
        JOIN ix USING (centroid_id)
        {cb_joins}
        WHERE ix.vec_id <> p.query_id
      ) WHERE ark <= {TOP_K * RERANK_FACTOR}
    ), rer AS (
      SELECT s.query_id, s.vec_id AS neighbor_id, {cos('s.qe', 'e.embedding')} AS cos
      FROM shortlist s JOIN norm e ON e.vec_id = s.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(ROUND(cos, 4) AS DOUBLE) AS cosine,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM rer
    )
    WHERE rk <= {TOP_K}
    """


@query("q_ann_ivf_pq", tags=("similarity", "llm"), oracle=_ivf_pq_oracle())
def q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ search with asymmetric distance computation (ADC) — the
    production ANN shape at 10⁹+ vectors (Jégou et al. 2011): coarse IVF
    probe narrows the scan to NPROBE buckets, PQ codes stand in for the
    vectors inside those buckets (32× less IO), each query scores codes
    via a per-query distance TABLE (subspace × centroid lookup, built
    once per query against the broadcast codebook), and only the ADC
    top-(k·RERANK_FACTOR) pay an exact-cosine re-rank.

    Plan shape: zero-shuffle coarse assign + PQ encode (broadcast
    codebooks), bucket-keyed candidate join, 8-row broadcast of the query
    distance tables, one window per stage. HASH-checked since r5: the oracle
    (``_ivf_pq_oracle``) replays the identical pipeline in DuckDB CTEs
    — same sequential-double folds, same explicit-order ADC sum, same
    (value, id) tiebreaks; recall vs the exact baseline stays floored
    in tests/test_ann.py."""
    return ivf_pq_topk(t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))


def ivf_pq_topk(raw, cent_row_fn=None):
    """The full IVF-PQ ADC pipeline as a reusable helper (r9: factored
    so trained PQ codebooks can be swapped in). ``cent_row_fn`` maps the
    L2-NORMALIZED embeddings table to a single-row broadcastable
    codebook in the :func:`pq_codebook_row` shape; None = the stride
    codebook (the qid's oracle replicates the stride, so the default
    must stay it). Pass ``kmeans.trained_pq_codebook_row`` for the
    trained variant — recall pinned in tests/test_ann.py."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.queries.similarity import (
        IVF_CENTROID_STRIDE,
        N_QUERIES,
        NPROBE,
        TOP_K,
        cosine,
        ivf_assign,
    )
    from incremental_dagster_delta_spark.tables import materialize_release

    if cent_row_fn is None:
        cent_row_fn = pq_codebook_row
    # L2-normalize first: on unit vectors ||a-b||² = 2 - 2·cos, so the
    # ADC's L2 ranking IS the cosine ranking the ground truth uses;
    # encoding the raw (unnormalized) vectors instead collapses recall
    # to ~0.05 because PQ then optimizes the wrong metric.
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    # zero-norm guard: NULL elements (DuckDB's x/0), not an ANSI abort —
    # see similarity.cosine's note (r15 review)
    nz_nrm = F.when(nrm != 0, nrm)
    from incremental_dagster_delta_spark.tables import fan_out

    # fan_out: the assign + PQ-encode passes are map-only over the scan's
    # partitioning — a single-split input serialized them onto one core
    # (r15 profile: three ~2.5 s single-task stages); no-op at scale.
    e = fan_out(raw, raw.sparkSession).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / nz_nrm).alias("embedding"),
    )
    assigned = ivf_assign(e).persist()  # (vec_id, embedding, centroid_id)
    cent_row = cent_row_fn(e)
    codes = pq_encode(assigned.select("vec_id", "embedding"), cent_row)
    indexed = assigned.select("vec_id", "centroid_id").join(codes, "vec_id").persist()

    queries = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # per-query ADC tables: for each subspace, map cid -> ||q_sub - ce||².
    # NB: the subspace index must be closed over with a factory function,
    # NOT a `lambda c, s=s:` default arg — PySpark treats a two-parameter
    # HOF lambda as (element, index) and passes the array index as the
    # second argument, silently shadowing the default.
    def _entry_fn(s: int):
        qsub = F.slice(F.col("qe"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
        return lambda c: F.struct(
            c["cid"].alias("k"), _sq_dist(c["ce"], qsub).alias("v")
        )

    dtables = queries.crossJoin(cent_row).select(
        "query_id",
        "qe",
        F.array(
            *[
                F.map_from_entries(F.transform(F.col(f"cents{s}"), _entry_fn(s)))
                for s in range(PQ_M)
            ]
        ).alias("dt"),
    )
    # coarse probe: NPROBE nearest centroids per query (exact, tiny)
    centroids = F.broadcast(
        e.where(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id"))
    probes = (
        dtables.join(centroids)
        .select("query_id", "qe", "dt", "centroid_id", cosine(F.col("ce"), F.col("qe")).alias("ccos"))
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= NPROBE)
        .select("query_id", "qe", "dt", "centroid_id")
    )
    # ADC scan of the probed buckets: distance = Σ_s dt[s][code_s]
    adc = F.aggregate(
        F.zip_with(
            F.col("dt"),
            F.col("codes"),
            lambda table, code: F.element_at(table, code),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cand = (
        probes.join(indexed, "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", adc.alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
    shortlist = (
        cand.withColumn("ark", F.row_number().over(wa))
        .where(F.col("ark") <= TOP_K * RERANK_FACTOR)
        .select("query_id", "qe", "vec_id")
    )
    # exact re-rank of the shortlist only
    rer = shortlist.join(e, "vec_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("embedding")).alias("cos"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    out = (
        rer.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).cast("double").alias("cosine"),
            F.col("rank").cast("long"),
        )
        .orderBy("query_id", "rank")
    )
    return materialize_release(out, assigned, indexed)


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation (round 11 continuation). MRL-trained
# embedding models (Kusupati et al., "Matryoshka Representation
# Learning", NeurIPS 2022) pack coarse-to-fine information into prefix
# dims, so serving can TRUNCATE vectors — 4× less memory and bandwidth —
# if retrieval quality holds. The accept/reject gate is exactly this
# measurement: top-k overlap between the full-dimension ranking and the
# prefix-truncated ranking, per query. Runs next to the quantizers
# because truncation is the third leg of the embedding-compression
# triad (SQ, PQ, MRL-truncation).
# ---------------------------------------------------------------------------

MAT_DIM = 16  # prefix dims kept (64 → 16 = 4× compression)
MAT_QUERIES = 8  # vec_id < 8 are the query vectors (similarity.py convention)
MAT_K = 10  # overlap measured at this depth


def _ranked_sql(vq: str, ve: str) -> str:
    """Shared oracle CTE body: per-query cosine top-MAT_K with (rk)
    exposed — the ONE definition of the float-parity-critical ranking
    SQL used by both _matryoshka_oracle and _rbo_oracle (r15 review:
    previously two near-verbatim copies that had begun to drift)."""
    return f"""
      SELECT query_id, neighbor_id, rk FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip({vq}, {ve}),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
                 (sqrt(list_aggregate(list_transform({vq}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
                  sqrt(list_aggregate(list_transform({ve}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                 DESC, e.vec_id) AS rk
        FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {MAT_QUERIES}) q
        JOIN embeddings e ON e.vec_id <> q.vec_id
      ) WHERE rk <= {MAT_K}"""


def _matryoshka_oracle() -> str:
    return f"""
    WITH full_k AS ({_ranked_sql("q.embedding", "e.embedding")}),
    trunc_k AS ({_ranked_sql(f"q.embedding[1:{MAT_DIM}]", f"e.embedding[1:{MAT_DIM}]")})
    SELECT f.query_id,
           COUNT(t.neighbor_id) AS n_common,
           CAST(ROUND(COUNT(t.neighbor_id) / CAST({MAT_K} AS DOUBLE), 4) AS DOUBLE) AS overlap_at_k
    FROM full_k f
    LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """


def _ranked_topk(e, q, vec_q, vec_e, k):
    """Per-query cosine top-k with ranks (q_cosine_topk's shape): broadcast
    queries, map-only scoring, row_number cut to the literal k (rewritten
    to WindowGroupLimit — per-partition k-row heaps before the shuffle).
    Shared by q_matryoshka_eval (set overlap) and q_rbo_eval (rank-aware
    overlap)."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.queries.similarity import cosine

    scored = (
        e.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(vec_q, vec_e).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )


@query("q_matryoshka_eval", tags=("similarity", "llm"), oracle=_matryoshka_oracle())
def q_matryoshka_eval(spark, sf_dir):
    """Matryoshka-truncation quality gate: for each query vector, the
    top-MAT_K cosine neighborhood under the FULL 64-dim embedding vs
    under the first-MAT_DIM prefix, reported as overlap@k. The ranking
    pass is q_cosine_topk's exact shape twice — broadcast queries,
    map-only scoring, per-query row_number cut to a LITERAL k (Spark
    rewrites the rank filter to WindowGroupLimit: each partition keeps
    a k-row heap per query before the shuffle, so no query ever owns a
    corpus-sized task) — and the overlap join touches 2·Q·k rows.
    Truncation itself is F.slice: map-only, no shuffle, the whole point
    of MRL serving. Ties break on neighbor_id; the overlap COUNT is
    integer-exact, so the only float surface is the final division."""
    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") < MAT_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    full_k = _ranked_topk(e, q, F.col("qe"), F.col("embedding"), MAT_K).drop("rk")
    trunc_k = _ranked_topk(
        e, q, F.slice(F.col("qe"), 1, MAT_DIM), F.slice(F.col("embedding"), 1, MAT_DIM), MAT_K
    ).drop("rk")
    tk = trunc_k.select(
        F.col("query_id").alias("t_qid"), F.col("neighbor_id").alias("t_nid")
    )
    return (
        full_k.join(
            tk,
            (F.col("t_qid") == F.col("query_id")) & (F.col("t_nid") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("t_nid").alias("n_common"),
            F.round(F.count("t_nid") / float(MAT_K), 4).cast("double").alias("overlap_at_k"),
        )
    )


# --- rank-biased overlap ----------------------------------------------------------
#
# RBO (Webber, Moffat & Zobel, TOIS 2010): top-weighted agreement
# between two rankings — the metric to report when the POSITIONS of the
# shared items matter, not just membership (overlap@k treats rank 1 and
# rank k the same; RBO discounts depth geometrically). Truncated to
# depth K with no extrapolation: RBO_K = (1-p)·Σ_{d=1..K} p^{d-1}·X_d/d
# where X_d = |A_1..d ∩ B_1..d|. Regrouped per shared ITEM: an item
# first counted at depth m = max(rank_A, rank_B) contributes
# w(m) = (1-p)·Σ_{d=m..K} p^{d-1}/d — a K-entry constant table, embedded
# as identical decimal literals in BOTH engines so the only cross-engine
# float surface is a sum of identical doubles.

RBO_P = 0.9  # persistence: top-weightedness dial


def _rbo_weights(p: float = RBO_P, k: int = MAT_K) -> list[float]:
    return [(1 - p) * sum(p ** (d - 1) / d for d in range(m, k + 1)) for m in range(1, k + 1)]


def _rbo_oracle() -> str:
    w = _rbo_weights()
    cases = " ".join(
        f"WHEN {m} THEN {w[m - 1]!r}" for m in range(1, MAT_K + 1)
    )
    return f"""
    WITH full_k AS ({_ranked_sql("q.embedding", "e.embedding")}),
    trunc_k AS ({_ranked_sql(f"q.embedding[1:{MAT_DIM}]", f"e.embedding[1:{MAT_DIM}]")}),
    joined AS (
      SELECT f.query_id,
             CASE GREATEST(f.rk, t.rk) {cases} END AS w
      FROM full_k f JOIN trunc_k t
        ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    ), queries AS (SELECT DISTINCT query_id FROM full_k)
    SELECT q.query_id,
           CAST(COUNT(j.w) AS BIGINT) AS n_common,
           CAST(ROUND(COALESCE(SUM(j.w), 0.0), 4) AS DOUBLE) AS rbo
    FROM queries q LEFT JOIN joined j ON j.query_id = q.query_id
    GROUP BY q.query_id
    """


@query("q_rbo_eval", tags=("similarity", "analytics", "llm"), oracle=_rbo_oracle())
def q_rbo_eval(spark, sf_dir):
    """Rank-biased overlap between the full-dimension and
    prefix-truncated cosine rankings — the rank-aware companion to
    q_matryoshka_eval's set overlap (two rankings can share all k items
    yet order them oppositely; RBO tells them apart, overlap@k cannot).
    Both rankings come from the shared _ranked_topk builder
    (WindowGroupLimit heaps, no corpus-sized task); the per-item weight
    w(max(rank_A, rank_B)) is a K-entry broadcast of constants computed
    once and embedded IDENTICALLY in the DuckDB oracle, so the engines
    sum the same doubles; the join and aggregate touch Q·K rows."""
    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") < MAT_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    full_k = _ranked_topk(e, q, F.col("qe"), F.col("embedding"), MAT_K)
    trunc_k = _ranked_topk(
        e, q, F.slice(F.col("qe"), 1, MAT_DIM), F.slice(F.col("embedding"), 1, MAT_DIM), MAT_K
    ).select(
        F.col("query_id").alias("t_qid"),
        F.col("neighbor_id").alias("t_nid"),
        F.col("rk").alias("t_rk"),
    )
    w = _rbo_weights()
    weight = None
    m = F.greatest(F.col("rk"), F.col("t_rk"))
    for i in range(MAT_K, 0, -1):
        weight = F.lit(w[i - 1]) if weight is None else F.when(m == i, F.lit(w[i - 1])).otherwise(weight)
    joined = full_k.join(
        trunc_k,
        (F.col("t_qid") == F.col("query_id")) & (F.col("t_nid") == F.col("neighbor_id")),
        "left",
    ).select("query_id", F.when(F.col("t_rk").isNotNull(), weight).alias("w"))
    return joined.groupBy("query_id").agg(
        F.count("w").cast("long").alias("n_common"),
        F.round(F.coalesce(F.sum("w"), F.lit(0.0)), 4).cast("double").alias("rbo"),
    )
