"""Maximal-marginal-relevance (MMR) diversity re-ranking (Carbonell &
Goldstein 1998) — the standard fix for an ANN/retrieval shortlist full of
near-duplicates: greedily pick the candidate maximizing
``λ·relevance − (1−λ)·max-similarity-to-already-picked``.

Engine shape: MMR is a *re-ranker*, not a search — it runs on the top-K
shortlist an upstream searcher (q_cosine_topk / IVF / IVF-PQ) already
produced, so the expensive part (scoring the corpus) is the searcher's
problem and the greedy itself touches K rows per query. The distributed
plan is therefore: one broadcast-queries scoring pass → per-query top-K
cut → candidate×candidate similarity *within* each query's shortlist
(K² per query, never corpus-quadratic) → a per-query sequential greedy.
The greedy is inherently sequential in the pick index (pick r depends on
picks 1..r-1) — exactly the applyInPandas-per-group case from the build
brief: one shuffle keyed on query_id, then pure integer arithmetic per
group.

Float determinism (the q_mad_outliers integer trick): relevance and
pairwise cosines are rounded to 6 dp and scaled to BIGINT *before* the
greedy, and λ=0.7 becomes integer weights (7·rel6 − 3·maxsim6), so every
objective comparison is exact integer comparison with a neighbor_id
tiebreak — the unrolled-CTE oracle replays the identical picks with zero
float-boundary risk beyond the single repo-standard ROUND.
"""

# No `from __future__ import annotations`: pandas UDF type hints must stay
# real types for PySpark signature inference (similarity.py precedent).
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t
from incremental_dagster_delta_spark.queries.similarity import N_QUERIES, cosine

MMR_CAND_K = 20  # shortlist size fed to the re-ranker
MMR_PICKS = 5  # diversified results returned per query
MMR_REL_W = 7  # λ = 0.7, in tenths:  obj = 7·rel6 − 3·maxsim6
MMR_DIV_W = 3

_GREEDY_SCHEMA = "query_id long, pick_rank long, neighbor_id long, rel6 long, mmr_obj long"


def mmr_rerank(cand, picks: int = MMR_PICKS, rel_w: int = MMR_REL_W, div_w: int = MMR_DIV_W):
    """Greedy MMR over a per-query candidate table ``(query_id, nid,
    rel6 BIGINT, emb)``. Returns (query_id, pick_rank, neighbor_id,
    rel6, mmr_obj) — mmr_obj is the scaled integer objective
    ``rel_w·rel6 − div_w·max(sim6 to picked)`` (pick 1: ``rel_w·rel6``).

    The candidate×candidate similarity matrix is computed JVM-side (the
    same zip_with fold as relevance, so the oracle's fold matches), and
    only the integer greedy runs in Python — per group the input is
    K·(K−1) pair rows, so Arrow batch size is bounded by K² regardless
    of corpus size.

    PRECONDITION: every cand row has non-NULL rel6 and a non-zero-norm
    emb (q_mmr_rerank filters rel6 IS NOT NULL, which implies both) —
    a NULL rel6/sim6 reaching the greedy becomes float64 NaN through
    Arrow and int() raises, aborting the query (r15 review)."""
    import pandas as pd

    from incremental_dagster_delta_spark.tables import materialize_release

    cand = cand.persist()
    # ^ referenced three times below (both self-join sides + carriers);
    # unpersisted, the upstream scoring pass would run three times
    a, b = cand.alias("a"), cand.alias("b")
    pairs = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id")) & (F.col("a.nid") != F.col("b.nid")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.nid").alias("a_id"),
        F.col("a.rel6").alias("rel_a6"),
        F.col("b.nid").alias("b_id"),
        F.round(cosine(F.col("a.emb"), F.col("b.emb")) * 1e6, 0).cast("long").alias("sim6"),
    )
    # Partnerless carrier rows (b_id/sim6 NULL): a query whose shortlist
    # has exactly ONE candidate produces no pair rows, so without these
    # the group never reaches the greedy and the engine would emit zero
    # rows where the oracle's s1 still picks the lone candidate —
    # an engine/oracle divergence (single-candidate pin in test_ann.py).
    carriers = cand.select(
        "query_id",
        F.col("nid").alias("a_id"),
        F.col("rel6").alias("rel_a6"),
        F.lit(None).cast("long").alias("b_id"),
        F.lit(None).cast("long").alias("sim6"),
    )
    pairs = pairs.unionByName(carriers)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel: dict[int, int] = {}
        sim: dict[tuple[int, int], int] = {}
        for r in pdf.itertuples(index=False):
            rel[int(r.a_id)] = int(r.rel_a6)
            if not pd.isna(r.b_id):
                sim[(int(r.a_id), int(r.b_id))] = int(r.sim6)
        remaining = set(rel)
        selected: list[int] = []
        out = []
        for rank in range(1, picks + 1):
            if not remaining:
                break
            best_obj, best_c = None, None
            for c in sorted(remaining):  # ascending id = deterministic tiebreak
                obj = rel_w * rel[c]
                if selected:
                    obj -= div_w * max(sim[(c, s)] for s in selected)
                if best_obj is None or obj > best_obj:
                    best_obj, best_c = obj, c
            out.append((qid, rank, best_c, rel[best_c], best_obj))
            selected.append(best_c)
            remaining.discard(best_c)
        return pd.DataFrame(
            out, columns=["query_id", "pick_rank", "neighbor_id", "rel6", "mmr_obj"]
        )

    out = pairs.groupBy("query_id").applyInPandas(greedy, schema=_GREEDY_SCHEMA)
    return materialize_release(out, cand)


def _sql_cos(x: str, y: str) -> str:
    def ss(v: str) -> str:
        return f"list_aggregate(list_transform({v}, w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE)), 'sum')"

    dot = (
        f"list_aggregate(list_transform(list_zip({x}, {y}),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )
    return f"({dot} / (sqrt({ss(x)}) * sqrt({ss(y)})))"


def _mmr_oracle() -> str:
    """Unrolled greedy: sel{k} accumulates picks; r{k} scores the
    remaining candidates against sel{k-1} (max over picked sims); s{k}
    is the integer argmax with the nid tiebreak."""
    ctes = [
        f"q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings"
        f" WHERE vec_id < {N_QUERIES})",
        # rel6 IS NOT NULL drops zero-norm vectors (cosine x/0 -> NULL on
        # both engines) — a zero QUERY drops its whole group; matches the
        # Spark-side filter (r15 review, pinned in test_short_docs.py)
        "scored AS (SELECT * FROM (SELECT q.query_id, e.vec_id AS nid,"
        f" CAST(ROUND({_sql_cos('q.qe', 'e.embedding')} * 1000000, 0) AS BIGINT) AS rel6,"
        " e.embedding AS emb FROM q JOIN embeddings e ON e.vec_id <> q.query_id)"
        " WHERE rel6 IS NOT NULL)",
        "cand AS (SELECT query_id, nid, rel6, emb FROM (SELECT *,"
        " row_number() OVER (PARTITION BY query_id ORDER BY rel6 DESC, nid) AS rk"
        f" FROM scored) WHERE rk <= {MMR_CAND_K})",
        "pairs AS (SELECT a.query_id, a.nid AS a_id, b.nid AS b_id,"
        f" CAST(ROUND({_sql_cos('a.emb', 'b.emb')} * 1000000, 0) AS BIGINT) AS sim6"
        " FROM cand a JOIN cand b ON b.query_id = a.query_id AND b.nid <> a.nid)",
        f"s1 AS (SELECT query_id, nid, rel6, CAST({MMR_REL_W} * rel6 AS BIGINT) AS obj"
        " FROM (SELECT *, row_number() OVER (PARTITION BY query_id"
        " ORDER BY rel6 DESC, nid) AS rk FROM cand) WHERE rk = 1)",
        "sel1 AS (SELECT query_id, nid FROM s1)",
    ]
    for k in range(2, MMR_PICKS + 1):
        ctes.append(
            f"r{k} AS (SELECT c.query_id, c.nid, c.rel6,"
            f" CAST({MMR_REL_W} * c.rel6 - {MMR_DIV_W} * MAX(p.sim6) AS BIGINT) AS obj"
            " FROM cand c"
            " JOIN pairs p ON p.query_id = c.query_id AND p.a_id = c.nid"
            f" JOIN sel{k - 1} s ON s.query_id = p.query_id AND s.nid = p.b_id"
            f" WHERE NOT EXISTS (SELECT 1 FROM sel{k - 1} x"
            " WHERE x.query_id = c.query_id AND x.nid = c.nid)"
            " GROUP BY c.query_id, c.nid, c.rel6)"
        )
        ctes.append(
            f"s{k} AS (SELECT query_id, nid, rel6, obj FROM (SELECT *,"
            " row_number() OVER (PARTITION BY query_id ORDER BY obj DESC, nid) AS rk"
            f" FROM r{k}) WHERE rk = 1)"
        )
        ctes.append(
            f"sel{k} AS (SELECT query_id, nid FROM sel{k - 1}"
            f" UNION ALL SELECT query_id, nid FROM s{k})"
        )
    selects = [
        f"SELECT query_id, CAST({k} AS BIGINT) AS pick_rank, nid AS neighbor_id,"
        f" rel6, obj AS mmr_obj FROM s{k}"
        for k in range(1, MMR_PICKS + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@query("q_mmr_rerank", tags=("similarity", "retrieval", "llm"), oracle=_mmr_oracle())
def q_mmr_rerank(spark, sf_dir):
    """MMR-diversified top-5 from each query's exact cosine top-20
    shortlist. Scoring pass is the q_cosine_topk plan (broadcast
    queries, zip_with folds, per-query window cut); the greedy itself is
    one applyInPandas over K²-bounded per-query groups, all-integer (see
    module docstring). At 100 TB the shortlist comes from the IVF/PQ
    searchers instead — the re-ranker is shape-identical because it
    never sees the corpus, only the K candidates per query."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        e.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nid"),
            F.round(cosine(F.col("qe"), F.col("embedding")) * 1e6, 0).cast("long").alias("rel6"),
            F.col("embedding").alias("emb"),
        )
        # zero-norm vectors rank as NULL — exclude them (and a zero
        # query's whole group) BEFORE the shortlist so no NULL reaches
        # the integer greedy; the oracle filters identically
        .where(F.col("rel6").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel6").desc(), F.col("nid"))
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MMR_CAND_K)
        .drop("rk")
    )
    return mmr_rerank(cand)
