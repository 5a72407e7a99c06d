"""Trained Lloyd's k-means coarse quantizer (r8 verdict ask #2).

The IVF / SemDeDup / PQ family all quantize against a deterministic
stride-sampled centroid set — the one untrained component left in the
ANN stack. This module trains the centroids with Lloyd's algorithm and
exposes them for the IVF pipeline (``similarity.ivf_topk(centroids=...)``).

Determinism — quantized-grid Lloyd's, zero libm surface. Embeddings are
snapped to an integer grid up front (``floor(x·1000 + 0.5)`` — float→
double cast and one multiply, IEEE-identical in Spark and DuckDB), so

- every distance is an exact BIGINT (Σ (x−c)², dim 64, |xq| ≤ ~600 →
  ≤ ~9e7, no overflow), and the argmin + centroid_id tiebreak is exact
  integer comparison — no cross-engine float boundary anywhere;
- each round's centroid update re-snaps the per-dimension mean to the
  same grid: ``floor(Σxq / n + 0.5)``. The sum of integer-valued
  doubles is exact in ANY accumulation order (< 2^53), and IEEE
  division + floor are bit-identical across engines — so unlike
  ``ln``-based scores there is no boundary-margin to measure.

Scale shape — the canonical distributed Lloyd's:

- assignment is MAP-ONLY: the K-row centroid table is driver-collected
  (K·d ≤ a few thousand ints at any corpus size — bounded by
  construction, the legitimate collect) and closed over by an
  Arrow-batched ``mapInPandas`` kernel doing one exact int64 numpy
  matmul per batch. No shuffle, no N×K row explosion.
- the update is two map-side-combinable aggregations: posexplode to
  (centroid, dim) partial sums (the one corpus-wide shuffle, N·d rows
  combined map-side), then a K-row reassembly. Empty clusters keep
  their previous centroid (LEFT JOIN + COALESCE, oracle-mirrored).
- rounds are a fixed T=4 with a per-round ``localCheckpoint`` on the
  K-row centroid table (the graph.py iteration discipline) — lineage
  stays O(1) per round and nothing corpus-sized is ever materialized.

Oracle — the q_bpe_merges device: the full training loop unrolled as a
chained-CTE block per round (assign → per-dim mean → re-snap), bitwise
the same arithmetic as the Spark path.

Reference parity note: the reference repo (ingest_example/) has no
vector operators; this extends the engine's ANN surface per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.registry import query, t
from incremental_dagster_delta_spark.queries.similarity import IVF_CENTROID_STRIDE

KM_SCALE = 1000  # integer grid: xq = floor(x * KM_SCALE + 0.5)
KM_STRIDE = IVF_CENTROID_STRIDE  # deterministic init: vec_id % STRIDE == 0
KM_ROUNDS = 4  # fixed Lloyd's iterations (oracle unrolls the same T)


def quantize_embeddings(e: DataFrame) -> DataFrame:
    """(vec_id, xq): embeddings snapped to the integer grid."""
    xq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5)).cast("long"),
    )
    return e.select("vec_id", xq.alias("xq"))


def assign_nearest_sq(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Map-only integer-argmin assignment: collect the K-row centroid
    table to the driver (K·d BIGINTs — bounded by construction at any
    corpus size, the documented-legit collect, cf. linalg.py's d²-cell)
    and score inside ``mapInPandas`` with exact int64 numpy:
    d = ‖x‖² − 2·X·Cᵀ + ‖c‖², all int64 (no float surface — numpy
    integer matmul is exact), argmin per row. Centroid rows are sorted
    by centroid_id before stacking, so numpy's first-minimum argmin IS
    the lower-centroid_id tiebreak.

    A JVM higher-order-function fold was the first implementation and
    was replaced for cause: Catalyst evaluates lambda folds per
    ELEMENT interpreted (N·K·d ≈ 5M expression evals per assignment at
    sf0.1), measured ~4× slower end-to-end than the Arrow-batched
    matmul. No shuffle either way — this is the map-only stage.

    ``vectors``: (vec_id, xq); ``centroids``: (centroid_id, cq).
    Returns (vec_id, xq, centroid_id, dist).
    """
    import numpy as np

    rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    C = np.array([r["cq"] for r in rows], dtype=np.int64)  # K×d
    return _assign_with_arrays(vectors, cids, C)


def _assign_with_arrays(vectors: DataFrame, cids, C) -> DataFrame:
    """:func:`assign_nearest_sq` with the centroid table already on the
    driver as numpy arrays — the training loop holds it there across
    rounds, so re-collecting a DataFrame every round is pure job
    overhead (r14: the tiny-stage profile this loop was paying for)."""
    import numpy as np
    import pandas as pd

    c_sq = (C * C).sum(axis=1)  # K

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["xq"].tolist(), dtype=np.int64)  # B×d
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + c_sq[None, :]
            j = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "xq": pdf["xq"],
                    "centroid_id": cids[j],
                    "dist": d[np.arange(len(j)), j],
                }
            )

    return vectors.select("vec_id", "xq").mapInPandas(
        assign, "vec_id long, xq array<long>, centroid_id long, dist long"
    )


def _partials_with_arrays(vectors: DataFrame, cids, C) -> DataFrame:
    """Lloyd's per-(centroid, dim) partial sums FUSED into the
    assignment pass (r16, guide §4.2 — hand whole batches to numpy):
    each task assigns its rows with the same exact int64 matmul as
    :func:`_assign_with_arrays` and emits its K·d partial rows
    directly, so the per-round job skips the B×d posexplode + map-side
    hash-aggregate entirely — the only shuffled bytes are K·d rows per
    task. The partials are integer sums over disjoint row sets, so
    reducing them with sum() reproduces :func:`_pos_sums` over the full
    assignment bit-exactly (same argmin expression, same first-minimum
    = lowest-centroid_id tiebreak via the sorted cids)."""
    import numpy as np
    import pandas as pd

    c_sq = (C * C).sum(axis=1)  # K
    K, d = C.shape

    def partials(batches):
        S = np.zeros((K, d), dtype=np.int64)
        N = np.zeros(K, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["xq"].tolist(), dtype=np.int64)  # B×d
            dist = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + c_sq[None, :]
            j = np.argmin(dist, axis=1)
            np.add.at(S, j, X)
            N += np.bincount(j, minlength=K)
        ks = np.nonzero(N)[0]
        if len(ks):
            yield pd.DataFrame(
                {
                    "centroid_id": np.repeat(cids[ks], d),
                    "pos": np.tile(np.arange(d, dtype=np.int32), len(ks)),
                    "s": S[ks].ravel(),
                    "n": np.repeat(N[ks], d),
                }
            )

    per_task = vectors.select("xq").mapInPandas(
        partials, "centroid_id long, pos int, s long, n long"
    )
    return per_task.groupBy("centroid_id", "pos").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    )


def _pos_sums(assigned: DataFrame) -> DataFrame:
    """(centroid_id, pos, s, n): per-(centroid, dim) integer sums and
    member counts from an assignment — map-side combined, K·d rows out.
    These are the MERGEABLE Lloyd's partials: sums and counts are
    additive across disjoint row sets, so per-batch partials folded
    with :func:`merge_partials_update` reproduce the full-corpus
    update bit-exactly (pinned in tests/test_kmeans.py)."""
    return (
        assigned.select("centroid_id", F.posexplode("xq").alias("pos", "v"))
        .groupBy("centroid_id", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )


def _update_centroids(assigned: DataFrame, old: DataFrame) -> DataFrame:
    """One Lloyd's update: per-(centroid, dim) integer sums (map-side
    combined), re-snap the mean to the grid, reassemble the K arrays;
    empty clusters keep their previous centroid.

    NOT on the hot path since the r14 one-job-per-round rework — the
    live trainer collects :func:`_pos_sums` partials and updates in
    numpy (see ``_train``). Kept as the all-DataFrame reference update:
    tests/test_kmeans.py pins the numpy path bit-identical to this one,
    which is what makes the rework's equivalence checkable at all."""
    return _reassemble(_pos_sums(assigned), old)


def _reassemble(sums: DataFrame, old: DataFrame) -> DataFrame:
    """Grid-snapped mean + K-array reassembly from (centroid_id, pos,
    s, n) sums — the second half of a Lloyd's update, shared by the
    one-shot trainer and the mini-batch merge path. The mean is exact:
    integer-valued doubles sum exactly in any order (< 2^53), and IEEE
    division + floor are bit-identical across engines."""
    means = (
        sums.select(
            "centroid_id",
            F.struct(
                "pos",
                F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
                .cast("long")
                .alias("cv"),
            ).alias("pv"),
        )
        .groupBy("centroid_id")
        .agg(
            F.transform(F.array_sort(F.collect_list("pv")), lambda s: s["cv"]).alias(
                "cq_new"
            )
        )
    )
    return old.join(means, "centroid_id", "left").select(
        "centroid_id", F.coalesce("cq_new", "cq").alias("cq")
    )


def _train(vec: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` Lloyd's iterations over a prepared (vec_id, xq) table.

    r14 stage-count rework (VERDICT r13 #2; interleaved A/B in
    docs/PLANS.md): the K·d centroid state lives ON THE DRIVER between
    rounds — it is shipped to the assignment closure anyway — so each
    round is exactly ONE job: map-only assignment → the posexplode
    (centroid, dim) partial-sum shuffle (:func:`_pos_sums`, the
    map-side-combined shape that A/B-beat a 64-column wide aggregate by
    1.3×) → collect the K·d partial rows → numpy update on the driver.
    This drops the old per-round localCheckpoint job, the reassembly's
    second shuffle + join, and the per-round centroid re-collect. The
    update uses the identical IEEE ops the old in-plan expression used
    (floor(s/n + 0.5) on exact-integer doubles), so results are
    bit-identical (asserted in the A/B harness and pinned by
    tests/test_kmeans.py's python-reference comparison) and the DuckDB
    oracle chain is untouched. Empty clusters keep their previous
    centroid (absent from the partials = untouched row of C).

    Scale: per round the cluster does one corpus-partitioned map + one
    K·d-group aggregate; driver state is K·d ints — bounded regardless
    of corpus size (the documented-legit collect class)."""
    import numpy as np

    spark = vec.sparkSession
    init = vec.where(F.col("vec_id") % KM_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
    )
    rows = sorted(init.collect(), key=lambda r: r["centroid_id"])
    cids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    C = np.array([r["cq"] for r in rows], dtype=np.int64)
    for _ in range(rounds):
        # fused assignment+partials (r16): one python pass per round,
        # K·d rows shuffled per task instead of the B×d posexplode
        partials = _partials_with_arrays(vec, cids, C).collect()  # K·d rows
        sums = np.zeros_like(C, dtype=np.float64)
        counts = np.zeros(len(cids), dtype=np.float64)
        touched = np.zeros(len(cids), dtype=bool)
        for r in partials:
            k = int(np.searchsorted(cids, r["centroid_id"]))
            sums[k, r["pos"]] = r["s"]
            counts[k] = r["n"]
            touched[k] = True
        C[touched] = np.floor(
            sums[touched] / counts[touched, None] + 0.5
        ).astype(np.int64)
    from incremental_dagster_delta_spark.tables import literal_df

    # literal_df: the K-row result must not cost a defaultParallelism-
    # wide python round-trip per materialization (tables.literal_df)
    return literal_df(
        spark,
        [(int(c), [int(x) for x in row]) for c, row in zip(cids, C)],
        "centroid_id long, cq array<long>",
    )


def _prepared_vec(e: DataFrame) -> DataFrame:
    """Quantize the vector side and split it to the CURRENT shuffle
    partition count when the scan arrives under-split (a small
    single-file parquet is ONE split, serializing every assignment onto
    one core). Targeting ``spark.sql.shuffle.partitions`` rather than a
    fixed fan_out multiple matters here because the training loop is
    ~25 tiny stages: the qid wraps itself in ``tables.sized_shuffle``
    (registry _SIZED_SHUFFLE), so at gate scale the count is sized from
    the table's on-disk bytes (≈8 tasks/stage, not 64 — the per-task
    constant costs dominate sub-GB rounds), while a 100 TB scan is
    already well-split and this is a no-op."""
    spark = e.sparkSession
    vec = quantize_embeddings(e)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if vec.rdd.getNumPartitions() < target:
        vec = vec.repartition(target)
    return vec


def lloyd_centroids(e: DataFrame, rounds: int = KM_ROUNDS) -> DataFrame:
    """Train the coarse quantizer: stride-sampled init, ``rounds`` full
    Lloyd's iterations. Returns (centroid_id, cq) on the integer grid.
    The quantized table is persisted across the rounds (N rows of d
    BIGINTs — much smaller than the raw corpus, partitioned across
    executors on a real cluster) and released before returning: the
    trained K-row result is already checkpoint-truncated, so nothing
    references the cache afterwards."""
    vec = _prepared_vec(e).persist()
    try:
        return _train(vec, rounds)
    finally:
        vec.unpersist()


def trained_centroids(e: DataFrame, rounds: int = KM_ROUNDS) -> DataFrame:
    """(centroid_id, ce) with the trained centroids mapped back to
    doubles — drop-in for the IVF pipeline's stride centroid table
    (``similarity.ivf_topk(..., centroids=trained_centroids(e))``)."""
    cents = lloyd_centroids(e, rounds)
    return cents.select(
        "centroid_id",
        F.transform(F.col("cq"), lambda v: v.cast("double") / KM_SCALE).alias("ce"),
    )


_DIST_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
)


def _km_oracle(rounds: int = KM_ROUNDS, where: str = "") -> str:
    """Chained-CTE DuckDB oracle: quantize → stride init → per round
    (argmin assign with id tiebreak → per-dim mean → grid re-snap with
    empty-cluster carry) → final assignment stats. Generated
    programmatically — the SQL is the same 2-CTE block × T. ``where``
    optionally restricts the TRAINING set (e.g. the corpus half of an
    incremental split) — the init stride then samples within it, exactly
    like ``_train`` over a filtered DataFrame."""
    parts = [
        f"""WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT)) AS xq
      FROM embeddings {where}
    ), c0 AS (
      SELECT vec_id AS cid, xq AS cq FROM e WHERE vec_id % {KM_STRIDE} = 0
    )"""
    ]
    for k in range(rounds):
        d = _DIST_SQL.format(a="e.xq", b="c.cq")
        parts.append(f""", a{k} AS (
      SELECT vec_id, xq, cid FROM (
        SELECT e.vec_id, e.xq, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {d} ASC, c.cid) AS rk
        FROM e CROSS JOIN c{k} c
      ) WHERE rk = 1
    ), m{k} AS (
      SELECT cid, list(cv ORDER BY pos) AS cq FROM (
        SELECT cid, pos,
               CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
        FROM (
          SELECT cid, xq[pos] AS v, pos FROM (
            SELECT cid, xq, unnest(range(1, len(xq) + 1)) AS pos FROM a{k}
          )
        ) GROUP BY cid, pos
      ) GROUP BY cid
    ), c{k + 1} AS (
      SELECT c.cid, COALESCE(m.cq, c.cq) AS cq
      FROM c{k} c LEFT JOIN m{k} m USING (cid)
    )""")
    d = _DIST_SQL.format(a="e.xq", b="c.cq")
    parts.append(f""", af AS (
      SELECT vec_id, cid, d FROM (
        SELECT e.vec_id, c.cid, {d} AS d,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {d} ASC, c.cid) AS rk
        FROM e CROSS JOIN c{rounds} c
      ) WHERE rk = 1
    )
    SELECT c.cid AS centroid_id,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_assigned,
           CAST(COALESCE(s.inertia, 0) AS BIGINT) AS inertia,
           array_to_string(list_transform(c.cq, x -> CAST(x AS VARCHAR)), ',') AS centroid
    FROM c{rounds} c
    LEFT JOIN (SELECT cid, COUNT(*) AS n, SUM(d) AS inertia FROM af GROUP BY cid) s
      USING (cid)""")
    return "".join(parts)


_COS_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /"
    " (sqrt(list_aggregate(list_transform({a},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *"
    " sqrt(list_aggregate(list_transform({b},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)


def _km_cte_chain(rounds: int = KM_ROUNDS, where: str = "") -> str:
    """The training CTE chain alone (everything up to c{rounds}),
    reusable as a prefix by composed oracles. ``where`` restricts the
    training set (see :func:`_km_oracle`)."""
    full = _km_oracle(rounds, where)
    return full[: full.index(", af AS (")]


def _ivf_trained_oracle(
    rounds: int = KM_ROUNDS, where: str = "", batch_mod: int | None = None
) -> str:
    """The IVF search oracle with the TRAINED centroid table spliced in:
    the k-means training chain (exact-integer, no float surface) feeds a
    cents CTE (grid coords / KM_SCALE — IEEE division, bit-identical
    both engines), then the same assigned → probes → scored → rank
    replay as similarity._IVF_ORACLE with the same sequential-double
    cosine the exact-topk oracle proved bit-stable (scores rounded 4 dp,
    ties broken on ids before rounding).

    ``where`` restricts the TRAINING set only (the assignment always
    covers the full table — for the incremental qid, that IS the
    rebuild the fold must equal); ``batch_mod`` adds a ``from_batch``
    provenance column (vec_id % batch_mod = 0)."""
    from incremental_dagster_delta_spark.queries.similarity import (
        NPROBE,
        N_QUERIES,
        TOP_K,
    )

    cos_assign = _COS_SQL.format(a="c.ce", b="v.embedding")
    cos_probe = _COS_SQL.format(a="c.ce", b="q.qe")
    cos_score = _COS_SQL.format(a="p.qe", b="a.embedding")
    batch_sel = (
        f", a.vec_id % {batch_mod} = 0 AS from_batch" if batch_mod else ""
    )
    batch_col = ", from_batch" if batch_mod else ""
    return (
        _km_cte_chain(rounds, where)
        + f""", cents AS (
      SELECT cid AS centroid_id,
             list_transform(cq, x -> CAST(x AS DOUBLE) / {KM_SCALE}) AS ce
      FROM c{rounds}
    ), assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT v.vec_id, v.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {cos_assign} DESC, c.centroid_id) AS rk
        FROM embeddings v CROSS JOIN cents c
      ) WHERE rk = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ), probes AS (
      SELECT query_id, qe, centroid_id FROM (
        SELECT q.query_id, q.qe, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {cos_probe} DESC, c.centroid_id) AS rk
        FROM q CROSS JOIN cents c
      ) WHERE rk <= {NPROBE}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, {cos_score} AS cos{batch_sel}
      FROM probes p JOIN assigned a USING (centroid_id)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(ROUND(cos, 4) AS DOUBLE) AS cosine,
           CAST(rk AS BIGINT) AS rank{batch_col}
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    WHERE rk <= {TOP_K}"""
    )


@query(
    "q_cosine_ann_ivf_trained",
    tags=("similarity", "llm", "trained"),
    oracle=_ivf_trained_oracle(),
)
def q_cosine_ann_ivf_trained(spark, sf_dir):
    """IVF top-k with the TRAINED Lloyd's quantizer end-to-end — the
    deployment configuration (train once, search many), hash-checked as
    one lineage: the composed oracle unrolls the k-means training and
    splices its dequantized centroids into the standard IVF replay.
    Recall vs both the exact baseline and the stride-init IVF is pinned
    in tests/test_ann.py (0.675 → 0.725 at sf0.01)."""
    from incremental_dagster_delta_spark.queries.similarity import ivf_topk

    e = t(spark, sf_dir, "embeddings")
    return ivf_topk(e, trained_centroids(e))


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (r14 verdict ask #7): the INDEX-side
# twin of the incremental probe trio (q_incremental_dedup /
# q_dhash_incremental / q_semdedup_incremental). Those keep a deduped
# corpus correct as batches arrive; this keeps the ANN *index* correct.
# The invariant that makes it cheap: against a FROZEN coarse quantizer,
# assignment is a pure per-row function of (vector, centroids), so
# postings(corpus ∪ batch) = postings(corpus) ∪ postings(batch) — a new
# ingest batch is assigned MAP-ONLY and its (cell, vec) postings appended;
# the corpus is never re-assigned, re-scanned, or re-trained. The oracle
# builds the index the expensive way (one-pass assignment of the full
# union — a full rebuild), so the driver hash-check pins fold ≡ rebuild
# end to end, including the probe results served from the folded index.

IVF_INC_MOD = 4  # vec_id % 4 == 0 → the new ingest batch; else corpus


@query(
    "q_ivf_incremental",
    tags=("similarity", "llm", "incremental", "trained"),
    # the trained-IVF oracle with the training set restricted to the
    # corpus split (the batch must not influence the frozen centroids);
    # its assignment CTE always covers the full union — the REBUILD the
    # incremental fold must equal
    oracle=_ivf_trained_oracle(
        where=f"WHERE vec_id % {IVF_INC_MOD} <> 0", batch_mod=IVF_INC_MOD
    ),
)
def q_ivf_incremental(spark, sf_dir):
    """IVF index under incremental maintenance: the coarse quantizer is
    trained ONCE on the corpus split (vec_id % IVF_INC_MOD != 0); the
    new ingest batch's vectors are assigned map-only against the frozen
    centroids and their (cell, vec) postings UNIONED onto the corpus
    postings — the corpus side is never re-assigned. Queries probe the
    folded postings exactly like q_cosine_ann_ivf_trained; the oracle
    assigns the full union in one pass (the rebuild), so the hash check
    IS the fold-equals-rebuild proof. ``from_batch`` labels neighbors
    served from the incremental side of the fold.

    Engine-side, the postings table maintains via exactly-once
    append_batch folds (replay is a no-op) — pinned with the same probe
    equivalence in tests/test_ann.py. Per-arrival cost at 100 TB: one
    broadcast-argmax map over the batch plus one append; with postings
    stored cell-partitioned the probe is partition pruning, and the
    K·d centroid state is the only thing the trainer ever collected."""
    from incremental_dagster_delta_spark.queries.similarity import (
        assign_nearest_centroid,
        ivf_topk,
    )

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.where(F.col("vec_id") % IVF_INC_MOD != 0)
    batch = e.where(F.col("vec_id") % IVF_INC_MOD == 0)
    cents = trained_centroids(corpus)  # frozen: trained on the corpus only
    postings = (
        assign_nearest_centroid(corpus, cents)
        .withColumn("from_batch", F.lit(False))
        .unionByName(
            # the incremental maintenance step: map-only assignment of
            # the new batch, corpus untouched
            assign_nearest_centroid(batch, cents).withColumn(
                "from_batch", F.lit(True)
            )
        )
    )
    return ivf_topk(e, cents, assigned=postings, extra_cols=("from_batch",))


@query(
    "q_kmeans_centroids",
    tags=("similarity", "llm", "trained"),
    bench=True,  # r9: the trained-ANN family's headline representative
    oracle=_km_oracle(),
)
def q_kmeans_centroids(spark, sf_dir):
    """Train the Lloyd's coarse quantizer on the embeddings table and
    report, per centroid: the final assignment count, the exact integer
    inertia (Σ squared grid distance of its members), and the trained
    centroid itself (comma-joined grid coordinates — arrays serialize
    per the oracle-parity rules)."""
    from incremental_dagster_delta_spark.tables import materialize_release

    e = t(spark, sf_dir, "embeddings")
    vec = _prepared_vec(e).persist()
    cents = _train(vec, KM_ROUNDS)
    final = assign_nearest_sq(vec, cents)
    stats = final.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("n"), F.sum("dist").alias("inertia")
    )
    out = cents.join(stats, "centroid_id", "left").select(
        "centroid_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_assigned"),
        F.coalesce("inertia", F.lit(0)).cast("long").alias("inertia"),
        F.array_join(F.transform("cq", lambda v: v.cast("string")), ",").alias(
            "centroid"
        ),
    )
    return materialize_release(out, vec)


# ---------------------------------------------------------------------------
# Incremental / mini-batch centroid maintenance (r10 verdict ask #4 —
# carried to r11). A Lloyd's update against FROZEN centroids is a pure
# fold over mergeable partials: per-batch (centroid, dim, Σxq, n) sums
# are additive, so the trained quantizer absorbs a new ingest batch
# without re-scanning the corpus — compute partials over the NEW rows
# only, publish them exactly-once via tableio.append_batch (the proven
# sketch seam, tests/test_sketches.py), and fold the stored partial
# table into one update round. This ties the trained-ANN family to the
# engine's incremental-by-default story — the reference's core claim
# (readme.md:1-3: recompute only what each new batch touches).
# ---------------------------------------------------------------------------

KM_MB_BATCHES = 3  # deterministic corpus split for the qid: vec_id % 3


def batch_partials(vec_batch: DataFrame, cents: DataFrame) -> DataFrame:
    """Mergeable Lloyd's partials for ONE ingest batch against frozen
    centroids: map-only assignment (K·d broadcast closure, no shuffle)
    then one combinable (centroid, pos) aggregation — ≤ K·d rows out
    regardless of batch size. Publish with ``append_batch`` for
    exactly-once accumulation; replayed batches are no-ops at the
    storage layer, so the folded centroids never double-count."""
    return _pos_sums(assign_nearest_sq(vec_batch, cents))


def merge_partials_update(partials: DataFrame, old: DataFrame) -> DataFrame:
    """One Lloyd's round folded over accumulated per-batch partials:
    merge (Σs, Σn) per (centroid, pos) — a ≤ B·K·d-row aggregation,
    corpus-size-independent — then the shared grid-snap reassembly.
    Bit-identical to a full-corpus :func:`_update_centroids` round
    against the same frozen centroids (additivity of integer sums;
    pinned in tests/test_kmeans.py)."""
    merged = partials.groupBy("centroid_id", "pos").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    )
    return _reassemble(merged, old)


def _km_minibatch_oracle() -> str:
    """Full-corpus single-round oracle: the Spark path folds per-batch
    partials, the oracle replays the equivalent one round over the
    whole table — the hash match IS the merge-equals-full proof at
    driver gate scale."""
    return (
        _km_cte_chain(1)
        + """
    SELECT c.cid AS centroid_id,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_assigned,
           array_to_string(list_transform(c.cq, x -> CAST(x AS VARCHAR)), ',') AS centroid
    FROM c1 c
    LEFT JOIN (SELECT cid, COUNT(*) AS n FROM a0 GROUP BY cid) s USING (cid)"""
    )


@query(
    "q_kmeans_minibatch",
    tags=("similarity", "llm", "trained", "incremental"),
    oracle=_km_minibatch_oracle(),
)
def q_kmeans_minibatch(spark, sf_dir):
    """Incremental centroid maintenance: the corpus arrives as
    KM_MB_BATCHES deterministic ingest batches (vec_id % B); each batch
    contributes only its (centroid, dim, Σxq, n) partials against the
    frozen stride-init centroids, and ONE Lloyd's round folds the
    merged partials — no batch ever re-scans another batch's rows. The
    oracle replays the same round over the full corpus, so the driver
    hash-check pins merge-of-batch-partials ≡ train-on-full. The
    exactly-once storage seam (append_batch publication + replay
    no-op) is pinned in tests/test_kmeans.py."""
    from incremental_dagster_delta_spark.tables import materialize_release

    e = t(spark, sf_dir, "embeddings")
    vec = _prepared_vec(e).persist()
    cents0 = vec.where(F.col("vec_id") % KM_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
    )
    parts = None
    for b in range(KM_MB_BATCHES):
        p = batch_partials(vec.where(F.col("vec_id") % KM_MB_BATCHES == b), cents0)
        parts = p if parts is None else parts.unionByName(p)
    merged = (
        parts.groupBy("centroid_id", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .localCheckpoint(eager=True)  # K·d rows — reused by counts + update
    )
    cents1 = _reassemble(merged, cents0)
    counts = merged.where(F.col("pos") == 0).select("centroid_id", "n")
    out = cents1.join(counts, "centroid_id", "left").select(
        "centroid_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_assigned"),
        F.array_join(F.transform("cq", lambda v: v.cast("string")), ",").alias(
            "centroid"
        ),
    )
    return materialize_release(out, vec)


# ---------------------------------------------------------------------------
# Trained product-quantization codebooks (Jégou et al. 2011 train their
# codebooks with per-subspace k-means; the engine's q_pq_codes /
# q_ann_ivf_pq use a deterministic stride codebook — this qid adds the
# real training). Same quantized-grid determinism device as the coarse
# quantizer: all distances exact BIGINTs, means re-snap to the grid.
# All M subspaces train TOGETHER in one DataFrame lineage — `sub` rides
# as a key column through assignment and update, so the per-round cost
# is one combinable (sub, centroid, dim) shuffle regardless of M.
# ---------------------------------------------------------------------------

PQT_M = 4  # subspaces (matches vector_compress.PQ_M)
PQT_SUBDIM = 16  # 64 // PQT_M
PQT_STRIDE = 25  # deterministic init: vec_id % 25 (vector_compress.PQ_STRIDE)


def _sub_vectors(vec: DataFrame) -> DataFrame:
    """(vec_id, sub, xs): each quantized vector sliced into its M
    subvectors — a map-only explode to N·M rows."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.slice("xq", s * PQT_SUBDIM + 1, PQT_SUBDIM).alias("xs"),
            )
            for s in range(PQT_M)
        ]
    )
    return vec.select("vec_id", F.explode(subs).alias("e")).select(
        "vec_id", "e.sub", "e.xs"
    )


def assign_nearest_sub(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Per-subspace integer-argmin assignment: the (sub, centroid_id,
    cq) codebook (M·K rows — bounded by construction) is driver-
    collected and each Arrow batch is scored sub-by-sub with the same
    exact int64 matmul as :func:`assign_nearest_sq`. Returns
    (vec_id, sub, xs, centroid_id, dist)."""
    import numpy as np
    import pandas as pd

    by_sub: dict[int, tuple] = {}
    rows = sorted(centroids.collect(), key=lambda r: (r["sub"], r["centroid_id"]))
    for s in sorted({r["sub"] for r in rows}):
        srows = [r for r in rows if r["sub"] == s]
        C = np.array([r["cq"] for r in srows], dtype=np.int64)
        by_sub[s] = (
            np.array([r["centroid_id"] for r in srows], dtype=np.int64),
            C,
            (C * C).sum(axis=1),
        )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sub = pdf["sub"].to_numpy()
            cid = np.empty(len(pdf), dtype=np.int64)
            dist = np.empty(len(pdf), dtype=np.int64)
            X = np.array(pdf["xs"].tolist(), dtype=np.int64)
            for s, (cids, C, c_sq) in by_sub.items():
                m = sub == s
                if not m.any():
                    continue
                Xs = X[m]
                d = (Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ C.T) + c_sq[None, :]
                j = np.argmin(d, axis=1)
                cid[m] = cids[j]
                dist[m] = d[np.arange(len(j)), j]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "sub": sub,
                    "xs": pdf["xs"],
                    "centroid_id": cid,
                    "dist": dist,
                }
            )

    return vectors.select("vec_id", "sub", "xs").mapInPandas(
        assign, "vec_id long, sub int, xs array<long>, centroid_id long, dist long"
    )


def _update_sub_centroids(assigned: DataFrame, old: DataFrame) -> DataFrame:
    """One PQ Lloyd's update — :func:`_update_centroids` with ``sub``
    in every key; empty cells keep their previous centroid."""
    sums = (
        assigned.select("sub", "centroid_id", F.posexplode("xs").alias("pos", "v"))
        .groupBy("sub", "centroid_id", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    means = (
        sums.select(
            "sub",
            "centroid_id",
            F.struct(
                "pos",
                F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
                .cast("long")
                .alias("cv"),
            ).alias("pv"),
        )
        .groupBy("sub", "centroid_id")
        .agg(
            F.transform(F.array_sort(F.collect_list("pv")), lambda s: s["cv"]).alias(
                "cq_new"
            )
        )
    )
    return old.join(means, ["sub", "centroid_id"], "left").select(
        "sub", "centroid_id", F.coalesce("cq_new", "cq").alias("cq")
    )


def pq_train(e: DataFrame, rounds: int = KM_ROUNDS) -> DataFrame:
    """Train the M per-subspace codebooks jointly: stride-sampled init
    per subspace, ``rounds`` Lloyd's iterations with `sub` riding every
    key. Returns (sub, centroid_id, cq)."""
    vec = _prepared_vec(e).persist()
    try:
        sv = _sub_vectors(vec)
        cents = sv.where(F.col("vec_id") % PQT_STRIDE == 0).select(
            "sub", F.col("vec_id").alias("centroid_id"), F.col("xs").alias("cq")
        )
        for _ in range(rounds):
            assigned = assign_nearest_sub(sv, cents)
            cents = _update_sub_centroids(assigned, cents).localCheckpoint(eager=True)
        return cents
    finally:
        vec.unpersist()


def _pq_oracle(rounds: int = KM_ROUNDS) -> str:
    """The _km_oracle chain with the subspace dimension riding every
    key: slice → per-(sub) stride init → per round (argmin within sub →
    per-(sub, dim) mean → grid re-snap with empty-cell carry) → final
    per-(sub, centroid) stats."""
    d = _DIST_SQL.format(a="v.xs", b="c.cq")
    parts = [
        f"""WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT)) AS xq
      FROM embeddings
    ), sv AS (
      SELECT vec_id, s.sub,
             xq[s.sub * {PQT_SUBDIM} + 1 : s.sub * {PQT_SUBDIM} + {PQT_SUBDIM}] AS xs
      FROM e CROSS JOIN (SELECT CAST(unnest(range(0, {PQT_M})) AS INTEGER) AS sub) s
    ), c0 AS (
      SELECT sub, vec_id AS cid, xs AS cq FROM sv WHERE vec_id % {PQT_STRIDE} = 0
    )"""
    ]
    for k in range(rounds):
        parts.append(f""", a{k} AS (
      SELECT vec_id, sub, xs, cid FROM (
        SELECT v.vec_id, v.sub, v.xs, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {d} ASC, c.cid) AS rk
        FROM sv v JOIN c{k} c USING (sub)
      ) WHERE rk = 1
    ), m{k} AS (
      SELECT sub, cid, list(cv ORDER BY pos) AS cq FROM (
        SELECT sub, cid, pos,
               CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
        FROM (
          SELECT sub, cid, xs[pos] AS v, pos FROM (
            SELECT sub, cid, xs, unnest(range(1, len(xs) + 1)) AS pos FROM a{k}
          )
        ) GROUP BY sub, cid, pos
      ) GROUP BY sub, cid
    ), c{k + 1} AS (
      SELECT c.sub, c.cid, COALESCE(m.cq, c.cq) AS cq
      FROM c{k} c LEFT JOIN m{k} m ON c.sub = m.sub AND c.cid = m.cid
    )""")
    parts.append(f""", af AS (
      SELECT vec_id, sub, cid, d FROM (
        SELECT v.vec_id, v.sub, c.cid, {d} AS d,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {d} ASC, c.cid) AS rk
        FROM sv v JOIN c{rounds} c USING (sub)
      ) WHERE rk = 1
    )
    SELECT c.sub, c.cid AS centroid_id,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_assigned,
           CAST(COALESCE(s.inertia, 0) AS BIGINT) AS inertia,
           array_to_string(list_transform(c.cq, x -> CAST(x AS VARCHAR)), ',') AS centroid
    FROM c{rounds} c
    LEFT JOIN (SELECT sub, cid, COUNT(*) AS n, SUM(d) AS inertia
               FROM af GROUP BY sub, cid) s
      ON c.sub = s.sub AND c.cid = s.cid""")
    return "".join(parts)


@query("q_pq_train", tags=("similarity", "llm", "trained"), oracle=_pq_oracle())
def q_pq_train(spark, sf_dir):
    """Train the product-quantization codebooks (per-subspace Lloyd's,
    the actual Jégou et al. 2011 training the stride codebook of
    q_pq_codes approximates) and report, per (subspace, centroid): the
    assignment count, exact integer inertia, and the trained centroid
    on the grid. Total quantization error vs the stride codebook is
    pinned in tests/test_kmeans.py."""
    from incremental_dagster_delta_spark.tables import materialize_release

    e = t(spark, sf_dir, "embeddings")
    vec = _prepared_vec(e).persist()
    sv = _sub_vectors(vec)
    cents = sv.where(F.col("vec_id") % PQT_STRIDE == 0).select(
        "sub", F.col("vec_id").alias("centroid_id"), F.col("xs").alias("cq")
    )
    for _ in range(KM_ROUNDS):
        assigned = assign_nearest_sub(sv, cents)
        cents = _update_sub_centroids(assigned, cents).localCheckpoint(eager=True)
    final = assign_nearest_sub(sv, cents)
    stats = final.groupBy("sub", "centroid_id").agg(
        F.count("*").cast("long").alias("n"), F.sum("dist").alias("inertia")
    )
    out = cents.join(stats, ["sub", "centroid_id"], "left").select(
        "sub",
        "centroid_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_assigned"),
        F.coalesce("inertia", F.lit(0)).cast("long").alias("inertia"),
        F.array_join(F.transform("cq", lambda v: v.cast("string")), ",").alias(
            "centroid"
        ),
    )
    return materialize_release(out, vec)


def trained_pq_codebook_row(e: DataFrame) -> DataFrame:
    """ONE broadcastable codebook row in the ``pq_codebook_row`` shape
    (columns ``cents0..cents{M-1}`` of (cid, ce) structs) built from
    TRAINED per-subspace centroids — drop-in for the IVF-PQ ADC
    pipeline (``vector_compress.ivf_pq_topk(cent_row_fn=...)``). Train
    on whatever embedding space the caller passes: q_ann_ivf_pq
    L2-normalizes first, so the grid quantization sees |x| ≤ 1 and the
    trained centroids dequantize back into the normalized space."""
    cents = pq_train(e)
    dq = cents.select(
        "sub",
        "centroid_id",
        F.transform("cq", lambda v: v.cast("double") / KM_SCALE).alias("ce"),
    )
    return F.broadcast(
        dq.agg(
            *[
                F.collect_list(
                    F.when(
                        F.col("sub") == s,
                        F.struct(F.col("centroid_id").alias("cid"), F.col("ce")),
                    )
                ).alias(f"cents{s}")
                for s in range(PQT_M)
            ]
        )
    )


# ---------------------------------------------------------------------------
# Farthest-first (maximin) seeding — Gonzalez 1985's 2-approximation to
# k-center, the deterministic cousin of k-means++ (which needs random
# draws): start from the minimum vec_id, repeatedly add the point whose
# distance to the chosen set is LARGEST (ties → lower vec_id). On the
# integer grid every min-distance and every argmax comparison is exact,
# so the selection trace is bit-reproducible on both engines.
# ---------------------------------------------------------------------------

KMM_K = 10  # seeds selected (matches the gate-scale stride-K)


def maximin_seeds(e: DataFrame, k: int = KMM_K) -> DataFrame:
    """The farthest-first selection trace: (step, centroid_id, radius)
    where radius is the maximin distance at selection time (step 0 is
    the seed row with radius 0). Each step is ONE distributed pass —
    :func:`assign_nearest_sq` against the chosen set (driver-held,
    ≤ k·d ints, bounded by construction) followed by an exact integer
    argmax with the lower-id tiebreak; the Gonzalez radii are
    non-increasing, which tests/test_kmeans.py pins."""
    spark = e.sparkSession
    vec = _prepared_vec(e).persist()
    try:
        seed = vec.orderBy("vec_id").limit(1).collect()[0]
        chosen = [(int(seed["vec_id"]), list(seed["xq"]), 0)]
        from incremental_dagster_delta_spark.tables import literal_df

        for step in range(1, k):
            # literal_df: k driver-held rows per Gonzalez step — a
            # 32-slice createDataFrame would pay k × parallelism python
            # round-trips across the loop (tables.literal_df)
            chosen_df = literal_df(
                spark,
                [(cid, cq) for cid, cq, _ in chosen],
                "centroid_id long, cq array<bigint>",
            )
            best = (
                assign_nearest_sq(vec, chosen_df)
                .agg(
                    F.max(
                        F.struct(
                            F.col("dist").alias("d"),
                            (-F.col("vec_id")).alias("negid"),
                            F.col("xq"),
                        )
                    ).alias("b")
                )
                .collect()[0]["b"]
            )
            chosen.append((int(-best["negid"]), list(best["xq"]), int(best["d"])))
        return literal_df(
            spark,
            [(s, cid, r) for s, (cid, _, r) in enumerate(chosen)],
            "step long, centroid_id long, radius long",
        )
    finally:
        vec.unpersist()


def _maximin_oracle(k: int = KMM_K) -> str:
    """Unrolled farthest-first replay: per step, the min distance to the
    chosen set per point, then the (max distance, min vec_id) winner —
    the q_bpe_merges ORDER BY ... LIMIT 1 device."""
    d = _DIST_SQL.format(a="e.xq", b="c.cq")
    parts = [
        f"""WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT)) AS xq
      FROM embeddings
    ), ch0 AS (
      SELECT vec_id AS cid, xq AS cq FROM e
      WHERE vec_id = (SELECT MIN(vec_id) FROM e)
    )"""
    ]
    for s in range(1, k):
        parts.append(f""", s{s} AS (
      SELECT vec_id, md FROM (
        SELECT e.vec_id, MIN({d}) AS md
        FROM e CROSS JOIN ch{s - 1} c GROUP BY e.vec_id
      ) ORDER BY md DESC, vec_id LIMIT 1
    ), ch{s} AS (
      SELECT cid, cq FROM ch{s - 1}
      UNION ALL
      SELECT e.vec_id, e.xq FROM s{s} JOIN e USING (vec_id)
    )""")
    selects = [
        "SELECT CAST(0 AS BIGINT) AS step, cid AS centroid_id,"
        " CAST(0 AS BIGINT) AS radius FROM ch0"
    ] + [
        f"SELECT CAST({s} AS BIGINT), vec_id, CAST(md AS BIGINT) FROM s{s}"
        for s in range(1, k)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@query(
    "q_kmeans_maximin",
    tags=("similarity", "llm", "trained"),
    oracle=_maximin_oracle(),
)
def q_kmeans_maximin(spark, sf_dir):
    """Farthest-first (Gonzalez) k-center seeding over the embeddings
    table: the full selection trace (step, centroid_id, radius) —
    radius is the 2-approximation certificate (the k-center cost of the
    chosen set at each step, non-increasing)."""
    return maximin_seeds(t(spark, sf_dir, "embeddings"))
