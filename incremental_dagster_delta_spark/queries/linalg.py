"""Distributed linear algebra over the embedding table: Gram matrix and PCA.

The Gram matrix X^T X is the workhorse of large-scale embedding analytics
(PCA whitening, linear-probe covariance, DIMSUM's exact counterpart). At
100 TB the only viable shape is the one Spark MLlib's ``RowMatrix`` uses:
each partition reduces its rows to a d x d partial product locally, and
only those fixed-size partials are combined — the shuffle volume is
O(#partitions * d^2) regardless of row count. We implement that shape with
``mapInArrow`` (one numpy ``X.T @ X`` per Arrow batch, float64) followed by
a tiny groupBy-sum on (i, j) cells, which Spark executes with map-side
partial aggregation — so the network never carries more than d^2 rows per
partition.

PCA then eigendecomposes the d x d covariance ON THE DRIVER — the one
place a "collect" is the correct distributed design, because the collected
object is O(d^2), independent of the corpus size (identical to MLlib
``RowMatrix.computePrincipalComponents``). Reference parity: the reference
engine has no linear-algebra surface; this extends the LLM-data-pipeline
toolkit (embedding QA, whitening, energy-based dedup thresholds).

Determinism: products are computed in float64 on both engines (the parquet
column is float32; both sides upcast BEFORE multiplying), results rounded
to 4 decimals. Eigenvalues of a symmetric matrix are sorted descending and
rounded; eigenvector sign ambiguity is avoided by never emitting raw
loadings (only the argmax-|loading| feature index, with the deterministic
lowest-index tie-break).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

EMB_DIM = 64


def _gram_partials(emb_df, with_sums: bool = False):
    """Per-Arrow-batch partial Gram products: yields upper-triangle
    (i, j, g) cells, d*(d+1)/2 rows per batch, each the float64
    ``X.T @ X`` of that batch's rows. With ``with_sums``, each batch
    additionally emits its column sums as (i, -1) cells and its row
    count as a (-1, -1) cell, so ONE distributed pass produces
    everything a covariance needs (the pca_topk contract). Scale shape:
    map-side reduction to a fixed-size summary before any shuffle."""

    def run(batches):
        import numpy as np
        import pyarrow as pa

        iu = np.triu_indices(EMB_DIM)
        for b in batches:
            col = b.column(b.schema.get_field_index("embedding"))
            # Vectorized list<float> -> (rows, d) matrix: flatten()
            # honors list offsets; astype(float64) is the same exact
            # float32->float64 widening DuckDB's DOUBLE cast performs.
            # (to_pylist() boxed every component through Python objects
            # — the dominant cost of this kernel; r15 review.)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if flat.size == 0:
                continue
            assert flat.size % EMB_DIM == 0, "ragged embedding batch"
            x = flat.astype(np.float64, copy=False).reshape(-1, EMB_DIM)
            g = x.T @ x
            cells_i = [iu[0].astype("int32")]
            cells_j = [iu[1].astype("int32")]
            cells_g = [g[iu]]
            if with_sums:
                cells_i.append(np.arange(EMB_DIM, dtype="int32"))
                cells_j.append(np.full(EMB_DIM, -1, dtype="int32"))
                cells_g.append(x.sum(axis=0))
                cells_i.append(np.array([-1], dtype="int32"))
                cells_j.append(np.array([-1], dtype="int32"))
                cells_g.append(np.array([float(x.shape[0])]))
            yield pa.RecordBatch.from_pydict(
                {
                    "i": pa.array(np.concatenate(cells_i), pa.int32()),
                    "j": pa.array(np.concatenate(cells_j), pa.int32()),
                    "g": pa.array(np.concatenate(cells_g), pa.float64()),
                }
            )

    return emb_df.select("embedding").mapInArrow(run, schema="i int, j int, g double")


@query(
    "q_gram_matrix",
    tags=("linalg", "llm"),
    bench=True,
    oracle=f"""
    WITH comp AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) - 1 AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT a.idx AS i, b.idx AS j,
           CAST(ROUND(SUM(a.x * b.x), 4) AS DOUBLE) AS g
    FROM comp a JOIN comp b USING (vec_id)
    WHERE a.idx <= b.idx
    GROUP BY a.idx, b.idx
    """,
)
def q_gram_matrix(spark, sf_dir):
    """Upper-triangle Gram matrix of the embedding corpus, computed as
    batch-local ``X.T @ X`` partials + a (i, j)-cell sum. The oracle
    recomputes it the naive way (unnest to components, self-join on
    vec_id) — O(N * d^2) rows in DuckDB, fine at sf0.01, while the Spark
    plan ships only O(#batches * d^2) cells at any corpus size."""
    partials = _gram_partials(t(spark, sf_dir, "embeddings"))
    return partials.groupBy("i", "j").agg(
        F.round(F.sum("g"), 4).cast("double").alias("g")
    )


def pca_topk(spark, emb, k: int = 8):
    """Top-k PCA spectrum of an embedding DataFrame: eigenvalue, explained
    variance ratio, cumulative ratio, and the dominant feature index per
    component. Distributed phase = one pass producing (sum-vector, Gram)
    partials; driver phase = eigh of the d x d covariance — O(d^2) bytes
    collected regardless of corpus size, the same split MLlib's
    ``RowMatrix.computePrincipalComponents`` uses. Informs whitening and
    intrinsic-dimension checks on embedding stores."""
    import numpy as np
    # One distributed pass for N, the component-sum vector, and the Gram
    # upper triangle: the sums ride along as (i, -1) cells and the row
    # count as (-1, -1), so a single job produces everything the driver
    # needs (r15: the previous code ran three separate corpus scans
    # while this comment claimed one — now it IS one).
    rows = (
        _gram_partials(emb, with_sums=True)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .collect()  # d*(d+1)/2 + d + 1 fixed-size cells — NOT data-dependent
    )
    gram = np.zeros((EMB_DIM, EMB_DIM))
    sums_v = np.zeros(EMB_DIM)
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["g"])  # row count: exact integer-valued double
        elif r["j"] == -1:
            sums_v[r["i"]] = r["g"]
        else:
            gram[r["i"], r["j"]] = r["g"]
            gram[r["j"], r["i"]] = r["g"]
    mu = sums_v / n
    cov = (gram - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    total = float(np.sum(np.clip(evals, 0.0, None)))
    out, cum = [], 0.0
    for rank, idx in enumerate(order):
        ev = float(evals[idx])
        ratio = ev / total if total > 0 else 0.0
        cum += ratio
        # lowest feature index within tolerance of the max |loading|:
        # sign- and order-deterministic, AND stable under EXACT loading
        # ties (symmetric scenarios put identical |loadings| on two
        # features; which one eigh reports a last-ulp higher varies
        # with BLAS threading, so a bare argmax flips run to run — the
        # r12 flake). 1e-6 is ~5 orders above ulp noise and ~5 below
        # any genuinely distinct loading gap.
        loadings = np.abs(evecs[:, idx])
        top_feat = int(np.flatnonzero(loadings >= loadings.max() - 1e-6).min())
        out.append((rank, round(ev, 4), round(ratio, 4), round(cum, 4), top_feat))
    from incremental_dagster_delta_spark.tables import literal_df

    return literal_df(
        spark, out, "component int, eigenvalue double, evr double, cum_evr double, top_feature int"
    )


# Pinned spectrum for the literal PCA scenario (the q_media_resize
# pattern): a 96×64 integer-valued embedding set from a fixed modular
# formula, pushed through the SAME _gram_partials + driver-eigh kernel
# the corpus path uses, with the numpy-eigh expectation pinned at
# authoring time. Integer inputs make the distributed Gram exact (no
# float reassociation across batches), so the eigh input is bit-stable
# and every rounded quantity sits ≥1e-5 away from its 4-dp boundary
# (constants chosen by a margin search). The scenario's symmetry puts
# EXACT |loading| ties on feature pairs (e.g. component 0 loads 22 and
# 57 identically); top_feature is therefore the tie-set MINIMUM, which
# pca_topk computes tolerance-robustly — a bare argmax flipped with
# BLAS threading (r12 flake). Corpus-scale PCA stays covered by
# tests/test_linalg.py::test_pca_topk_matches_numpy via pca_topk().
_PCA_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS INTEGER), CAST(340.4984 AS DOUBLE), CAST(0.0669 AS DOUBLE),
       CAST(0.0669 AS DOUBLE), CAST(22 AS INTEGER)),
      (1, 269.5769, 0.053, 0.1199, 29),
      (2, 242.0541, 0.0476, 0.1675, 3),
      (3, 238.7455, 0.0469, 0.2144, 48),
      (4, 224.3146, 0.0441, 0.2585, 5),
      (5, 207.1902, 0.0407, 0.2992, 61),
      (6, 199.9685, 0.0393, 0.3385, 17),
      (7, 190.9825, 0.0375, 0.3761, 15)
    ) AS t(component, eigenvalue, evr, cum_evr, top_feature)
    """


def _pca_scenario_rows():
    """Deterministic integer-valued 96×64 embedding set (see _PCA_ORACLE)."""
    return [
        (
            i,
            [float(((i + 1) * (j + 7) ** 2 + 11 * ((i * j) % 7)) % 31 - 15) for j in range(EMB_DIM)],
        )
        for i in range(96)
    ]


@query("q_pca_topk", tags=("linalg", "llm"), oracle=_PCA_ORACLE)
def q_pca_topk(spark, sf_dir, k: int = 8):
    """PCA spectrum through the distributed Gram + driver-eigh kernel
    (:func:`pca_topk`), hash-checked via the literal-scenario pattern:
    a pinned deterministic embedding set whose numpy-eigh spectrum is
    the VALUES oracle. Any drift in the partial-Gram kernel, the
    covariance assembly, or the spectrum post-processing flips the
    comparison. The corpus-scale run of the same kernel is pinned
    against a direct numpy recomputation in tests/test_linalg.py."""
    from incremental_dagster_delta_spark.tables import literal_df

    emb = literal_df(spark, _pca_scenario_rows(), "vec_id long, embedding array<double>")
    return pca_topk(spark, emb, k)


# --- per-class centroid separation -------------------------------------------------
#
# Embedding-space health check before training a classifier or probing
# clusters: how distinct are the label centroids? Reports each label's
# centroid cosine to the GLOBAL centroid (near 1 ⇒ the class sits at
# the corpus center, carrying little signal) and its nearest OTHER
# centroid (high ⇒ the two classes are entangled — the pair a confusion
# matrix will flag later, available before any model exists).


def _guarded_cos(a, b):
    """Aggregate-form cosine between two component columns with the
    zero-norm NULL branch — an all-zero label (or global) centroid
    otherwise ANSI-aborts the whole report while the oracle's x/0
    serves NULL (similarity.cosine's r15 note, applied to the
    aggregate shape)."""
    den = F.sqrt(F.sum(a * a)) * F.sqrt(F.sum(b * b))
    return F.when(den != 0, F.sum(a * b) / den)


@query(
    "q_centroid_separation",
    tags=("similarity", "analytics", "llm"),
    oracle="""
    WITH comp AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), cent AS (
      SELECT label, pos, AVG(x) AS c FROM comp GROUP BY label, pos
    ), n AS (
      SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label
    ), gvec AS (
      SELECT pos, AVG(x) AS g FROM comp GROUP BY pos
    ), gcos AS (
      SELECT c.label,
             SUM(c.c * g.g) / (sqrt(SUM(c.c * c.c)) * sqrt(SUM(g.g * g.g))) AS cos_g
      FROM cent c JOIN gvec g USING (pos) GROUP BY c.label
    ), pair AS (
      SELECT a.label AS la, b.label AS lb,
             SUM(a.c * b.c) / (sqrt(SUM(a.c * a.c)) * sqrt(SUM(b.c * b.c))) AS cos_ab
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <> b.label
      GROUP BY a.label, b.label
    ), nearest AS (
      SELECT la AS label, lb AS nearest_label, cos_ab FROM (
        SELECT *, row_number() OVER (
          PARTITION BY la ORDER BY ROUND(cos_ab, 4) DESC, lb
        ) AS rk FROM pair
      ) WHERE rk = 1
    )
    SELECT n.label, CAST(n.n_vecs AS BIGINT) AS n_vecs,
           CAST(ROUND(g.cos_g, 4) AS DOUBLE) AS cos_to_global,
           ne.nearest_label,
           CAST(ROUND(ne.cos_ab, 4) AS DOUBLE) AS nearest_cos
    FROM n JOIN gcos g USING (label) JOIN nearest ne USING (label)
    """,
)
def q_centroid_separation(spark, sf_dir):
    """Label-centroid geometry report. Scale shape: ONE posexplode pass
    over the vectors feeds a map-combinable (label, dim) average —
    |labels|·d rows out regardless of corpus size (the Lloyd's-update
    bound from kmeans.py); everything after (global centroid, the
    |labels|² pairwise cosines, the nearest pick) is metadata-sized.
    Nearest ranks on the ROUNDED cosine with a label tiebreak so both
    engines pick identically even where centroid cosines differ in the
    last ulp (avg() accumulation order is engine-specific)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "xr")
    ).select("label", "pos", F.col("xr").cast("double").alias("x"))
    cent = comp.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    cent = cent.localCheckpoint(eager=True)  # reused three times below
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    glob = comp.groupBy("pos").agg(F.avg("x").alias("g"))
    gcos = (
        cent.join(glob, "pos")
        .groupBy("label")
        .agg(_guarded_cos(F.col("c"), F.col("g")).alias("cos_g"))
    )
    b = cent.select(
        F.col("label").alias("lb"), F.col("pos").alias("pos_b"), F.col("c").alias("cb")
    )
    pair = (
        cent.join(b, (F.col("pos") == F.col("pos_b")) & (F.col("label") != F.col("lb")))
        .groupBy("label", "lb")
        .agg(_guarded_cos(F.col("c"), F.col("cb")).alias("cos_ab"))
    )
    pick = Window.partitionBy("label").orderBy(F.round("cos_ab", 4).desc(), F.col("lb"))
    nearest = (
        pair.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select("label", F.col("lb").alias("nearest_label"), "cos_ab")
    )
    return (
        n.join(gcos, "label")
        .join(nearest, "label")
        .select(
            "label",
            F.col("n_vecs").cast("long"),
            F.round("cos_g", 4).cast("double").alias("cos_to_global"),
            "nearest_label",
            F.round("cos_ab", 4).cast("double").alias("nearest_cos"),
        )
    )
