"""Trained Lloyd's k-means quantizer (queries/kmeans.py): exact
equivalence against a pure-Python reference (the quantized grid makes
every intermediate integer-exact, so the comparison is ==, not
approx), objective improvement over the stride init, and the
empty-cluster carry rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.kmeans import (
    KM_ROUNDS,
    KM_SCALE,
    KM_STRIDE,
    assign_nearest_sq,
    lloyd_centroids,
    q_kmeans_centroids,
    quantize_embeddings,
)

from tests.conftest import SF_DIR


def _python_lloyd(spark, sf_dir, rounds=KM_ROUNDS):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {
        r["vec_id"]: [math.floor(float(x) * KM_SCALE + 0.5) for x in r["embedding"]]
        for r in rows
    }
    cents = {i: list(v) for i, v in vecs.items() if i % KM_STRIDE == 0}

    def assign():
        out = {}
        for vid, x in vecs.items():
            best = None
            for cid in sorted(cents):
                d = sum((a - b) * (a - b) for a, b in zip(x, cents[cid]))
                if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                    best = (d, cid)
            out[vid] = best
        return out

    for _ in range(rounds):
        a = assign()
        groups = {}
        for vid, (_, cid) in a.items():
            groups.setdefault(cid, []).append(vecs[vid])
        for cid in cents:
            members = groups.get(cid)
            if members:
                n = len(members)
                cents[cid] = [
                    math.floor(sum(col) / n + 0.5) for col in zip(*members)
                ]
    final = assign()
    stats = {}
    for vid, (d, cid) in final.items():
        n, inertia = stats.get(cid, (0, 0))
        stats[cid] = (n + 1, inertia + d)
    return cents, stats


def test_kmeans_matches_python_reference(spark, sf_dir):
    cents, stats = _python_lloyd(spark, sf_dir)
    got = {r["centroid_id"]: r for r in q_kmeans_centroids(spark, sf_dir).collect()}
    assert set(got) == set(cents)
    for cid, c in cents.items():
        n, inertia = stats.get(cid, (0, 0))
        assert got[cid]["n_assigned"] == n, cid
        assert got[cid]["inertia"] == inertia, cid
        assert got[cid]["centroid"] == ",".join(str(v) for v in c), cid


def test_kmeans_training_reduces_inertia(spark, sf_dir):
    """T rounds of Lloyd's must beat the stride init on the k-means
    objective (grid snapping breaks the strict per-step monotonicity
    proof, so the pin is vs the init, with measured headroom)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vec = quantize_embeddings(e)
    init = vec.where(F.col("vec_id") % KM_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
    )
    before = assign_nearest_sq(vec, init).agg(F.sum("dist")).collect()[0][0]
    after = (
        assign_nearest_sq(vec, lloyd_centroids(e)).agg(F.sum("dist")).collect()[0][0]
    )
    assert after < before, (before, after)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts no vectors carries through unchanged
    (the COALESCE rule, mirrored in the oracle): plant an outlier
    centroid far from all points."""
    rows = [(0, [0.1] * 4), (2, [0.5] * 4)] + [
        (i, [0.1 + 0.001 * i] * 4) for i in range(3, 20)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # stride 2: centroids from vec_id 0 and 2 would both attract points;
    # instead plant an explicit far-away centroid via a doctored table
    far = spark.createDataFrame(
        [(99, [9.0] * 4)], "vec_id long, embedding array<float>"
    )
    from incremental_dagster_delta_spark.queries.kmeans import _update_centroids

    vec = quantize_embeddings(e)
    cents = quantize_embeddings(e.limit(0).union(far)).select(
        F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
    ).union(
        vec.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
        )
    )
    assigned = assign_nearest_sq(vec, cents)
    # everything lands on centroid 0; 99 is empty
    assert assigned.where(F.col("centroid_id") == 99).count() == 0
    new = {r["centroid_id"]: r["cq"] for r in _update_centroids(assigned, cents).collect()}
    assert new[99] == [9000] * 4, new[99]  # carried unchanged
    assert new[0] != [100] * 4  # the live centroid moved to the mean


def test_pq_training_reduces_quantization_error(spark, sf_dir):
    """Trained PQ codebooks must beat the stride init on total
    quantization error (Σ inertia over all subspaces) — the metric PQ
    training exists to minimize; and every (sub, centroid) cell of the
    init must survive into the trained codebook (empty cells carry)."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.kmeans import (
        PQT_STRIDE,
        _sub_vectors,
        assign_nearest_sub,
        pq_train,
        q_pq_train,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from incremental_dagster_delta_spark.queries.kmeans import _prepared_vec

    sv = _sub_vectors(_prepared_vec(e))
    init = sv.where(F.col("vec_id") % PQT_STRIDE == 0).select(
        "sub", F.col("vec_id").alias("centroid_id"), F.col("xs").alias("cq")
    )
    before = assign_nearest_sub(sv, init).agg(F.sum("dist")).collect()[0][0]
    trained = pq_train(e)
    after = assign_nearest_sub(sv, trained).agg(F.sum("dist")).collect()[0][0]
    assert after < before, (before, after)
    # same cells, every init cell present
    got = q_pq_train(spark, sf_dir)
    assert got.count() == init.count()
    assert got.select("sub").distinct().count() == 4


def test_kmeans_property_random_corpora(spark):
    """Hypothesis sweep: on random small corpora (varying N, dim,
    values) the full distributed pipeline (quantize → train → assign →
    stats) must equal the pure-Python Lloyd's EXACTLY — the quantized
    grid leaves no tolerance to hide in. Catches batch-boundary,
    empty-cluster, and tie-break regressions the fixed-corpus test
    can't reach."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.kmeans import (
        KM_SCALE,
        _train,
        _update_centroids,
        assign_nearest_sq,
        quantize_embeddings,
    )

    STRIDE_P = 5  # property-local stride so tiny corpora still get K>1

    def py_train(vecs, rounds=2):
        cents = {i: list(v) for i, v in vecs.items() if i % STRIDE_P == 0}

        def assign():
            out = {}
            for vid, x in vecs.items():
                best = None
                for cid in sorted(cents):
                    d = sum((a - b) * (a - b) for a, b in zip(x, cents[cid]))
                    if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                        best = (d, cid)
                out[vid] = best
            return out

        for _ in range(rounds):
            a = assign()
            groups = {}
            for vid, (_, cid) in a.items():
                groups.setdefault(cid, []).append(vecs[vid])
            for cid in cents:
                members = groups.get(cid)
                if members:
                    n = len(members)
                    cents[cid] = [
                        math.floor(sum(col) / n + 0.5) for col in zip(*members)
                    ]
        return cents, assign()

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.integers(min_value=3, max_value=8),  # dim
        st.lists(
            st.lists(
                st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
                min_size=8,
                max_size=8,
            ),
            min_size=6,
            max_size=30,
        ),
    )
    def run(dim, raw_rows):
        rows = [(i, [float(x) for x in r[:dim]]) for i, r in enumerate(raw_rows)]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        vec = quantize_embeddings(e)
        # python twin quantizes IDENTICALLY from the float32 values
        import struct as _s

        vecs = {
            i: [
                math.floor(_s.unpack("f", _s.pack("f", x))[0] * KM_SCALE + 0.5)
                for x in emb
            ]
            for i, emb in rows
        }
        cents = vec.where(F.col("vec_id") % STRIDE_P == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
        )
        for _ in range(2):
            assigned = assign_nearest_sq(vec, cents)
            cents = _update_centroids(assigned, cents).localCheckpoint(eager=True)
        exp_cents, exp_assign = py_train(vecs)
        got_cents = {r["centroid_id"]: list(r["cq"]) for r in cents.collect()}
        assert got_cents == {cid: list(c) for cid, c in exp_cents.items()}
        got_assign = {
            r["vec_id"]: (r["dist"], r["centroid_id"])
            for r in assign_nearest_sq(vec, cents).collect()
        }
        assert got_assign == exp_assign

    run()


def test_maximin_radii_non_increasing_and_matches_python(spark, sf_dir):
    """The Gonzalez farthest-first trace: radii non-increasing (each
    added seed can only shrink the k-center cost), seeds distinct, and
    the whole trace equals a pure-Python replay exactly."""
    from incremental_dagster_delta_spark.queries.kmeans import (
        KMM_K,
        q_kmeans_maximin,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {
        r["vec_id"]: [math.floor(float(x) * 1000 + 0.5) for x in r["embedding"]]
        for r in rows
    }
    chosen = [min(vecs)]
    trace = [(0, chosen[0], 0)]
    for step in range(1, KMM_K):
        best = None
        for vid, x in vecs.items():
            md = min(
                sum((a - b) * (a - b) for a, b in zip(x, vecs[c])) for c in chosen
            )
            if best is None or md > best[1] or (md == best[1] and vid < best[0]):
                best = (vid, md)
        chosen.append(best[0])
        trace.append((step, best[0], best[1]))
    got = sorted(
        (r["step"], r["centroid_id"], r["radius"])
        for r in q_kmeans_maximin(spark, sf_dir).collect()
    )
    assert got == trace
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True) or all(
        radii[i] >= radii[i + 1] for i in range(len(radii) - 1)
    )
    assert len({c for _, c, _ in got}) == KMM_K


def test_kmeans_round_plan_shape(spark, sf_dir):
    """One Lloyd's round compiles to the scale shape: exactly ONE
    Arrow/Python pass (the assign kernel — no per-row UDF, no second
    corpus pass), a map-side-combined partial→final aggregation for the
    (centroid, dim) sums, and no cartesian product anywhere."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.kmeans import (
        KM_STRIDE,
        _update_centroids,
        assign_nearest_sq,
        quantize_embeddings,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vec = quantize_embeddings(e)
    cents = vec.where(F.col("vec_id") % KM_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("xq").alias("cq")
    )
    upd = _update_centroids(assign_nearest_sq(vec, cents), cents)
    phys = str(upd._jdf.queryExecution().executedPlan())
    assert phys.count("MapInPandas") == 1, phys
    assert "partial_sum" in phys, phys
    assert "CartesianProduct" not in phys, phys


def test_minibatch_merge_equals_full_round(spark):
    """Merge-of-batch-partials == one full-corpus Lloyd's round against
    the same frozen centroids, bit-exactly — the additivity identity
    the q_kmeans_minibatch driver hash also pins at gate scale, here on
    a literal scenario with an empty cluster (centroid 100 attracts
    nothing) and an uneven 3-way split."""
    from incremental_dagster_delta_spark.queries.kmeans import (
        _update_centroids,
        assign_nearest_sq,
        batch_partials,
        merge_partials_update,
    )
    from incremental_dagster_delta_spark.tables import literal_df

    rows = [(i, [i * 7 % 13, -(i % 5), i % 3]) for i in range(17)]
    vec = literal_df(spark, rows, "vec_id long, xq array<long>")
    cents = literal_df(
        spark,
        [(0, [0, 0, 0]), (1, [12, -4, 2]), (100, [999, 999, 999])],
        "centroid_id long, cq array<long>",
    )
    full = {
        r["centroid_id"]: r["cq"]
        for r in _update_centroids(assign_nearest_sq(vec, cents), cents).collect()
    }
    parts = None
    for b in range(3):
        p = batch_partials(vec.where(F.col("vec_id") % 3 == b), cents)
        parts = p if parts is None else parts.unionByName(p)
    merged = {
        r["centroid_id"]: r["cq"] for r in merge_partials_update(parts, cents).collect()
    }
    assert merged == full
    assert merged[100] == [999, 999, 999]  # empty cluster carried


def test_minibatch_incremental_maintenance_exactly_once(spark, tmp_path):
    """The trained quantizer's incremental-by-default configuration:
    per-batch partials published with tableio's exactly-once
    append_batch, one update round folded over the stored partial
    table. Two waves + a replayed wave (the foreachBatch at-least-once
    contract) must equal the one-shot update over the union corpus —
    replay contributes zero."""
    from incremental_dagster_delta_spark.queries.kmeans import (
        assign_nearest_sq,
        _update_centroids,
        batch_partials,
        merge_partials_update,
    )
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    cents = literal_df(
        spark,
        [(0, [0, 0]), (1, [50, -50])],
        "centroid_id long, cq array<long>",
    )
    w1 = [(i, [i, -i]) for i in range(8)]
    w2 = [(i + 8, [60 - i, i - 60]) for i in range(6)]
    v1 = literal_df(spark, w1, "vec_id long, xq array<long>")
    v2 = literal_df(spark, w2, "vec_id long, xq array<long>")

    tbl = PartitionedTable(spark, str(tmp_path / "km_partials"), ["centroid_id"])
    assert tbl.append_batch(batch_partials(v1, cents), batch_id=0) is True
    assert tbl.append_batch(batch_partials(v2, cents), batch_id=1) is True
    # crash-replay of wave 2: marker exists -> no-op, no double count
    assert tbl.append_batch(batch_partials(v2, cents), batch_id=1) is False

    incremental = {
        r["centroid_id"]: r["cq"]
        for r in merge_partials_update(tbl.read(), cents).collect()
    }
    union = literal_df(spark, w1 + w2, "vec_id long, xq array<long>")
    oneshot = {
        r["centroid_id"]: r["cq"]
        for r in _update_centroids(assign_nearest_sq(union, cents), cents).collect()
    }
    assert incremental == oneshot
