"""Physical-plan assertions: the plans that must survive a 100× scale-up
(pushed filters, broadcast dims, top-k without global sort, no cartesian
products anywhere in the registry)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries import QUERIES
from incremental_dagster_delta_spark.queries.relational import (
    q_pricing_summary,
    q_region_revenue,
    q_top_orders,
)
from incremental_dagster_delta_spark.queries.reference_ops import q_partition_prune, q_suffix_filter


def _plan(df) -> str:
    return str(df._jdf.queryExecution())


def test_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(q_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_suffix_filter_pushed(spark, sf_dir):
    plan = _plan(q_suffix_filter(spark, sf_dir))
    assert "StringEndsWith" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(q_region_revenue(spark, sf_dir))
    # supplier/nation/region joins must be broadcast; the fact-fact joins
    # may shuffle (AQE decides at runtime)
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastExchange") >= 3


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(q_top_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning(spark, sf_dir):
    plan = _plan(q_partition_prune(spark, sf_dir))
    after = plan.split("PartitionFilters")[1][:200] if "PartitionFilters" in plan else ""
    assert "event_day" in after, f"no partition filter on event_day: {after}"


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Co-located joins via bucketing (the 100 TB pattern for repeated
    fact-fact joins): both sides bucketed+sorted on the join key join
    with ZERO Exchange operators — no shuffle at all."""
    import shutil

    from incremental_dagster_delta_spark.tables import load_table

    # the warehouse dir outlives the in-memory catalog: drop any stale
    # table locations from previous sessions before re-creating
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)

    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).format("parquet").saveAsTable("b_orders")
    load_table(spark, sf_dir, "customer").write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).format("parquet").saveAsTable("b_customer")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(j)
        physical = plan.split("== Physical Plan ==")[-1]
        assert "Exchange" not in physical, f"bucketed join still shuffles:\n{physical[:500]}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With runtime filtering enabled, a selective dim predicate on one
    side of a shuffle join injects a bloom-filter probe
    (``might_contain(xxhash64(key))``) into the fact-side scan, pruning
    rows before the shuffle — the row-level counterpart to AQE's
    size-level re-planning. Results must be bit-identical to the
    unfiltered plan (a bloom filter admits false positives, never false
    negatives, and the join re-checks the key)."""
    from incremental_dagster_delta_spark.session import runtime_filtering

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).where(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def q():
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )

    baseline = {r["l_returnflag"]: r["n"] for r in q().collect()}
    with runtime_filtering(spark, application_side_threshold="0", force_shuffle_join=True):
        executed = str(q()._jdf.queryExecution().executedPlan())
        assert "might_contain" in executed, "no bloom filter injected into fact scan"
        filtered = {r["l_returnflag"]: r["n"] for r in q().collect()}
    assert filtered == baseline
    # and the context manager restored the session confs (enabled is true
    # by default in Spark 4 — the 10GB application-side threshold is what
    # gates injection, so that's the conf that must be back)
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        != "0"
    )
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


_PURE_QUERIES = [
    n for n, s in QUERIES.items() if not s.fn.__module__.endswith("incremental_ops")
]  # incremental_ops qids return materialized (localCheckpoint) state — no plan to inspect


# Cardinality-reducing physical nodes: a partition-less Window whose
# subtree contains one of these consumes a bounded row set (a top-k cut,
# an explicit limit, or an aggregate keyed on a value-domain-bounded
# column), not raw scan rows.
_WINDOW_BOUND_NODES = {
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
}


def _walk_jplan(n):
    while n.nodeName() == "AdaptiveSparkPlan":
        n = n.initialPlan()
    yield n
    ch = n.children()
    for i in range(ch.size()):
        yield from _walk_jplan(ch.apply(i))


@pytest.mark.parametrize("name", _PURE_QUERIES)
def test_no_cartesian_product(spark, sf_dir, name):
    """Registry-wide plan invariants — the instantly-disqualifying
    shapes at 100 TB, checked on every registered query:

    1. No CartesianProduct. (BroadcastNestedLoopJoin with a
       broadcast-small side is acceptable — that's the top-k query set
       and centroid assignment, bounded by |Q| and K.)
    2. Every PARTITION-LESS Window (single-partition execution) must sit
       above a cardinality cut — TakeOrderedAndProject/limit or an
       aggregation — never above raw scan rows. This is the standing
       answer to the bench tail's 'WindowExec: No Partition Defined'
       warnings: the r11 audit found each such window value-domain- or
       top-k-bounded, and this assertion keeps it that way.

    ``lazy_plans()`` keeps eager materialization (cache-release
    checkpointing) off so the FULL lineage — not a checkpoint scan — is
    what gets inspected here."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        df = QUERIES[name].fn(spark, sf_dir)
        plan = _plan(df)
        jp = df._jdf.queryExecution().executedPlan()
        unbounded = [
            n
            for n in _walk_jplan(jp)
            if n.nodeName() == "Window"
            and n.partitionSpec().size() == 0
            and not any(m.nodeName() in _WINDOW_BOUND_NODES for m in _walk_jplan(n))
        ]
    spark.catalog.clearCache()  # lazy mode skips the queries' own unpersists
    assert "CartesianProduct" not in plan, f"{name} compiles to a cartesian product"
    assert not unbounded, (
        f"{name}: partition-less Window over unbounded input — "
        f"{[str(n.simpleString(120)) for n in unbounded]}"
    )


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, demonstrated at runtime: a hash-partition
    holding one hot key (200k of 250k rows) is split into multiple
    subpartitions (SortMergeJoin(skew=true) + 'AQEShuffleRead ...
    skewed' in the final adaptive plan) instead of serializing the join
    onto one straggler task — the no-code-change answer to key skew
    that salting (q_salted_agg) solves manually for aggregations."""
    saved = {}

    def _set(k, v):
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)

    _set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    _set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    _set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    _set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        left = spark.range(0, 250000).select(
            F.when(F.col("id") < 200000, 0)
            .otherwise((F.col("id") % 999) + 1)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("d").alias("d"))
        j = left.join(right, "k").select(F.sum(F.length("pay")).alias("s"))
        skewed_total = j.collect()[0]["s"]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # result parity with the unrestricted (broadcast) plan
    left2 = spark.range(0, 250000).select(
        F.when(F.col("id") < 200000, 0).otherwise((F.col("id") % 999) + 1).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
    )
    right2 = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    base = left2.join(F.broadcast(right2), "k").select(F.sum(F.length("pay")).alias("s"))
    assert base.collect()[0]["s"] == skewed_total


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """Per-join strategy control without session-wide conf changes:
    hints pick the physical join. At 100 TB the useful override is
    usually shuffle_hash for a mid-size build side that's too big to
    broadcast but small enough to hash (skips both sort passes of SMJ)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cond = li["l_orderkey"] == o["o_orderkey"]
        shj = li.join(o.hint("shuffle_hash"), cond)
        smj = li.join(o.hint("merge"), cond)
        bhj = li.join(o.hint("broadcast"), cond)
        assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in bhj._jdf.queryExecution().executedPlan().toString()
        # all three strategies agree on the result cardinality
        n = smj.count()
        assert shj.count() == n == bhj.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dsir_ratio_join_broadcast(spark, sf_dir):
    """q_dsir_weights' per-doc scoring join must broadcast the 4096-row
    log-ratio table — shuffling the exploded corpus side against it
    would be the scale killer. lazy_plans: the qid materializes its
    result (checkpoint truncates the inspectable plan)."""
    from incremental_dagster_delta_spark.queries.selection import q_dsir_weights
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = _plan(q_dsir_weights(spark, sf_dir))
    spark.catalog.clearCache()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastExchange") >= 1


def test_incremental_dedup_probe_is_hash_join(spark, sf_dir):
    """The batch→corpus band probe must be an equi hash join on
    (band, bucket) — never a nested-loop over the corpus index."""
    from incremental_dagster_delta_spark.queries.dedup import q_incremental_dedup
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = _plan(q_incremental_dedup(spark, sf_dir))
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_interval_merge_single_shuffle(spark, sf_dir):
    """q_interval_merge's claim: gaps-and-islands via frame-bounded
    windows is ONE hash exchange + ONE sort per key partition — the
    downstream groupBys reuse the custkey partitioning (subset
    clustering), so no second shuffle ever materializes. A range-join
    rewrite would lose this property."""
    plan = _plan(QUERIES["q_interval_merge"].fn(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("Sort ") == 1


def test_mad_outliers_stats_broadcast(spark, sf_dir):
    """The per-group median/MAD tables join back to the fact via
    broadcast — the fact is never re-keyed."""
    plan = _plan(QUERIES["q_mad_outliers"].fn(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("BroadcastHashJoin") >= 2
    # only the two needed columns reach the lineitem scan
    assert "l_returnflag" in phys and "l_extendedprice" in phys
    read = phys.split("ReadSchema")[1][:200]
    assert "l_quantity" not in read and "l_partkey" not in read


def test_expectations_single_scan_per_table(spark, sf_dir):
    """All lineitem rules evaluate in ONE conditional-agg scan: the plan
    contains exactly two parquet scans of lineitem (the rule scan and
    the referential-integrity join probe), not one per rule."""
    plan = _plan(QUERIES["q_expectations"].fn(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("lineitem.parquet") <= 2, phys.count("lineitem.parquet")


def test_vocab_coverage_broadcasts_vocabulary(spark, sf_dir):
    """The top-V vocabulary (a constant-size table) joins to the token
    stream via broadcast — the stream is never shuffled for the join;
    its only Exchange is the per-doc aggregation."""
    plan = _plan(QUERIES["q_vocab_coverage"].fn(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys
    # vocabulary ranking compiles to TakeOrderedAndProject (bounded V),
    # never a global Sort of the term-frequency table
    assert "TakeOrderedAndProject" in phys


def test_doulion_sampled_edge_plan_filters_before_checkpoint(spark, sf_dir):
    """The md5 edge-sampling filter must run in the edge-build pass —
    i.e. before triangle_stats' checkpoint, hence structurally before
    wedge generation. The final qid plan scans the checkpointed sample
    (ExistingRDD), so inspect the sampled-edge subplan directly. The
    runtime consequence (wedge work shrinking ~p²) is asserted in
    tests/test_graph.py."""
    from incremental_dagster_delta_spark.queries.graph import doulion_sampled_edges

    plan = _plan(doulion_sampled_edges(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert "md5" in phys
    assert "CartesianProduct" not in phys
    # The perf property: the sample Filter sits BELOW the distinct's
    # aggregate, so only the kept fraction reaches the dedup shuffle.
    # The plan tree prints top-down, so the dedup HashAggregate must
    # appear BEFORE the md5 filter line.
    assert phys.index("HashAggregate") < phys.index("md5"), phys


def test_bigram_scoring_joins_shuffle(spark, sf_dir):
    """The bigram-LM scoring joins (stream ⋈ c2 on (w1,w2), ⋈ c1 on w1)
    must NOT be hint-forced to broadcast: the bigram count table grows
    with the observed corpus bigram set (web scale: billions of rows),
    so the 100 TB-correct plan shuffle-joins on the token keys and lets
    AQE downgrade to broadcast only when the runtime stats justify it.
    With auto-broadcast disabled, the only broadcast left must be the
    vocabulary-size scalar `v` — if an F.broadcast hint ever creeps onto
    c2/c1 this test sees a second broadcast join survive."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with lazy_plans():
            plan = _plan(QUERIES["q_bigram_perplexity"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.catalog.clearCache()
    phys = plan.split("== Physical Plan ==")[1]
    # the two count-table joins shuffle (sort-merge under disabled
    # auto-broadcast); the scalar v crossJoin is the one broadcast
    assert phys.count("SortMergeJoin") >= 2, phys
    n_b = phys.count("BroadcastNestedLoopJoin") + phys.count("BroadcastHashJoin")
    assert n_b == 1, f"expected exactly the scalar-v broadcast, saw {n_b}"


def test_kn_scoring_joins_shuffle(spark, sf_dir):
    """The Kneser-Ney twin of test_bigram_scoring_joins_shuffle: all
    FOUR model tables (c2, c1, the two continuation-count tables) grow
    with the observed bigram set, so every scoring join must shuffle;
    only the 1-row bigram-type total broadcasts."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with lazy_plans():
            plan = _plan(QUERIES["q_kn_perplexity"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.catalog.clearCache()
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("SortMergeJoin") >= 4, phys
    n_b = phys.count("BroadcastNestedLoopJoin") + phys.count("BroadcastHashJoin")
    assert n_b == 1, f"expected exactly the scalar-nbt broadcast, saw {n_b}"


def _physical_no_autobroadcast(spark, build) -> str:
    """Physical plan with auto-broadcast disabled: any surviving
    broadcast join must come from an explicit F.broadcast hint.
    lazy_plans so queries that materialize their result (checkpoint)
    keep the full plan inspectable."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with lazy_plans():
            plan = _plan(build())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.catalog.clearCache()
    return plan.split("== Physical Plan ==")[1]


def test_tokenizer_seg_joins_shuffle(spark):
    """The (word, n_toks) segmentation table the tokenizer application
    paths join against has one row per DISTINCT CORPUS WORD — under
    Heaps' law 10^8-10^9 rows at 100 TB, not |vocab pieces| — so a
    forced broadcast OOMs at scale (r7 verdict item 1). With
    auto-broadcast disabled, the word join must shuffle in all four
    application paths (encode + fertility for both tokenizer families);
    AQE may still downgrade to broadcast at runtime when stats justify."""
    from incremental_dagster_delta_spark.queries.bpe import encode_bpe, fertility_by_lang
    from incremental_dagster_delta_spark.queries.unigram_lm import (
        char_fallback_unigram,
        encode_unigram,
    )

    docs = spark.createDataFrame(
        [(1, "en", "aa bb"), (2, "de", "bb cc")],
        "doc_id long, lang string, text string",
    )
    seg = spark.createDataFrame([("aa", 1), ("bb", 2)], "word string, n_toks long")
    builds = {
        "encode_bpe": lambda: encode_bpe(docs, seg),
        "encode_unigram": lambda: encode_unigram(docs, seg),
        "fertility_bpe": lambda: fertility_by_lang(docs, seg),
        "fertility_unigram": lambda: fertility_by_lang(
            docs, seg, "n_unigram_tokens", char_fallback_unigram
        ),
    }
    for name, build in builds.items():
        phys = _physical_no_autobroadcast(spark, build)
        n_b = phys.count("BroadcastNestedLoopJoin") + phys.count("BroadcastHashJoin")
        assert n_b == 0, f"{name}: forced broadcast survived\n{phys}"
        assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys, f"{name}:\n{phys}"


@pytest.mark.parametrize(
    "qid,n_scalar",
    [
        ("q_tfidf", 1),  # the 1-row corpus-size scalar (r15: was an
        # eager d.count() at plan-construction time)
        ("q_rp_embed", 1),  # same 1-row corpus-size scalar
        ("q_topic_terms", 1),  # the 1-row source-count scalar
        ("q_unigram_surprisal", 1),  # the 1-row token-total scalar
        ("q_surprisal_buckets", 1),  # the 1-row token-total scalar
        ("q_pmi_bigrams", 2),  # the 1-row bigram/unigram totals
        # r8 verdict ask #6 — the KN twin and the holdout postings join:
        ("q_kn_perplexity", 1),  # 1-row discount/total scalar; all four
        # corpus-growing model tables (bigram, unigram, n1f/n1p
        # continuation counts) shuffle-join
        ("q_quality_holdout", 5),  # 1 D-bounded (≤257-row) weight-table
        # BHJ + 4 scalar BNLJs (bias, n_train, class totals); the
        # corpus-growing joins (train postings⨝labels, test
        # margins⨝labels) all shuffle
    ],
)
def test_token_df_joins_shuffle(spark, sf_dir, qid, n_scalar):
    """Per-token document-frequency / unigram-count tables grow with
    the distinct corpus token set (Heaps' law: 10^8-10^9 at 100 TB) —
    their joins must not be hint-forced to broadcast (r7 verdict items
    1/3). With auto-broadcast disabled, the only surviving broadcasts
    are the 1-row scalar crossJoins — plus, where noted, a hinted
    broadcast whose build side is BOUNDED BY CONSTRUCTION (the ≤257-row
    hashed-bucket weight table), which stays hinted by design."""
    phys = _physical_no_autobroadcast(spark, lambda: QUERIES[qid].fn(spark, sf_dir))
    n_b = phys.count("BroadcastNestedLoopJoin") + phys.count("BroadcastHashJoin")
    assert n_b == n_scalar, (
        f"{qid}: expected {n_scalar} scalar broadcast(s), saw {n_b}\n{phys}"
    )


def test_bloom_probe_is_broadcast(spark, sf_dir):
    """q_bloom_membership's contract: the corpus side collapses to the
    <= m-row bit table and the batch probe joins it BROADCAST — if this
    regresses to a shuffle join the 'corpus never re-shuffles per batch'
    scale claim is gone."""
    from incremental_dagster_delta_spark.queries.sketches import q_bloom_membership

    plan = _plan(q_bloom_membership(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys
    assert "CartesianProduct" not in phys


def test_cms_topn_avoids_global_sort(spark, sf_dir):
    """The CMS report's top-N cut must compile to TakeOrderedAndProject
    (per-partition partial top-N), never a single-partition window sort
    of the vocabulary."""
    from incremental_dagster_delta_spark.queries.sketches import q_cms_heavy_hitters
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = _plan(q_cms_heavy_hitters(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert "TakeOrderedAndProject" in phys
    # the sketch cells join the probe broadcast (4096-row build side)
    assert "BroadcastHashJoin" in phys


def test_cms_sketch_aggregation_is_partial(spark, sf_dir):
    """The sketch build's whole scale story is the map-side partial
    aggregate over the bounded (row, pos) key space: the physical plan
    must show a two-phase HashAggregate (partial_count before the
    exchange), so each partition ships <= depth x width cells."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import CMS_DEPTH, _cms_pos
    from incremental_dagster_delta_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    tok = d.select(F.explode(toks).alias("tok"))
    positions = F.array(*[_cms_pos(i, F.col("tok")) for i in range(CMS_DEPTH)])
    cells = (
        tok.select(F.posexplode(positions).alias("row_i", "pos"))
        .groupBy("row_i", "pos")
        .agg(F.count("*").alias("counter"))
    )
    phys = _plan(cells).split("== Physical Plan ==")[1]
    assert "partial_count" in phys, phys


def test_ndcg_rankings_are_takeordered(spark, sf_dir):
    """NDCG@10 consumes positions <= 10 only, so BOTH rankings (by bm25
    and by relevance) must cut to their top-10 via TakeOrderedAndProject
    (per-partition partial top-K) BEFORE any window ranks positions —
    the r9/r10 finding was two unpartitioned row_number windows over the
    full matched-doc set (a constant fraction of the corpus) in a single
    task. Any Window left in the plan now ranks a <=10-row frame below a
    global limit."""
    from incremental_dagster_delta_spark.queries.retrieval import q_ndcg_eval

    phys = _plan(q_ndcg_eval(spark, sf_dir)).split("== Physical Plan ==")[1]
    assert phys.count("TakeOrderedAndProject") >= 2, phys


def test_mrr_has_no_window(spark, sf_dir):
    """q_mrr_eval's first_rel_pos is an order-statistic AGGREGATE (count
    of docs ranked above the best strongly-relevant hit), not a per-term
    row_number window — a common term made the old window's partition
    corpus-proportional (hot-key skew in a single task). The plan must
    contain no Window node at all; the |terms|-row best-hit table joins
    back as a broadcast."""
    from incremental_dagster_delta_spark.queries.retrieval import q_mrr_eval

    phys = _plan(q_mrr_eval(spark, sf_dir)).split("== Physical Plan ==")[1]
    assert "Window" not in phys, phys
    assert "BroadcastHashJoin" in phys, phys


def test_offset_slice_rank_is_range_partitioned(spark, sf_dir):
    """q_offset_slice's global position comes from _global_order:
    a range repartition on the sort key with per-partition ranks plus
    broadcast offsets — never an unpartitioned corpus-fed row_number.
    The range exchange itself hides inside _global_order's
    localCheckpoint (the scan shows as ExistingRDD), so the observable
    pin is that the row_number window over the document rows is
    partitioned by _pid — the only unpartitioned window left is the
    offsets running-sum over numPartitions scalar counts."""
    from incremental_dagster_delta_spark.queries.reference_ops import q_offset_slice

    phys = _plan(q_offset_slice(spark, sf_dir)).split("== Physical Plan ==")[1]
    assert "row_number() windowspecdefinition(_pid#" in phys, phys


# --- round 11 session-2 additions -------------------------------------------


def test_rrf_rankings_are_takeordered(spark, sf_dir):
    """Both fused systems cut to RRF_DEPTH via TakeOrderedAndProject
    (per-partition heap + single reduce — never a global sort), and the
    final fused cut is a third TakeOrdered. The rank-assignment windows
    run over the ≤DEPTH-row cuts, bounded by a literal."""
    from incremental_dagster_delta_spark.queries.retrieval import q_rrf_fusion

    plan = str(q_rrf_fusion(spark, sf_dir)._jdf.queryExecution())
    assert plan.count("TakeOrderedAndProject") >= 3, plan[:500]
    assert "CartesianProduct" not in plan


def test_matryoshka_rank_is_window_group_limit(spark, sf_dir):
    """Both per-query top-k rankings must rewrite the rank filter to
    WindowGroupLimit: every partition keeps a k-row heap per query
    BEFORE the shuffle, so no query ever owns a corpus-sized task."""
    from incremental_dagster_delta_spark.queries.vector_compress import q_matryoshka_eval

    plan = str(q_matryoshka_eval(spark, sf_dir)._jdf.queryExecution())
    assert plan.count("WindowGroupLimit") >= 2, plan[:500]


def test_neighbor_jaccard_degrees_broadcast_topk_no_sort(spark, sf_dir):
    """The |suppliers|-row degree table broadcasts onto the wedge
    aggregate (the only SortMergeJoin allowed is the wedge self-join on
    the shared-customer key) and the final cut avoids a global sort."""
    from incremental_dagster_delta_spark.queries.graph import q_neighbor_jaccard
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = str(q_neighbor_jaccard(spark, sf_dir)._jdf.queryExecution())
    spark.catalog.clearCache()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("SortMergeJoin") <= 1, "only the wedge self-join may shuffle-sort"


def test_autocorrelation_lag_spine_broadcasts(spark, sf_dir):
    """The 3-row lag spine joins as a broadcast nested loop; the daily
    self-join hashes on the (type, shifted-day) key. No window at all —
    ACF is joins + one Pearson aggregate."""
    from incremental_dagster_delta_spark.queries.timeseries import q_autocorrelation

    plan = str(q_autocorrelation(spark, sf_dir)._jdf.queryExecution())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_recursive_cte_runs_union_loop(spark, sf_dir):
    """WITH RECURSIVE must plan as the UnionLoop iterative closure —
    O(log N) map-only steps here — not as an unrolled/flattened union."""
    from incremental_dagster_delta_spark.queries.modern import q_recursive_cte

    plan = str(q_recursive_cte(spark, sf_dir)._jdf.queryExecution())
    assert "UnionLoop" in plan


def test_reservoir_partials_are_window_group_limited(spark, sf_dir):
    """Every per-batch local reservoir AND the serve-side fold must
    carry WindowGroupLimit — the bounded-selection seam's 'local top-k
    is heap-bounded before any shuffle' contract."""
    from incremental_dagster_delta_spark.queries.curation import q_reservoir_incremental

    plan = str(q_reservoir_incremental(spark, sf_dir)._jdf.queryExecution())
    assert plan.count("WindowGroupLimit") >= 4, plan[:500]


def test_neighbor_jaccard_hub_cap_in_plan(spark):
    """The wedge self-join must run on the anti-joined (hub-free) edge
    list when a hub exists — the Σdeg² bound depends on it — and the
    hub correction must join the bounded hub-neighbor sets, never
    re-expand hub wedges."""
    from incremental_dagster_delta_spark.queries.graph import neighbor_jaccard_pairs
    from incremental_dagster_delta_spark.tables import lazy_plans

    edges = [(9, s) for s in range(100, 110)] + [(1, 100), (1, 101), (2, 101), (2, 102)]
    df = spark.createDataFrame(edges, "c long, s long")
    with lazy_plans():
        plan = _plan(neighbor_jaccard_pairs(spark, df, deg_cap=4))
    spark.catalog.clearCache()
    # hub exclusion: one LeftAnti against the broadcast hub list
    assert "LeftAnti" in plan
    # correction path: the hub-neighbor arrays join in (array_intersect
    # shows up in the projection), so exactness is restored
    assert "array_intersect" in plan


def test_neighbor_jaccard_steady_state_plan_has_no_cap_stages(spark, sf_dir):
    """Testdata has no customer above the cap, so the registered qid's
    plan must be the PLAIN wedge self-join — the cap is corpus-lifecycle
    metadata, free in the steady state (the _hot_shingles discipline)."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = _plan(QUERIES["q_neighbor_jaccard"].fn(spark, sf_dir))
    spark.catalog.clearCache()
    assert "LeftAnti" not in plan
    assert "array_intersect" not in plan
    # the kernel's result is eagerly materialized outside lazy_plans, so
    # the steady-state pin must still see the REAL wedge join here
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_domain_filter_blocklist_broadcasts(spark, sf_dir):
    """The suffix rules force a nested-loop match, which is only
    acceptable because the RULES side broadcasts — the corpus side must
    never shuffle for the match."""
    plan = _plan(QUERIES["q_domain_filter"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_url_dedup_prunes_to_two_columns(spark, sf_dir):
    """The synthesized-URL projection must not drag the documents text
    column through the scan — ReadSchema stays (doc_id, source)."""
    plan = _plan(QUERIES["q_url_dedup"].fn(spark, sf_dir))
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema


def test_paragraph_bloom_probe_is_broadcast(spark, sf_dir):
    """q_bloom_paragraph_dedup inherits q_bloom_membership's scale
    contract at paragraph grain: the corpus collapses to the <= m-row
    bit table and the batch's paragraph probe joins it BROADCAST; the
    only other shuffles are the bit-table distinct and the per-document
    regroup. A shuffle join here would re-shuffle the corpus per
    arriving batch."""
    from incremental_dagster_delta_spark.queries.lines import q_bloom_paragraph_dedup

    plan = _plan(q_bloom_paragraph_dedup(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys
    assert "CartesianProduct" not in phys


def test_concat_chunk_offsets_join_broadcasts(spark, sf_dir):
    """q_concat_chunk's distributed prefix sum: the per-partition weight
    offsets (numPartitions rows) must BROADCAST back onto the ranged
    data — a shuffle join on _pid would serialize the whole stream
    through one exchange and defeat the no-global-sort design. (The
    RangePartitioning exchange itself is not inspectable here: the
    kernel localCheckpoints the ranged input so its sampled boundaries
    can't shift between subtrees, which truncates the visible lineage
    to a checkpoint scan — the memory-noted materialized-kernel
    caveat.)"""
    from incremental_dagster_delta_spark.queries.training_prep import q_concat_chunk

    plan = _plan(q_concat_chunk(spark, sf_dir))
    phys = plan.split("== Physical Plan ==")[1]
    import re

    assert "BroadcastHashJoin" in phys
    assert "CartesianProduct" not in phys
    # the only sorts may be window-local (global=false) — a global sort
    # (Sort [...], true) would mean the prefix sum serialized after all
    assert not re.search(r"Sort \[[^\]]*\], true", phys), phys


def test_weighted_cumsum_refuses_tied_keys(spark):
    """_global_weighted_cumsum is exported for reuse and its packing is
    nondeterministic under tied order keys — misuse must be LOUD
    (VERDICT r13): a tied key raises task-side via assert_true riding
    the existing window stage; a unique key still computes the exact
    exclusive prefix sum."""
    import pytest

    from incremental_dagster_delta_spark.queries.training_prep import (
        _global_weighted_cumsum,
    )

    ok = spark.createDataFrame(
        [(i, (i % 3) + 1) for i in range(20)], "k long, w long"
    )
    rows = {
        r["k"]: r["_start"]
        for r in _global_weighted_cumsum(ok, ["k"], "w").collect()
    }
    expect, acc = {}, 0
    for i in range(20):
        expect[i] = acc
        acc += (i % 3) + 1
    assert rows == expect

    tied = spark.createDataFrame(
        [(1, 5), (2, 5), (2, 7), (3, 5)], "k long, w long"
    )
    with pytest.raises(Exception, match="UNIQUE key"):
        _global_weighted_cumsum(tied, ["k"], "w").collect()


def test_bitext_mine_stays_batch_by_corpus(spark, sf_dir):
    """q_bitext_mine (r14): everything after the IVF shortlist operates
    on |Q|·k rows, and the shortlist itself must keep the ANN shape —
    probes join candidate buckets (small side broadcastable), never a
    cartesian batch×batch or corpus×corpus product; the margin window
    partitions by query_id (no partition-less window over corpus
    rows)."""
    from incremental_dagster_delta_spark.queries.similarity import q_bitext_mine
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = _plan(q_bitext_mine(spark, sf_dir))
    spark.catalog.clearCache()
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys
    assert "BroadcastHashJoin" in phys  # probes × bucket candidates
    # the margin window is query-partitioned, not global
    assert "windowspecdefinition(query_id" in phys
