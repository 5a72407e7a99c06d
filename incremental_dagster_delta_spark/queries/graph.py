"""Graph operators: distributed connected components for dedup clustering.

Pair-finding (MinHash, n-gram Jaccard, embedding near-dup) is only half
of deduplication — production pipelines must turn the pair list into
CLUSTER assignments (a~b, b~c ⇒ {a,b,c} is one duplicate group even when
a~c was never emitted) and then pick one survivor per cluster. The
missing step is connected components over the candidate-pair graph.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC 2014): each round is two groupBy/join passes keyed on
node id, and the edge set converges to stars centered at each
component's minimum id in O(log²·n) rounds regardless of graph diameter
— unlike naive min-label propagation, whose round count is the graph
DIAMETER (a 10⁶-long chain of near-dup spam pages would need 10⁶
rounds). Every round shuffles only the current edge list on node id; no
step ever materializes neighborhoods as arrays, so a skewed super-node
(one boilerplate page near-duplicating millions) costs one hot reduce
key — which AQE skew-join handling splits — rather than an O(deg²)
explosion.

Per-iteration ``localCheckpoint`` truncates lineage: iterative DataFrame
algorithms otherwise build exponentially nested plans that stall the
optimizer long before the data is large.

Reference parity: the reference engine has no graph operator; this is
part of the LLM-pipeline extension surface (build brief: dedup as a
first-class family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.registry import query, t
from incremental_dagster_delta_spark.queries.dedup import (
    _PAIRS_ORACLE,
    JACCARD_THRESHOLD,
    ngram_jaccard_pairs,
)

CC_MAX_ITER = 25  # ≥ log²(any realistic node count); loop exits early on fixpoint


def _edge_digest(e: DataFrame) -> tuple:
    """(row count, order-independent content hash) of an edge set —
    two numbers per iteration instead of a full sort/collect compare."""
    # bit_xor: order-independent and overflow-free under ANSI mode (a SUM
    # of 64-bit hashes overflows LongType)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the smallest node id in the component.

    Alternates large-star and small-star rewrites until the edge set is a
    fixpoint (then it is exactly the star forest node→component-min):

    - **large-star**: for each node u, attach every strictly-larger
      neighbor to m(u) = min(Γ(u) ∪ {u}).
    - **small-star**: orient edges parent=smaller; for each node u,
      attach u and all its smaller neighbors to m(u).

    Both steps are (groupBy node → min) + (join back on node): plain
    shuffles on the node id at any scale. Raises if ``max_iter`` rounds
    don't converge (never observed below 20 for n ≤ 10⁹ in the paper's
    experiments; the bound is log²·n).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_digest(e)
    for _ in range(max_iter):
        # -- large-star: Γ over the symmetrized edge list
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("mv", "u").alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        e1 = (
            large.where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
        )
        # -- small-star: orient child=larger, parent=smaller
        o = e1.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
        mins2 = o.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            o.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e = (
            small.where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        cur = _edge_digest(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint edge set is a star forest stored (u=root=component min,
    # v=member): emit every member plus each root labeling itself
    return (
        e.select(F.col("v").alias("node"), F.col("u").alias("component"))
        .union(e.select(F.col("u").alias("node"), F.col("u").alias("component")))
        .distinct()
    )


# Recursive-CTE transitive closure over the same Jaccard pair list the
# Spark side clusters — exact, feasible only at oracle scale.
_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_PAIRS_ORACLE}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
      FROM reach GROUP BY src
    )
    SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c USING (doc_id)
"""


@query("q_dedup_clusters", tags=("dedup", "graph", "llm"), oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs → transitive duplicate clusters: run
    :func:`connected_components` over the exact n-gram-Jaccard pair list
    and label EVERY document with its component id (singletons label
    themselves). The oracle recomputes the same closure with a recursive
    CTE — exact, and only feasible at oracle scale; the Spark side's
    star-contraction rounds are the 100 TB path. (``q_dedup_cluster``
    in dedup.py is the O(diameter) min-label-propagation baseline of
    the same clustering, kept for comparison; this one is the
    diameter-independent scale path and additionally covers
    singletons.)"""
    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(spark, docs.select("doc_id", "text"), cache_key=sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("component"))
    )


_SURVIVORS_ORACLE = f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    ranked AS (
      SELECT c.component, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT component,
           MAX(CASE WHEN rk = 1 THEN doc_id END) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY component
    HAVING COUNT(*) > 1
"""


@query("q_dedup_survivors", tags=("dedup", "graph", "llm"), oracle=_SURVIVORS_ORACLE)
def q_dedup_survivors(spark, sf_dir):
    """Survivor selection per duplicate cluster: within each multi-member
    component keep the highest-quality document (longest text; ties to
    the smallest doc_id) and count the drops. One window over the
    component id on top of :func:`q_dedup_clusters` — the retention
    policy is a pluggable ORDER BY, not new machinery."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(spark, sf_dir)
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ranked = (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("keep_doc_id"),
            F.count("*").cast("long").alias("n_members"),
            (F.count("*") - 1).cast("long").alias("n_dropped"),
        )
        .where(F.col("n_members") > 1)
    )


_LEAKAGE_SPLIT_ORACLE = f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    assigned AS (
      SELECT doc_id, component,
             CASE
               WHEN substring(md5(CAST(component AS VARCHAR)), 1, 1) BETWEEN '0' AND '9'
                 OR substring(md5(CAST(component AS VARCHAR)), 1, 1) IN ('a', 'b')
               THEN 'train'
               WHEN substring(md5(CAST(component AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
               ELSE 'test'
             END AS split
      FROM clusters
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
           MIN(doc_id) AS first_doc
    FROM assigned
    GROUP BY split
"""


@query("q_leakage_free_split", tags=("graph", "sampling", "llm"), oracle=_LEAKAGE_SPLIT_ORACLE)
def q_leakage_free_split(spark, sf_dir):
    """Near-dup-aware train/val/test split: hash the duplicate-cluster
    COMPONENT id (not the doc id) into the 12/2/2-nibble split, so a
    document and all its near-duplicates land in the same split — the
    standard fix for train→test contamination that a per-doc hash split
    cannot provide (a doc in train with its near-copy in test silently
    inflates eval). Plan: q_dedup_clusters' component labels + one
    map-only md5 assignment + a 3-group aggregate; the split decision
    adds ZERO shuffles on top of the clustering."""
    clusters = q_dedup_clusters(spark, sf_dir)
    nib = F.substring(F.md5(F.col("component").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(nib.between("0", "9") | nib.isin("a", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        clusters.select("doc_id", "component", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_components"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_CLUSTER_SIZES_ORACLE = f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    sizes AS (SELECT component, count(*) AS sz FROM clusters GROUP BY component)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
"""


@query("q_cluster_size_histogram", tags=("graph", "dedup", "llm"), oracle=_CLUSTER_SIZES_ORACLE)
def q_cluster_size_histogram(spark, sf_dir):
    """Duplicate-cluster size distribution — the audit view of a dedup
    pass (how many exact singletons, how many 2-clusters, any
    mega-cluster that signals boilerplate misfire before you commit to
    dropping millions of docs). Two tiny aggregations on top of
    q_dedup_clusters' component labels."""
    sizes = q_dedup_clusters(spark, sf_dir).groupBy("component").agg(F.count("*").alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long"),
            (F.col("sz") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )


_DUP_RATE_ORACLE = f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    marked AS (
      SELECT c.doc_id, d.source,
             CASE WHEN c.doc_id <> c.component THEN 1 ELSE 0 END AS is_dup
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dups,
           CAST(ROUND(sum(is_dup) / (1.0 * count(*)), 4) AS DOUBLE) AS dup_rate
    FROM marked GROUP BY source
"""


@query("q_dup_rate_by_source", tags=("graph", "dedup", "llm"), oracle=_DUP_RATE_ORACLE)
def q_dup_rate_by_source(spark, sf_dir):
    """Per-source duplication rate — which feeds are flooding the corpus
    with near-copies (a doc is a duplicate when it is not its cluster's
    canonical min-id member). One join of component labels to source
    tags + one group-key aggregation; the operational dashboard number
    behind 'should we keep paying for this crawl'."""
    docs = t(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(spark, sf_dir)
    marked = clusters.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", (F.col("doc_id") != F.col("component")).cast("int").alias("is_dup")
    )
    return marked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dups"),
        F.round(F.sum("is_dup") / (1.0 * F.count("*")), 4).cast("double").alias("dup_rate"),
    )


# --- weighted PageRank ------------------------------------------------------

PR_ITERS = 8
PR_DAMPING = 0.85  # teleport base = 0.15, written literally on both engines


def _pagerank_oracle() -> str:
    """Chained-CTE power iteration (the q_bpe_encode fixed-unroll trick):
    it0 is the uniform vector, each itK one join+agg over the transition
    list. Same float ops as the Spark loop — single-division transition
    probabilities, damped sums — so round(6) hash-matches."""
    its = []
    for k in range(1, PR_ITERS + 1):
        its.append(
            f"it{k} AS (\n"
            f"      SELECT t.dst AS node,\n"
            f"             0.15 / n.cnt + 0.85 * SUM(p.rank * t.p) AS rank\n"
            f"      FROM trans t JOIN it{k - 1} p ON p.node = t.src, n\n"
            f"      GROUP BY t.dst, n.cnt)"
        )
    chain = ",\n    ".join(its)
    return f"""
    WITH pairs AS (
      SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst, w FROM pairs
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst, w FROM pairs
    ), outw AS (
      SELECT src, SUM(w) AS ow FROM edges GROUP BY src
    ), trans AS (
      SELECT e.src, e.dst, e.w / (1.0 * o.ow) AS p FROM edges e JOIN outw o ON e.src = o.src
    ), n AS (SELECT COUNT(DISTINCT src) AS cnt FROM edges),
    it0 AS (
      SELECT src AS node, 1.0 / n.cnt AS rank FROM (SELECT DISTINCT src FROM edges), n
    ),
    {chain}
    SELECT node, CAST(ROUND(rank, 6) AS DOUBLE) AS rank FROM it{PR_ITERS}
    """


@query("q_pagerank", tags=("graph", "llm"), oracle=_pagerank_oracle())
def q_pagerank(spark, sf_dir):
    """Weighted PageRank over the customer<->supplier order graph — the
    domain-authority signal web-crawl curation pipelines rank sources by
    (a high-rank node is one heavily referenced by other heavily
    referenced nodes). Pregel-style power iteration: the transition list
    (src, dst, w/out_w) is frozen once with ``localCheckpoint``, then
    each of the PR_ITERS=8 rounds is ONE shuffle join on src plus ONE
    aggregation on dst — at 10^10 edges that is the standard scalable
    shape, and lineage is re-truncated every other round so the plan
    never nests (graph.py CC discipline). The graph is symmetrized, so
    there is no dangling-mass correction to apply; isolated customers
    (no orders) are out of the node set by construction. The DuckDB
    oracle unrolls the same iteration as chained CTEs and hash-matches
    at round(6)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    cs = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        "w",
    )
    edges = cs.unionByName(cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / (1.0 * F.col("ow"))).alias("p"))
        .localCheckpoint(eager=True)  # frozen: every iteration re-reads it
    )
    nodes = trans.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(PR_ITERS):
        ranks = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("m"))
            .select(F.col("dst").alias("node"), (0.15 / n + 0.85 * F.col("m")).alias("rank"))
        )
        if i % 2 == 1:
            ranks = ranks.localCheckpoint(eager=True)  # truncate iterative lineage
    return ranks.select("node", F.round("rank", 6).cast("double").alias("rank"))


# --- label propagation communities -------------------------------------------

LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Chained-CTE synchronous label propagation (the q_pagerank unroll
    device). Every vote is an exact BIGINT weight sum and the winner is
    picked by (weight DESC, label ASC) — no floats anywhere, so the
    hash match is seamless."""
    its = []
    for k in range(1, LPA_ITERS + 1):
        its.append(
            f"it{k} AS (\n"
            f"      SELECT node, lbl FROM (\n"
            f"        SELECT e.dst AS node, p.lbl,\n"
            f"               ROW_NUMBER() OVER (\n"
            f"                 PARTITION BY e.dst\n"
            f"                 ORDER BY SUM(e.w) DESC, p.lbl ASC) AS rk\n"
            f"        FROM edges e JOIN it{k - 1} p ON p.node = e.src\n"
            f"        GROUP BY e.dst, p.lbl\n"
            f"      ) WHERE rk = 1)"
        )
    chain = ",\n    ".join(its)
    return f"""
    WITH pairs AS (
      SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), sym AS (
      SELECT 'c' || c AS src, 's' || s AS dst, CAST(w AS BIGINT) AS w FROM pairs
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst, CAST(w AS BIGINT) AS w FROM pairs
    ), edges AS (
      SELECT src, dst, w FROM sym
      UNION ALL
      SELECT src, src, CAST(1 AS BIGINT) FROM (SELECT DISTINCT src FROM sym)
    ),
    it0 AS (
      SELECT DISTINCT src AS node, src AS lbl FROM edges
    ),
    {chain}
    SELECT node, lbl AS community FROM it{LPA_ITERS}
    """


@query("q_label_propagation", tags=("graph", "llm"), oracle=_lpa_oracle())
def q_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation (Raghavan
    2007) over the customer<->supplier order graph — the cheap
    clustering crawl-curation pipelines use to group sources before
    per-community sampling caps. Each node starts as its own label;
    each of LPA_ITERS=3 synchronized rounds every node adopts the label
    with the largest incident edge weight (tie-break: smallest label).
    A unit self-loop keeps a node's own label in the vote — the
    semi-synchronous damping that prevents the bipartite 2-cycle
    oscillation plain synchronous LPA exhibits, while staying fully
    deterministic.

    Scale shape: the symmetrized self-looped edge list is frozen once
    with ``localCheckpoint``; each round is ONE shuffle join on src,
    ONE (dst, lbl) weight aggregation, and ONE per-node window (keyed
    by node — corpus-cardinality partitions, never global). All
    arithmetic is exact BIGINT, so the DuckDB unrolled-CTE oracle
    hash-matches with no rounding seam."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    cs = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        F.col("w").cast("long").alias("w"),
    )
    sym = cs.unionByName(cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    edges = sym.unionByName(
        sym.select("src").distinct().select(
            "src", F.col("src").alias("dst"), F.lit(1).cast("long").alias("w")
        )
    ).localCheckpoint(eager=True)  # frozen: every round re-reads it

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    w_win = Window.partitionBy("node").orderBy(F.col("vw").desc(), F.col("lbl").asc())
    for i in range(LPA_ITERS):
        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.sum("w").alias("vw"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(w_win))
            .where(F.col("rk") == 1)
            .select("node", "lbl")
        )
        if i % 2 == 1:
            labels = labels.localCheckpoint(eager=True)  # truncate lineage
    return labels.select("node", F.col("lbl").alias("community"))


# --- triangle counting (degree-ordered) --------------------------------------

_TRIANGLE_ORACLE = """
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    ), und AS (
      SELECT u, v FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u
    ), oriented AS (
      SELECT e.u, e.v FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      WHERE (du.d, e.u) < (dv.d, e.v)
      UNION ALL
      SELECT e.v, e.u FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      WHERE (dv.d, e.v) < (du.d, e.u)
    ), wedges AS (
      SELECT LEAST(e1.v, e2.v) AS lo, GREATEST(e1.v, e2.v) AS hi
      FROM oriented e1 JOIN oriented e2
        ON e1.u = e2.u AND (e1.v < e2.v)
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM wedges w
      JOIN e ON e.u = w.lo AND e.v = w.hi
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
"""


# NOT bench=True: promotion was tried in round 6 and measured at 61 s of
# the 86 s headline total at sf0.1 — the dense bipartite projection makes
# exact counting inherently O(m^1.5)-expensive here (see "Cost honesty"
# below), so it stays in the correctness set.
@query("q_triangle_count", tags=("graph", "llm"), oracle=_TRIANGLE_ORACLE)
def q_triangle_count(spark, sf_dir):
    """Degree-ordered triangle counting (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011) over the
    co-supplier graph (suppliers adjacent iff they ship the same part).
    Community density / clustering-coefficient audits over near-dup or
    citation graphs use exactly this kernel.

    Scale shape: every edge is ORIENTED from its lower-(degree, id)
    endpoint to the higher one, so each node's out-degree is bounded by
    O(sqrt(m)) — the quadratic closure step stays Σ out_deg² = O(m^1.5)
    instead of Σ deg² (which a single celebrity node would blow up
    quadratically), and runs as per-edge out-list intersections instead
    of a materialized wedge shuffle (see triangle_stats). Two shuffles
    total: the distinct edge build and the out-list aggregation. Integer
    counts — exact on both engines.

    Cost honesty: bipartite projections DENSIFY — at sf0.1 the 1000
    suppliers form a near-complete graph and exact counting does the
    full O(m^1.5) wedge work (~60 s on local[32]); that is inherent to
    exact triangle counting on dense graphs, not a plan defect. At real
    scale you bound the projection first (degree-threshold the hub
    parts, or count on the sampled graph via Doulion-style edge
    sampling) before this kernel runs; the qid therefore stays in the
    correctness set, not the bench headline set (q_triangle_doulion is
    the benchmarked sampled configuration)."""
    return triangle_stats(cosupplier_edges(spark, sf_dir))


def _part_supplier_wide(spark, sf_dir):
    """Distinct (part, supplier) incidence, explicitly repartitioned to
    full machine width on the part key. The projection join EXPANDS
    ~15× (Σ df_part² rows from a Σ df_part input), and AQE coalesces
    the pre-join shuffle by its map-output BYTES — blind to the
    expansion — which was measured to funnel the 8.7M-row pair
    generation (and the per-pair hash work) through ~5 tasks at sf0.1.
    An explicit repartition-by-number is exempt from AQE coalescing, so
    the expansion runs wide.

    Width = 1× defaultParallelism: re-A/B'd round 8 after the r6-tuned
    2× width drifted above the watch threshold — at sf0.1, medians over
    two fresh processes were 1×: 4.55/4.79/4.39 s, 2×: 5.70/4.85 s,
    4×: 6.27 s (docs/SCALE.md). One task per core saturates the machine;
    extra waves only add scheduling overhead on this expansion size. On
    a real cluster the same 1×-of-total-cores sizing applies."""
    n = spark.sparkContext.defaultParallelism
    return (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
        .repartition(n, "p")
    )


def _cosupplier_pairs(spark, sf_dir):
    """PRE-distinct canonical u<v pair occurrences from the bipartite
    projection (one row per shared part) — shared by the exact and
    Doulion edge builds so their canonicalization can never diverge.

    r16 shape: per-part sorted supplier arrays + in-row pair generation
    replace the p-keyed self-join. The generated multiset is identical
    (each part contributes every u<v supplier pair once — sort_array
    gives the same u<v canonicalization the old a.s < b.s predicate
    did), but one ObjectHashAggregate over the SAME exchange the join
    needed replaces the sort-merge self-join: no second sort, no join
    machinery per output row, and the Σ df² expansion runs in codegen
    over the agg output stage — still at full repartition width, and
    the Doulion md5 filter still evaluates right at generation, below
    the dedup shuffle (plan-pinned in tests/test_plans.py). Scale
    hazard unchanged: a hub part lands in one task under either shape
    (hash-partitioned by p); degree-capping the projection remains the
    documented mitigation."""
    ps = _part_supplier_wide(spark, sf_dir)
    lists = ps.groupBy("p").agg(F.sort_array(F.collect_list("s")).alias("ss"))
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ss"),
                lambda x, i: F.transform(
                    F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                    lambda y: F.struct(x.alias("u"), y.alias("v")),
                ),
            )
        )
    )
    return lists.select(pair.alias("pr")).select("pr.u", "pr.v")


def cosupplier_edges(spark, sf_dir):
    """Canonical u<v co-supplier edge set: suppliers adjacent iff they
    ship the same part (bipartite projection of lineitem's part-supplier
    incidence; cost Σ df_part² — bounded here, degree-capped at real
    scale)."""
    return _cosupplier_pairs(spark, sf_dir).distinct()


def triangle_stats(e: DataFrame) -> DataFrame:
    """(n_edges, n_wedges, n_triangles) for an undirected simple graph
    given as canonical u<v edges — the degree-ordered kernel behind
    q_triangle_count, exposed for property tests on known graphs. The
    degree table (|V| rows, ≪ |E|) broadcasts; swap to a shuffle join on
    node id if |V| ever outgrows the broadcast threshold."""
    # e feeds FOUR subtrees below (degree agg, both orientation joins,
    # the closure probe) — checkpoint it once up front or the upstream
    # edge build re-executes per subtree (measured: the sf0.1 bipartite
    # projection re-ran 3-4x, tripling the qid's wall time)
    e = e.select("u", "v").localCheckpoint(eager=True)
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count("*").alias("d")).withColumnRenamed("u", "node")
    ed = (
        e.join(F.broadcast(deg.withColumnRenamed("d", "du")), e.u == F.col("node"))
        .drop("node")
        .join(F.broadcast(deg.withColumnRenamed("d", "dv")), e.v == F.col("node"))
        .drop("node")
    )
    fwd = ed.filter(
        (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    rev = ed.filter(
        (F.col("dv") < F.col("du")) | ((F.col("dv") == F.col("du")) & (F.col("v") < F.col("u")))
    ).select(F.col("v").alias("u"), F.col("u").alias("v"))
    oriented = fwd.unionAll(rev).localCheckpoint()
    # Adjacency-intersection closure (r16, guide §2.3/§2.4 — shuffle
    # keys+metadata, not the expansion): the previous shape MATERIALIZED
    # every wedge (Σ C(outdeg,2) rows ≈ 1.7×10⁸ at sf0.1) through a
    # self-join and shuffled it into a second join against the edge set.
    # Every triangle has a unique (deg,id)-ordered source→middle edge
    # a→b with the sink in outN(a) ∩ outN(b), so
    #     n_triangles = Σ_{(a,b) ∈ oriented} |outN(a) ∩ outN(b)|
    # — each out-list is degree-ordering-bounded at O(√m), the total
    # element work keeps the O(m^1.5) bound, and the intersections run
    # inside codegen per edge row instead of as 10⁸ shuffled rows. The
    # count is EXACTLY the closed-wedge count (each closed wedge
    # (u; lo, hi) is |{u ∈ outN(lo̲)∩…}| seen once at its source pair);
    # list order never matters (array_intersect is a set intersection,
    # and edges are distinct so the lists are duplicate-free).
    outs = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs")).persist()
    ec = e  # checkpointed above; reused by the edge count
    # n_wedges comes ANALYTICALLY from the oriented out-degrees —
    # Σ C(outdeg, 2) is exactly the count the wedge expansion would
    # produce, from one cheap aggregation over the out-lists: no wedge
    # materialization, and no Observation accumulator (whose shuffle-map
    # retry semantics could double-count on a real cluster — n_wedges is
    # an oracle-hash-checked output column, so it must be deterministic
    # under retries).
    n_w = int(
        outs.select(F.size("nbrs").alias("d"))
        .agg(F.coalesce(F.sum(F.expr("d * (d - 1) DIV 2")), F.lit(0)).alias("w"))
        .first()["w"]
    )
    closed = (
        oriented.join(
            outs.select(F.col("u").alias("_a"), F.col("nbrs").alias("na")),
            F.col("u") == F.col("_a"),
        )
        # inner: a middle node with no out-list closes nothing (its term
        # is |outN(a) ∩ ∅| = 0), so dropping the row is exact
        .join(
            outs.select(F.col("u").alias("_b"), F.col("nbrs").alias("nb")),
            F.col("v") == F.col("_b"),
        )
        .select(F.size(F.array_intersect("na", "nb")).alias("k"))
    )
    n_t = int(closed.agg(F.coalesce(F.sum("k"), F.lit(0)).alias("t")).first()["t"])
    n_e = ec.count()
    outs.unpersist()
    from incremental_dagster_delta_spark.tables import literal_df

    # literal_df, not createDataFrame: one literal row must not cost a
    # defaultParallelism-wide python round-trip (tables.literal_df)
    return literal_df(
        e.sparkSession, [(n_e, n_w, n_t)], "n_edges long, n_wedges long, n_triangles long"
    )


# --- Doulion edge-sampled triangle estimate (the 100 TB configuration) -------

DOULION_P = 0.1
# 1/p³ as the EXACT double both engines multiply by (computed once here;
# embedding the repr avoids cross-engine pow() drift)
_DOULION_SCALE = 1.0 / (DOULION_P**3)

_DOULION_ORACLE = f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), full_e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    ), e AS (
      SELECT u, v FROM full_e
      WHERE CAST(('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)
              || ':tri'), 1, 8)) AS BIGINT) / 4294967296.0 < {DOULION_P}
    ), und AS (
      SELECT u, v FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u
    ), oriented AS (
      SELECT e.u, e.v FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      WHERE (du.d, e.u) < (dv.d, e.v)
      UNION ALL
      SELECT e.v, e.u FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      WHERE (dv.d, e.v) < (du.d, e.u)
    ), wedges AS (
      SELECT LEAST(e1.v, e2.v) AS lo, GREATEST(e1.v, e2.v) AS hi
      FROM oriented e1 JOIN oriented e2
        ON e1.u = e2.u AND (e1.v < e2.v)
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM wedges w
      JOIN e ON e.u = w.lo AND e.v = w.hi
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(ROUND(n_triangles * {_DOULION_SCALE!r}, 4) AS DOUBLE) AS est_triangles
    FROM tri
"""


def doulion_sampled_edges(spark, sf_dir) -> DataFrame:
    """The p-sampled co-supplier edge set: keep an edge iff its
    md5_uniform(u, v, 'tri') draw falls under DOULION_P. Exposed so the
    plan test drives the REAL product expression (not a hand copy).

    The sample filter is a pure function of (u, v), so it pushes BELOW
    the projection's dedup: the Σdf² pair expansion is filtered map-side
    as it is generated and only the p-fraction reaches the distinct's
    shuffle — measured 10.3 s → ~3 s on the sf0.1 edge build, and the
    kept-edge set is identical to filtering after dedup. This ordering
    is where Doulion's savings actually live on a dense projection: the
    downstream wedge work was already cheap once sampled."""
    from incremental_dagster_delta_spark.functions import md5_uniform

    pairs = _cosupplier_pairs(spark, sf_dir)
    return pairs.where(md5_uniform(F.col("u"), F.col("v"), F.lit("tri")) < DOULION_P).distinct()


@query("q_triangle_doulion", tags=("graph", "llm"), bench=True, oracle=_DOULION_ORACLE)
def q_triangle_doulion(spark, sf_dir):
    """Doulion triangle estimation (Tsourakakis et al., KDD 2009): keep
    each edge with probability p = 0.1 via a deterministic md5 uniform
    (both engines compute the identical sample), run the degree-ordered
    exact kernel on the sampled graph, scale the count by 1/p³ — an
    unbiased estimator whose wedge work shrinks by ~p², which is how
    triangle counting actually runs on a dense 100 TB projection
    (measured here: the exact kernel costs 61 s at sf0.1; this
    configuration is the benchmarked one). Accuracy vs the exact count
    is pinned in tests/test_graph.py; the estimate itself is
    hash-checked because the sample is deterministic."""
    return triangle_stats(doulion_sampled_edges(spark, sf_dir)).withColumn(
        "est_triangles",
        F.round(F.col("n_triangles") * F.lit(_DOULION_SCALE), 4).cast("double"),
    )


# --- k-core decomposition (graph hygiene for dedup/link graphs) --------------


def k_core_edges(e: DataFrame, k: int, max_iter: int | None = None) -> DataFrame:
    """Edges of the k-core: iteratively drop nodes with degree < k until
    fixpoint (Matula & Beck 1983 peeling, expressed as Spark rounds).

    Each round is two shuffles (degree count + semi-join filter) over a
    strictly shrinking edge set; lineage is truncated per round with
    localCheckpoint, the same discipline as connected_components. Round
    count is small in practice (every round removes every
    currently-under-k node at once) but O(|V|) worst case — a 2-peel of
    an n-node path takes n/2 rounds — so the safety cap defaults to a
    TRUE bound (edge count + 1, already computed for the fixpoint
    check — no extra job), not an arbitrary constant: every
    non-terminal round removes at least one edge, so exceeding the cap
    can only mean a logic bug, never a legal-but-deep peel."""
    cur = e.select("u", "v").localCheckpoint(eager=True)
    n_cur = cur.count()
    if max_iter is None:
        max_iter = n_cur + 1
    for _ in range(max_iter):
        if n_cur == 0:
            return cur
        und = cur.unionAll(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        keep = (
            und.groupBy("u")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= k)
            .select(F.col("u").alias("node"))
        )
        nxt = (
            cur.join(keep, cur.u == keep.node, "left_semi")
            .join(keep, cur.v == keep.node, "left_semi")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            return nxt
        cur, n_cur = nxt, n_nxt
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")


def _ascending_core_peel(e: DataFrame, k_max: int) -> tuple[DataFrame, DataFrame]:
    """The shared ascending-k peel (Matula & Beck 1983) behind
    :func:`core_numbers` and :func:`core_numbers_clipped` — the two
    differ only in on-cap behavior (probe-and-raise vs clip), so the
    peel lives in one place (ADVICE r7). The (k+1)-peel starts from the
    k-core's edges (strictly shrinking), so total work is Σ_k rounds_k
    over ever-smaller graphs. Returns ``(cores, remaining)``: the
    aggregated (node, core) table with cores ≤ k_max, and the edge set
    surviving the deepest peel (empty iff the graph has no core deeper
    than k_max)."""
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    cores = nodes.select("node", F.lit(0).alias("core"))
    cur = e
    for k in range(1, k_max + 1):
        cur = k_core_edges(cur, k)
        if cur.isEmpty():
            break
        survivors = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .distinct()
            .select("node", F.lit(k).alias("core"))
        )
        cores = cores.unionAll(survivors)
    agg = cores.groupBy("node").agg(F.max("core").cast("long").alias("core"))
    return agg, cur


def core_numbers(e: DataFrame, max_k: int = 64) -> DataFrame:
    """(node, core) — each node's core number: the largest k for which it
    survives the k-core peel (see :func:`_ascending_core_peel` for the
    schedule). Supports core numbers up to and INCLUDING max_k: one
    probe peel at max_k+1 runs on whatever survived the deepest level
    and raises only if that still leaves edges."""
    cores, rest = _ascending_core_peel(e, max_k)
    if not rest.isEmpty() and not k_core_edges(rest, max_k + 1).isEmpty():
        raise RuntimeError(f"core_numbers: graph has a core deeper than {max_k}")
    return cores


def core_numbers_clipped(e: DataFrame, k_cap: int) -> DataFrame:
    """(node, core) with core numbers CLIPPED at ``k_cap`` — the total
    variant of :func:`core_numbers`: the ascending peel simply stops at
    ``k_cap``, so nodes whose true core is deeper report ``k_cap``
    instead of raising. This is the right contract for a corpus-facing
    query: the peel cost is bounded by construction at any data scale,
    and for graph-hygiene use (dense-cluster vs incidental-match
    separation) everything above the cap is "dense enough" anyway."""
    return _ascending_core_peel(e, k_cap)[0]


# Corpus-configuration k-core (the round-6 verdict's ask: q_kcore proves
# the kernel on an 18-node literal; this runs the REAL ascending peel
# over the Doulion-sampled co-supplier graph). Cap 8: the sampled sf0.01
# graph's deepest core is 7 (k=8 peels to empty), so nothing clips at
# the gated SFs; at larger SFs the clip bounds the qid's cost.
KCORE_CORPUS_CAP = 8
# Oracle unroll depth per k-level. A peel round is idempotent once its
# level's fixpoint is reached, so over-unrolling is safe; the bound must
# only be ≥ the true round count at the COMPARED scale factors. Measured
# ascending-schedule rounds (sf0.001 / sf0.01): max 8 (the k=7 level at
# sf0.01) — 12 is 1.5× that. If the driver ever gates at a new SF,
# re-measure (tests/test_graph.py pins fixpoint-within-12 at sf0.01).
_KCORE_CORPUS_ROUNDS = 12


def _kcore_corpus_oracle() -> str:
    """Unrolled chained-CTE ascending peel (the q_pagerank device): the
    Doulion edge sample, then for k = 1..CAP, _KCORE_CORPUS_ROUNDS
    degree-filter rounds, each CTE MATERIALIZED (each is referenced
    multiple times — materialization keeps DuckDB's planner from
    exponential inlining). Core number = max k whose final round still
    contains the node."""
    parts = [
        f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), full_e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    ), e0_{_KCORE_CORPUS_ROUNDS} AS MATERIALIZED (
      SELECT u, v FROM full_e
      WHERE CAST(('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)
              || ':tri'), 1, 8)) AS BIGINT) / 4294967296.0 < {DOULION_P}
    )"""
    ]
    surv = []
    for k in range(1, KCORE_CORPUS_CAP + 1):
        for r in range(1, _KCORE_CORPUS_ROUNDS + 1):
            prev = f"e{k - 1}_{_KCORE_CORPUS_ROUNDS}" if r == 1 else f"e{k}_{r - 1}"
            parts.append(
                f""", k{k}_{r} AS MATERIALIZED (
      SELECT t.u AS node
      FROM (SELECT u FROM {prev} UNION ALL SELECT v AS u FROM {prev}) t
      GROUP BY t.u HAVING COUNT(*) >= {k}
    ), e{k}_{r} AS MATERIALIZED (
      SELECT p.u, p.v FROM {prev} p
      JOIN k{k}_{r} a ON a.node = p.u
      JOIN k{k}_{r} b ON b.node = p.v
    )"""
            )
        last = f"e{k}_{_KCORE_CORPUS_ROUNDS}"
        surv.append(
            f"SELECT u AS node, {k} AS core FROM {last} "
            f"UNION ALL SELECT v AS node, {k} AS core FROM {last}"
        )
    base = f"e0_{_KCORE_CORPUS_ROUNDS}"
    parts.append(
        f""", cores AS (
      SELECT u AS node, 0 AS core FROM {base}
      UNION ALL SELECT v AS node, 0 AS core FROM {base}
      UNION ALL {' UNION ALL '.join(surv)}
    )
    SELECT node, CAST(MAX(core) AS BIGINT) AS core FROM cores GROUP BY node"""
    )
    return "".join(parts)


@query("q_kcore_corpus", tags=("graph", "llm"), oracle=_kcore_corpus_oracle())
def q_kcore_corpus(spark, sf_dir):
    """Core numbers (clipped at {KCORE_CORPUS_CAP}) of the Doulion-
    sampled co-supplier graph — the corpus-scale configuration of
    :func:`core_numbers` the literal-scenario q_kcore can't exercise:
    the real ascending :func:`k_core_edges` peel (localCheckpoint per
    round, true iteration bounds) over a graph built from lineitem's
    bipartite projection. The oracle replays the identical peel as
    unrolled MATERIALIZED CTE rounds (see :func:`_kcore_corpus_oracle`);
    all values are exact integers, so the hash gate has no float
    surface. At sf0.01: 100 nodes, deepest core 7, 499 sampled edges."""
    e = doulion_sampled_edges(spark, sf_dir)
    return core_numbers_clipped(e, KCORE_CORPUS_CAP)


# Pinned literal scenario (the q_media_resize pattern): K5 clique with a
# pendant, a 6-cycle, and a 5-leaf star — core numbers are textbook
# (clique 4, cycle 2, star/pendant 1).
_KCORE_SCENARIO = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]  # K5: 0-4
    + [(4, 5)]  # pendant off the clique
    + [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 10)]  # C6
    + [(20, leaf) for leaf in (21, 22, 23, 24, 25)]  # star
)

_KCORE_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(4 AS BIGINT)), (1, 4), (2, 4), (3, 4), (4, 4),
      (5, 1),
      (10, 2), (11, 2), (12, 2), (13, 2), (14, 2), (15, 2),
      (20, 1), (21, 1), (22, 1), (23, 1), (24, 1), (25, 1)
    ) AS t(node, core)
    """


@query("q_kcore", tags=("graph", "llm"), oracle=_KCORE_ORACLE)
def q_kcore(spark, sf_dir):
    """k-core decomposition through :func:`core_numbers`, hash-checked
    via the literal-scenario pattern: a graph with textbook core
    structure (clique 4-core, cycle 2-core, star and pendant 1-core)
    whose core numbers are the VALUES oracle. The dedup-graph use: core
    number separates densely inter-duplicated clusters (template farms,
    mirror sets — high core) from incidental pairwise matches (core 1),
    a standard pre-filter before survivor selection. Arbitrary-graph
    correctness is pinned against a pure-python peel reference in
    tests/test_graph.py."""
    from incremental_dagster_delta_spark.tables import literal_df

    e = literal_df(spark, _KCORE_SCENARIO, "u long, v long")
    return core_numbers(e)


# --------------------------------------------------------------------------
# Incremental connected-components maintenance (contract-and-union)
# --------------------------------------------------------------------------
# The dedup pair graph GROWS with ingest: each batch contributes new
# within-batch pairs plus batch-vs-corpus pairs (q_incremental_dedup's
# probe output). Recomputing components from the full pair list every
# batch re-shuffles the whole accumulated edge set; the standard
# incremental scheme instead CONTRACTS the known components to their
# root ids, runs CC only on the delta, and relabels:
#
#   1. rewrite the batch's edges through the current assignment
#      (endpoint → its component root; unseen node → itself),
#   2. run star-contraction CC on the rewritten edge set — |E_batch|
#      edges over {touched roots ∪ new nodes}, corpus-size-INDEPENDENT,
#   3. fold the resulting root→new-root mapping into the assignment
#      table with one broadcast join (the mapping is ≤ 2·|E_batch| rows).
#
# Component ids stay canonical (smallest member id): every old root is
# its component's min, so CC over {old roots ∪ new nodes} yields the
# union component's global min. fold-over-batches ≡ one-shot CC over the
# union edge list — hash-pinned by q_cc_incremental reusing
# q_dedup_clusters' full-closure oracle verbatim, and property-pinned
# against union-find in tests/test_graph.py.


def cc_apply_delta(assign: DataFrame, new_edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Fold one batch of new edges into a (node, component) assignment.

    ``assign`` may be empty (first batch). Steps 1-2 touch only the
    batch; step 3 is a single join of the corpus-sized assignment
    against the ≤ 2·|E_batch|-row merge mapping — broadcastable at any
    corpus scale, so maintenance cost per batch is O(|E_batch| log
    |E_batch|) plus one map-only relabel pass."""
    e = new_edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
    a = assign.select(F.col("node").alias("n"), F.col("component").alias("c"))
    rewritten = (
        e.join(a.withColumnRenamed("n", "eu").withColumnRenamed("c", "cu"), "eu", "left")
        .join(a.withColumnRenamed("n", "ev").withColumnRenamed("c", "cv"), "ev", "left")
        .select(
            F.coalesce("cu", "eu").alias("u"),
            F.coalesce("cv", "ev").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    if rewritten.isEmpty():
        # every edge collapsed to a self-loop: u==v after rewrite means
        # both endpoints already share a component (an unseen endpoint
        # maps to itself and cannot equal an old root it has no edge
        # history with unless the edge was a literal self-loop), so the
        # batch merges nothing and introduces no new nodes
        return assign
    m = connected_components(rewritten, src="u", dst="v")
    mapping = m.select(F.col("node").alias("c"), F.col("component").alias("c_new"))
    updated = (
        assign.join(F.broadcast(mapping), assign["component"] == mapping["c"], "left")
        .select("node", F.coalesce("c_new", "component").alias("component"))
    )
    fresh = m.join(assign, m["node"] == assign["node"], "left_anti").select(
        "node", "component"
    )
    return updated.unionByName(fresh)


@query("q_cc_incremental", tags=("dedup", "graph", "llm", "incremental"), oracle=_CLUSTERS_ORACLE)
def q_cc_incremental(spark, sf_dir):
    """Duplicate-cluster maintenance under incremental edge arrival: the
    exact n-gram-Jaccard pair list lands in three deterministic waves
    ((doc_a + doc_b) % 3 — each wave mixes fresh nodes with merges of
    established components), folded through :func:`cc_apply_delta`. The
    oracle is q_dedup_clusters' full-corpus recursive-CTE closure
    verbatim, so the driver hash-check pins fold-over-waves ≡
    one-shot-CC-over-all-edges, component ids included. Scale shape:
    each wave's CC runs on wave-sized edges only; the corpus-sized
    assignment is touched once per wave by a broadcast-mapping relabel."""
    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(spark, docs.select("doc_id", "text"), cache_key=sf_dir)
    pairs = pairs.localCheckpoint(eager=True)  # waves share one pair scan
    assign = None
    for w in range(3):
        wave = pairs.where(F.pmod(F.col("doc_a") + F.col("doc_b"), F.lit(3)) == w)
        if assign is None:
            assign = connected_components(wave, src="doc_a", dst="doc_b")
        else:
            assign = cc_apply_delta(assign, wave, src="doc_a", dst="doc_b")
        assign = assign.localCheckpoint(eager=True)  # truncate fold lineage
    return (
        docs.select("doc_id")
        .join(assign.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("component"))
    )


# --- neighbor-set Jaccard (structural node similarity) -------------------------
#
# Which suppliers serve the same customer base? Jaccard over neighbor
# sets in the customer–supplier bipartite graph — the structural-
# equivalence signal behind collaborative filtering and source-level
# "who substitutes for whom" curation. Same wedge algebra as
# q_triangle_count: candidate pairs come only from co-neighbors, never
# from all-pairs.

NJ_TOP = 20

# Wedge-generation degree cap (the dedup.py DF_CAP pattern applied to
# the bipartite graph): customers connected to more than this many
# suppliers are HUBS — a hub of degree d alone materializes O(d²) wedge
# rows, the quadratic hazard at 100× scale. Hubs leave the self-join
# (candidates come from cold customers only) and exactness is restored
# by a per-supplier hub-set correction, |hub_nbrs(s1) ∩ hub_nbrs(s2)| —
# the hub-neighbor arrays are bounded by the hub COUNT (≤ |edges|/cap),
# not by hub degree. Only pairs whose ENTIRE overlap is hubs are missed
# (a customer connected to most suppliers certifies no similarity —
# the stop-shingle argument). Measured on testdata: max customer degree
# is 67 at sf0.01 and 102 at sf0.1, so the cap is behavior-neutral
# there and the exact oracle still hash-matches; the capped path is
# driven by tests/test_graph.py with a synthetic hub.
NJ_DEG_CAP = 256

# Exact hub statistics per immutable corpus (the _hot_shingles
# lifecycle: corpus-level metadata, computed once, localCheckpointed,
# keyed by (corpus key, cap, session) — see dedup._HOT_STATS_CACHE's
# note for why the cap and the owning SparkContext are part of the key).
_NJ_HUB_CACHE: dict[tuple, tuple[DataFrame, bool]] = {}


def _hub_customers(edges: DataFrame, deg_cap: int, cache_key: str | None):
    """(hub-customer DataFrame, is-non-empty) — customers with supplier
    degree > deg_cap, exact, memoized per (corpus key, cap, session)."""
    from incremental_dagster_delta_spark.queries.dedup import _session_key

    key = None if cache_key is None else (cache_key, deg_cap, _session_key(edges))
    if key is not None and key in _NJ_HUB_CACHE:
        return _NJ_HUB_CACHE[key]
    hubs = (
        edges.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") > deg_cap)
        .select("c")
        .localCheckpoint(eager=True)
    )
    entry = (hubs, hubs.limit(1).count() > 0)
    if key is not None:
        _NJ_HUB_CACHE[key] = entry
    return entry


def neighbor_jaccard_pairs(
    spark,
    edges: DataFrame,
    top_n: int = NJ_TOP,
    deg_cap: int = NJ_DEG_CAP,
    cache_key: str | None = None,
) -> DataFrame:
    """Top supplier pairs by customer-set Jaccard over a (c, s) edge
    list — the df-capped wedge kernel of q_neighbor_jaccard, exposed so
    tests can drive the hub-correction path with a synthetic hub
    (testdata has no customer hotter than the cap). ``cache_key`` opts an
    immutable edge corpus into memoized hub statistics; the cache has no
    invalidation — if the keyed table can be mutated in-session, pass
    ``cache_key=None`` (or a version-qualified key) instead.

    The edge list fans out to four consumers (both self-join sides, the
    degree table, the hub-neighbor table); persist() computes the
    join+distinct ONCE instead of four times (r12 plan audit: the
    uncached plan re-ran the orders⋈lineitem distinct per consumer),
    released via materialize_release like every dedup-family kernel."""
    from incremental_dagster_delta_spark.tables import materialize_release

    edges = edges.persist()
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    hubs, has_hubs = _hub_customers(edges, deg_cap, cache_key)
    cold = edges.join(F.broadcast(hubs), "c", "left_anti") if has_hubs else edges
    a = cold.select(F.col("c"), F.col("s").alias("s1"))
    b = cold.select(F.col("c"), F.col("s").alias("s2"))
    inter = (
        a.join(b, "c")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_cold"))
    )
    if has_hubs:
        # Exactness correction: each supplier's HUB-neighbor set is
        # bounded by the number of hubs (tiny by construction), so the
        # true intersection is n_cold + |hub_a ∩ hub_b| — narrow rows
        # throughout, the q_ngram_jaccard hot-set pattern.
        hub_nbrs = (
            edges.join(F.broadcast(hubs), "c", "left_semi")
            .groupBy("s")
            .agg(F.collect_set("c").alias("hub_c"))
        )
        # Element type follows the edge schema — the kernel is public
        # for arbitrary (c, s) edge lists (int/string customer ids), and
        # array_intersect needs both sides to agree exactly.
        empty = F.array().cast(f"array<{edges.schema['c'].dataType.simpleString()}>")
        inter = (
            inter.join(
                hub_nbrs.withColumnsRenamed({"s": "s1", "hub_c": "hub_1"}), "s1", "left"
            )
            .join(
                hub_nbrs.withColumnsRenamed({"s": "s2", "hub_c": "hub_2"}), "s2", "left"
            )
            .withColumn(
                "common_customers",
                F.col("n_cold")
                + F.size(
                    F.array_intersect(
                        F.coalesce("hub_1", empty), F.coalesce("hub_2", empty)
                    )
                ),
            )
        )
    else:
        inter = inter.withColumn("common_customers", F.col("n_cold"))
    d1 = F.broadcast(deg.select(F.col("s").alias("s1"), F.col("d").alias("d1")))
    d2 = F.broadcast(deg.select(F.col("s").alias("s2"), F.col("d").alias("d2")))
    scored = (
        inter.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "common_customers",
            F.round(
                F.col("common_customers")
                / (F.col("d1") + F.col("d2") - F.col("common_customers")).cast(
                    "double"
                ),
                4,
            )
            .cast("double")
            .alias("jaccard"),
        )
    )
    out = scored.orderBy(F.col("jaccard").desc(), "s1", "s2").limit(top_n)
    return materialize_release(out, edges)


@query(
    "q_neighbor_jaccard",
    tags=("graph", "similarity"),
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), deg AS (
      SELECT s, COUNT(*) AS d FROM edges GROUP BY s
    ), inter AS (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common_customers
      FROM edges a JOIN edges b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    ), scored AS (
      SELECT i.s1, i.s2, i.common_customers,
             CAST(ROUND(i.common_customers /
               CAST(d1.d + d2.d - i.common_customers AS DOUBLE), 4) AS DOUBLE) AS jaccard
      FROM inter i JOIN deg d1 ON d1.s = i.s1 JOIN deg d2 ON d2.s = i.s2
    )
    SELECT s1, s2, common_customers, jaccard FROM (
      SELECT *, row_number() OVER (ORDER BY jaccard DESC, s1, s2) AS rk FROM scored
    ) WHERE rk <= {NJ_TOP}
    """,
)
def q_neighbor_jaccard(spark, sf_dir):
    """Top supplier pairs by customer-set Jaccard. Wedge-generated
    candidates with a hub cap (see :func:`neighbor_jaccard_pairs`): the
    distinct (customer, supplier) edge list self-joins on COLD customers
    only — only pairs sharing ≥1 customer ever materialize, and no hub
    can contribute O(deg²) wedge rows; hub overlap is restored exactly
    from bounded per-supplier hub-neighbor sets. The intersection count
    is one map-combinable aggregation over wedges; degrees are a
    |suppliers|-row broadcast; the final cut is TakeOrderedAndProject
    on the ROUNDED score with (s1, s2) tiebreak. Hub statistics are
    corpus-lifecycle metadata (exact, memoized per sf_dir — the
    _hot_shingles/ANALYZE discipline), so the steady-state un-skewed
    plan is the plain wedge self-join."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return neighbor_jaccard_pairs(spark, edges, cache_key=sf_dir)


# --- degree assortativity --------------------------------------------------------
#
# Newman's r (PRL 2002): Pearson correlation of endpoint degrees over
# the edge list — do hubs attach to hubs (r > 0, social nets) or to
# leaves (r < 0, infrastructure/bipartite commerce)? One number that
# says which scale mitigations (hub caps, salting) the graph will need.


@query(
    "q_degree_assortativity",
    tags=("graph", "analytics"),
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), dc AS (SELECT c, COUNT(*) AS d FROM edges GROUP BY c),
    ds AS (SELECT s, COUNT(*) AS d FROM edges GROUP BY s),
    sided AS (
      SELECT dc.d AS du, ds.d AS dv
      FROM edges e JOIN dc ON dc.c = e.c JOIN ds ON ds.s = e.s
    ), sym AS (
      SELECT du, dv FROM sided UNION ALL SELECT dv AS du, du AS dv FROM sided
    )
    SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
           CAST(ROUND(corr(CAST(du AS DOUBLE), CAST(dv AS DOUBLE)), 4) AS DOUBLE) AS assortativity
    FROM sym
    """,
)
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the customer–supplier graph: endpoint
    degrees join onto the distinct edge list (both degree tables are
    node-sized broadcasts), the edge list symmetrizes (Newman's r is
    over ordered endpoint pairs), and Pearson corr folds map-side —
    one pass over edges after two bounded aggregations. The number
    feeds capacity planning for every other graph operator here: a
    strongly disassortative graph (hubs-to-leaves, typical for
    commerce) is exactly where the wedge counts of q_neighbor_jaccard
    and q_triangle_count need the df-cap seam."""
    from incremental_dagster_delta_spark.tables import materialize_release

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()  # three consumers (both degree tables + the join spine)
    )
    dc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("du"))
    ds = edges.groupBy("s").agg(F.count(F.lit(1)).alias("dv"))
    sided = (
        edges.join(F.broadcast(dc), "c")
        .join(F.broadcast(ds), "s")
        .select(F.col("du").cast("double"), F.col("dv").cast("double"))
    )
    sym = sided.unionByName(
        sided.select(F.col("dv").alias("du"), F.col("du").alias("dv"))
    )
    out = sym.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        F.round(F.corr("du", "dv"), 4).cast("double").alias("assortativity"),
    )
    return materialize_release(out, edges)
