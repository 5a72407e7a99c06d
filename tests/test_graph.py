"""Connected-components correctness on adversarial shapes (long chains,
rings, stars, singletons) — the cases where naive min-propagation needs
O(diameter) rounds but alternating star contraction stays logarithmic."""

from __future__ import annotations

import pytest

from incremental_dagster_delta_spark.queries.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["component"] for r in connected_components(df, **kw).collect()}


def test_cc_chain(spark):
    """100-node chain: diameter 99, must still converge in CC_MAX_ITER
    star rounds (log², not diameter)."""
    got = _components(spark, [(i, i + 1) for i in range(100)])
    assert got == {i: 0 for i in range(101)}


def test_cc_ring_and_separate_clique(spark):
    ring = [(i, (i + 1) % 10) for i in range(10)]  # component min 0
    clique = [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]  # min 20
    got = _components(spark, ring + clique)
    assert {n: c for n, c in got.items() if n < 10} == {i: 0 for i in range(10)}
    assert {n: c for n, c in got.items() if n >= 20} == {i: 20 for i in range(20, 24)}


def test_cc_handles_duplicate_and_reversed_edges(spark):
    got = _components(spark, [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_cc_empty_edges(spark):
    got = _components(spark, [])
    assert got == {}


def test_cc_two_chains_merged_by_bridge(spark):
    """Two chains joined at their far ends — the min label must cross the
    bridge, the shape that defeats single-round approaches."""
    a = [(i, i + 1) for i in range(0, 10)]          # 0..10
    b = [(i, i + 1) for i in range(100, 110)]       # 100..110
    got = _components(spark, a + b + [(10, 110)])
    assert set(got.values()) == {0}
    assert len(got) == 22


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def _union_find_reference(edges):
    """Pure-Python union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node maps to its component's minimum
    out = {}
    for n in list(parent):
        root = find(n)
        out[n] = root
    # path compression above may leave root labels non-minimal only if
    # union order broke min-rooting; enforce min per component explicitly
    comp_min = {}
    for n, r in out.items():
        comp_min[r] = min(comp_min.get(r, r), n)
    return {n: comp_min[r] for n, r in out.items()}


def test_cc_matches_union_find_on_random_graphs(spark):
    """Property: on arbitrary random edge lists (self-loops, duplicates,
    skewed hubs included) star contraction agrees with a pure-Python
    union-find."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=60)
    edge = st.tuples(node, node)

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(edge, min_size=0, max_size=60))
    def prop(edges):
        expected = _union_find_reference([(a, b) for a, b in edges if a != b])
        got = _components(spark, edges)
        assert got == expected, (sorted(got.items()), sorted(expected.items()))

    prop()


# --- triangle counting -------------------------------------------------------


def _tri(spark, edges):
    from incremental_dagster_delta_spark.queries.graph import triangle_stats

    df = spark.createDataFrame(edges, "u long, v long")
    r = triangle_stats(df).collect()[0]
    return r["n_edges"], r["n_wedges"], r["n_triangles"]


def test_triangles_known_graphs(spark):
    # K4: 6 edges, 4 triangles; every wedge closes
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    ne, nw, nt = _tri(spark, k4)
    assert (ne, nt) == (6, 4)
    assert nw >= nt
    # path 0-1-2-3: no triangles
    assert _tri(spark, [(0, 1), (1, 2), (2, 3)])[2] == 0
    # two triangles sharing an edge (bowtie-ish): 0-1-2 and 1-2-3
    assert _tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])[2] == 2
    # star (celebrity node): many wedges at the hub under naive counting,
    # but degree-ordering orients AWAY from the hub — zero wedges, zero
    # triangles (the "curse of the last reducer" case)
    star = [(0, i) for i in range(1, 9)]
    ne, nw, nt = _tri(spark, star)
    assert (ne, nw, nt) == (8, 0, 0)


def test_triangles_match_bruteforce_random(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = list(range(12))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)})
    adj = set(edges)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in adj and (b, c) in adj and (a, c) in adj)
    )
    assert _tri(spark, edges)[2] == want


def test_doulion_estimate_tracks_exact(spark):
    """Doulion (p=0.1 deterministic md5 sample, ×1/p³) must land near
    the exact triangle count on the sf0.01 co-supplier graph — measured
    12.6% relative error on this fixed corpus (the sample is
    deterministic, so this outcome is pinned, with margin for testdata
    regeneration)."""
    from incremental_dagster_delta_spark.queries.graph import (
        q_triangle_count,
        q_triangle_doulion,
    )
    from tests.conftest import SF_DIR

    exact_row = q_triangle_count(spark, SF_DIR).collect()[0]
    exact = exact_row["n_triangles"]
    row = q_triangle_doulion(spark, SF_DIR).collect()[0]
    assert row["n_triangles"] < exact  # genuinely sampled, not a copy
    assert abs(row["est_triangles"] - exact) / exact < 0.25
    # the estimator's reason to exist: wedge work shrinks ~p² (measured
    # 5552 vs 161700 at sf0.01 — sampling happens BEFORE wedge
    # generation, not after)
    assert row["n_wedges"] < 0.1 * exact_row["n_wedges"]


def test_core_numbers_match_python_peel(spark):
    """core_numbers on a deterministic pseudo-random 60-node graph must
    equal a pure-python Matula-Beck peel."""
    from incremental_dagster_delta_spark.queries.graph import core_numbers

    edges = [
        (a, b)
        for a in range(60)
        for b in range(a + 1, 60)
        if ((a * 31 + b * 17) % 97) < 9  # ~9% density, deterministic
    ]

    # python reference: repeatedly strip minimum-degree nodes
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict[int, int] = {}
    live = dict(adj)
    k = 0
    while live:
        k += 1
        changed = True
        while changed:
            changed = False
            for n in [n for n, nb in live.items() if len(nb) < k]:
                # n's core number is the last k it survived
                expect[n] = k - 1
                for m in live[n]:
                    live[m].discard(n)
                del live[n]
                changed = True
        for n in live:
            expect[n] = k  # survives k so far; overwritten as k grows

    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["core"] for r in core_numbers(df).collect()}
    assert got == expect, {n: (got.get(n), expect.get(n)) for n in expect if got.get(n) != expect.get(n)}


def test_core_numbers_clipped_clips_and_matches_below_cap(spark):
    """core_numbers_clipped(e, c) == min(true core, c) for every node —
    the total-variant contract q_kcore_corpus relies on."""
    from incremental_dagster_delta_spark.queries.graph import (
        core_numbers,
        core_numbers_clipped,
    )

    edges = [
        (a, b)
        for a in range(60)
        for b in range(a + 1, 60)
        if ((a * 31 + b * 17) % 97) < 9
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    true_core = {r["node"]: r["core"] for r in core_numbers(df).collect()}
    for cap in (2, max(true_core.values())):
        got = {r["node"]: r["core"] for r in core_numbers_clipped(df, cap).collect()}
        assert got == {n: min(c, cap) for n, c in true_core.items()}


def test_kcore_corpus_fixpoint_within_oracle_unroll(spark, sf_dir):
    """The q_kcore_corpus oracle unrolls _KCORE_CORPUS_ROUNDS peel rounds
    per k-level; this pins that the REAL ascending peel over the
    Doulion-sampled co-supplier graph reaches fixpoint within that bound
    at every level at the gated SF (k_core_edges raises past max_iter),
    and that the deepest core is within KCORE_CORPUS_CAP (the k=CAP
    level peels to empty, so nothing clips at the compared scale)."""
    from incremental_dagster_delta_spark.queries.graph import (
        _KCORE_CORPUS_ROUNDS,
        KCORE_CORPUS_CAP,
        doulion_sampled_edges,
        k_core_edges,
    )

    cur = doulion_sampled_edges(spark, sf_dir)
    for k in range(1, KCORE_CORPUS_CAP + 1):
        cur = k_core_edges(cur, k, max_iter=_KCORE_CORPUS_ROUNDS)
        if cur.isEmpty():
            break
    assert cur.isEmpty(), (
        f"core deeper than {KCORE_CORPUS_CAP} at {sf_dir} — clip engaged; "
        "re-measure the oracle unroll bound"
    )


# --- incremental connected components (contract-and-union) -------------------


def _fold_waves(spark, waves):
    from incremental_dagster_delta_spark.queries.graph import cc_apply_delta

    assign = None
    for wave in waves:
        df = spark.createDataFrame(wave, "src long, dst long") if wave else (
            spark.createDataFrame([], "src long, dst long")
        )
        if assign is None:
            assign = connected_components(df)
        else:
            assign = cc_apply_delta(assign, df)
    return {r["node"]: r["component"] for r in assign.collect()}


def test_cc_incremental_cross_wave_merge_pin(spark):
    """Chains built across waves must merge: wave 1 {1-2, 10-11},
    wave 2 {2-3}, wave 3 {3-10} — one component rooted at the global
    min, even though no single wave ever sees the whole chain. Wave 3
    merges two ESTABLISHED components (root-to-root), the case a naive
    relabel-only scheme gets wrong."""
    got = _fold_waves(spark, [[(1, 2), (10, 11)], [(2, 3)], [(3, 10)]])
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1}


def test_cc_incremental_noop_and_new_node_waves(spark):
    """A wave whose edges all collapse to self-loops (already-merged
    endpoints) is a no-op; a wave of brand-new nodes lands as fresh
    components without touching old labels."""
    got = _fold_waves(spark, [[(5, 6)], [(5, 6), (6, 5)], [(20, 21)]])
    assert got == {5: 5, 6: 5, 20: 20, 21: 20}


def test_cc_incremental_matches_union_find_on_random_wave_splits(spark):
    """Property: folding an arbitrary edge list in arbitrary wave splits
    through cc_apply_delta equals pure-Python union-find over the union
    edge list — merge-of-deltas ≡ one-shot, any arrival order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=40)
    edge = st.tuples(node, node).filter(lambda e: e[0] != e[1])

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(edge, min_size=1, max_size=40),
        st.lists(st.integers(min_value=0, max_value=2), min_size=40, max_size=40),
    )
    def prop(edges, wave_of):
        waves = [[], [], []]
        for i, e in enumerate(edges):
            waves[wave_of[i]].append(e)
        expected = _union_find_reference(edges)
        got = _fold_waves(spark, waves)
        assert got == expected, (sorted(got.items()), sorted(expected.items()))

    prop()


# --- neighbor-Jaccard hub cap -------------------------------------------------


def _nj_brute(edges, top_n=20):
    """Exact all-wedges reference: jaccard over full neighbor sets."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for c, s in edges:
        nbrs[s].add(c)
    rows = []
    ss = sorted(nbrs)
    for i, s1 in enumerate(ss):
        for s2 in ss[i + 1 :]:
            common = len(nbrs[s1] & nbrs[s2])
            if common:
                j = round(common / (len(nbrs[s1]) + len(nbrs[s2]) - common), 4)
                rows.append((s1, s2, common, j))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_n]


def test_neighbor_jaccard_hub_correction_is_exact(spark):
    """With a hub above the cap, every pair that shares ≥1 COLD customer
    must score exactly as the uncapped all-wedges computation — the hub
    overlap is restored from the bounded hub-neighbor sets."""
    from incremental_dagster_delta_spark.queries.graph import neighbor_jaccard_pairs

    edges = [
        (1, 101), (1, 102),          # cold c1 → s101, s102
        (2, 101), (2, 102),          # cold c2
        (3, 102), (3, 103),          # cold c3
        (4, 103), (4, 104),          # cold c4
        (9, 101), (9, 102), (9, 103), (9, 104),  # hub c9 (deg 4 > cap 2)
    ]
    df = spark.createDataFrame(edges, "c long, s long")
    got = [
        (r["s1"], r["s2"], r["common_customers"], r["jaccard"])
        for r in neighbor_jaccard_pairs(spark, df, deg_cap=2).collect()
    ]
    brute = _nj_brute(edges)
    # the capped result is exactly the brute-force rows whose pair shares
    # at least one cold customer (hub-only pairs are the documented miss)
    expected = []
    from collections import defaultdict

    cold_nbrs = defaultdict(set)
    for c, s in edges:
        if c != 9:
            cold_nbrs[s].add(c)
    for s1, s2, cc, j in brute:
        if cold_nbrs[s1] & cold_nbrs[s2]:
            expected.append((s1, s2, cc, j))
    assert got == expected
    # and the hub genuinely contributes to the exact counts
    assert any(cc > len(cold_nbrs[s1] & cold_nbrs[s2]) for s1, s2, cc, j in got)


def test_neighbor_jaccard_uncapped_when_no_hub(spark):
    """Without hubs the capped kernel IS the plain wedge self-join and
    matches brute force on every pair."""
    from incremental_dagster_delta_spark.queries.graph import neighbor_jaccard_pairs

    edges = [(1, 101), (1, 102), (2, 101), (2, 103), (3, 102), (3, 103)]
    df = spark.createDataFrame(edges, "c long, s long")
    got = [
        (r["s1"], r["s2"], r["common_customers"], r["jaccard"])
        for r in neighbor_jaccard_pairs(spark, df, deg_cap=2).collect()
    ]
    assert got == _nj_brute(edges)
