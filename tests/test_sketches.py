"""Sketch accuracy bounds + harness property tests (hypothesis)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_dagster_delta_spark.oracle import norm_cell, table_hash
from incremental_dagster_delta_spark.queries.sketches import approx_distinct_report
from incremental_dagster_delta_spark.tables import load_table

from tests.conftest import SF_DIR


def test_hll_within_error_bound(spark):
    """approx_count_distinct(rsd=0.02) must land within a generous 5×rsd
    of the exact count for every group — corpus-scale, over the events
    table (the qid itself runs the pinned literal scenario)."""
    events = load_table(spark, SF_DIR, "events")
    for row in approx_distinct_report(events, "event_type", "user_id").collect():
        exact, approx = row["exact_users"], row["approx_users"]
        assert abs(approx - exact) <= max(1, 0.10 * exact), row


# --- oracle-harness properties (pure python, no spark) ----------------------

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_infinity=False, width=64),
    st.text(max_size=12),
    st.booleans(),
)


@given(st.lists(st.tuples(_cell, _cell, _cell), max_size=30), st.randoms())
@settings(max_examples=200, deadline=None)
def test_table_hash_is_order_insensitive(rows, rnd):
    """Row order and column order must not affect the hash (the driver
    compares order-insensitively)."""
    cols = ["b_col", "a_col", "c_col"]
    h1 = table_hash(rows, cols)
    shuffled_rows = list(rows)
    rnd.shuffle(shuffled_rows)
    assert table_hash(shuffled_rows, cols) == h1
    # permute columns consistently with their names → same hash
    perm = [2, 0, 1]
    permuted = [tuple(r[i] for i in perm) for r in rows]
    assert table_hash(permuted, [cols[i] for i in perm]) == h1


@given(st.lists(st.tuples(_cell), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_table_hash_detects_any_cell_change(rows):
    """Changing one cell to a distinct value must change the hash."""
    h1 = table_hash(rows, ["x"])
    mutated = list(rows)
    old = mutated[0][0]
    new = "sentinel-other" if norm_cell(old) != "sentinel-other" else "sentinel-other2"
    mutated[0] = (new,)
    assert table_hash(mutated, ["x"]) != h1


def test_norm_cell_floats_stable():
    assert norm_cell(1.0000000000000002) == norm_cell(1.0)
    assert norm_cell(float("nan")) == "NaN"
    assert norm_cell(None) == "NULL"
    assert norm_cell(True) == "1"


def test_hash_seeded_determinism():
    rng = random.Random(1)
    rows = [(rng.random(), rng.randrange(100), f"s{rng.randrange(10)}") for _ in range(50)]
    assert table_hash(rows, ["a", "b", "c"]) == table_hash(list(rows), ["a", "b", "c"])
