"""Reference-shaped end-to-end pipeline tests (SURVEY.md §5.2-§5.3):
exactly-once across waves, reversal parity, refresh idempotency + stale
leaf cleanup, replay idempotency, small-file compaction, and the
incremental ≡ backfill property the reference readme asks for
(readme.md:18-19)."""

from __future__ import annotations

import collections
import glob
import os

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.sources.fixture import generate_ingest_fixture
from incremental_dagster_delta_spark.sources.ingest import read_text_files
from incremental_dagster_delta_spark.streaming.pipeline import IngestPipeline, to_processed


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "ingest"), str(tmp_path / "tables")


def _table_rows(table):
    return sorted(
        (r["filename"], r["day"], r["word"], r["word_length"]) for r in table.read().collect()
    )


def test_two_wave_exactly_once(spark, roots):
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=12, wave=0)
    pipe = IngestPipeline(spark, ingest, tables)
    pipe.run_incremental()
    generate_ingest_fixture(ingest, days=["2024-03-26", "2024-03-27"], files_per_day_per_wave=5, wave=1)
    pipe.run_incremental()
    total = 12 + 10

    proc = pipe.processed.read()
    assert proc.count() == total
    # exactly-once by file identity (day, filename)
    assert proc.select("filename", "day").distinct().count() == total
    # listing agrees with the filesystem
    assert pipe.listing.read().count() == total

    # backwards parity: word == reverse(processed.word), row for row
    back = pipe.backwards.read()
    joined = proc.alias("p").join(back.alias("b"), ["filename", "day"])
    assert joined.count() == total
    assert joined.where(F.expr("b.word != reverse(p.word)")).count() == 0
    # partition columns match the day= dirs
    assert proc.where(~F.col("day").isin("26", "27")).count() == 0


def test_replay_is_idempotent(spark, roots):
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=8, wave=0)
    pipe = IngestPipeline(spark, ingest, tables)
    pipe.run_incremental()
    before = _table_rows(pipe.processed)

    # Replaying an already-committed batch id must be a no-op (crash
    # between foreachBatch and checkpoint commit replays the batch).
    batch = to_processed(read_text_files(spark, ingest))
    assert pipe.processed.append_batch(batch, 0) is False
    assert _table_rows(pipe.processed) == before


def test_partial_publish_recovery(spark, roots):
    """A torn publish (files moved, no commit marker) must converge on
    replay: leftover b{id}- files are cleaned before re-publish."""
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=8, wave=0)
    pipe = IngestPipeline(spark, ingest, tables)
    pipe.run_incremental()
    before = _table_rows(pipe.processed)

    # simulate: drop batch 0's marker and inject a stray half-published file
    marker = os.path.join(pipe.processed.path, "_commits", "0")
    os.remove(marker)
    part_dir = os.path.dirname(
        glob.glob(os.path.join(pipe.processed.path, "year=*/month=*/day=*/*/b0-*.parquet"))[0]
    )
    stray = os.path.join(part_dir, "b0-part-stray.parquet")
    with open(stray, "wb") as f:
        f.write(b"torn write")

    batch = to_processed(read_text_files(spark, ingest)).repartition("year", "month", "day")
    assert pipe.processed.append_batch(batch, 0) is True
    assert not os.path.exists(stray)
    assert _table_rows(pipe.processed) == before


def test_refresh_idempotent_and_drops_stale_leaves(spark, roots):
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=10, wave=0)
    pipe = IngestPipeline(spark, ingest, tables)
    pipe.run_incremental()
    total = 10

    # refresh with unchanged source: state must not change
    before = _table_rows(pipe.processed)
    pipe.refresh("2024-03-26")
    assert _table_rows(pipe.processed) == before

    # remove every source file of some word_length; refresh must drop
    # that leaf partition entirely (replaceWhere-on-day semantics,
    # reference delta_io.py:104-107)
    # partition values are strings (type inference disabled for parity
    # with the reference's string-typed partition columns)
    lengths = {int(r["word_length"]) for r in pipe.processed.read().collect()}
    victim = max(lengths)
    removed = 0
    for path in glob.glob(os.path.join(ingest, "day=2024-03-26", "*.txt")):
        with open(path) as f:
            if len(f.read().strip()) == victim:
                os.remove(path)
                removed += 1
    assert removed > 0
    pipe.refresh("2024-03-26")
    proc = pipe.processed.read()
    assert proc.where(F.col("word_length") == str(victim)).count() == 0
    assert proc.count() == total - removed


def test_incremental_equals_backfill(spark, tmp_path):
    """Property (readme.md:18-19): any interleaving of incremental runs
    ends in the same table state as one backfill over the final input."""
    ingest = str(tmp_path / "ingest")
    inc_tables = str(tmp_path / "inc")
    back_tables = str(tmp_path / "back")

    waves = [
        (["2024-03-26"], 7),
        (["2024-03-26", "2024-03-27"], 4),
        (["2024-03-27", "2024-03-29"], 3),
    ]
    inc = IngestPipeline(spark, ingest, inc_tables)
    for wave, (days, n) in enumerate(waves):
        generate_ingest_fixture(ingest, days=days, files_per_day_per_wave=n, wave=wave)
        inc.run_incremental()

    back = IngestPipeline(spark, ingest, back_tables)
    back.run_incremental()  # single backfill over everything

    assert _table_rows(inc.processed) == _table_rows(back.processed)
    assert _table_rows(inc.backwards) == _table_rows(back.backwards)


def test_cascade_multi_hop(spark, tmp_path):
    """Cascade topology: backwards derived by a second checkpointed
    stream over the processed table dir must equal the in-batch
    derivation, wave over wave, with exactly-once per hop."""
    ingest = str(tmp_path / "ingest")
    tables = str(tmp_path / "tables")
    pipe = IngestPipeline(spark, ingest, tables, derive_backwards=False)

    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=9, wave=0)
    pipe.run_incremental()
    pipe.run_backwards_cascade()
    assert pipe.backwards.read().count() == 9

    generate_ingest_fixture(ingest, days=["2024-03-26", "2024-03-27"], files_per_day_per_wave=4, wave=1)
    pipe.run_incremental()
    pipe.run_backwards_cascade()
    # rerun with no new upstream data: must be a no-op (checkpointed)
    pipe.run_backwards_cascade()

    total = 9 + 8
    proc = pipe.processed.read()
    back = pipe.backwards.read()
    assert back.count() == total
    assert back.select("filename", "day").distinct().count() == total
    joined = proc.alias("p").join(back.alias("b"), ["filename", "day"])
    assert joined.count() == total
    assert joined.where(F.expr("b.word != reverse(p.word)")).count() == 0


def test_compaction(spark, roots):
    """Multi-wave ingest must not produce per-row parquet files: each
    leaf partition holds at most one file per micro-batch that touched
    it (SURVEY.md §7.7 small-files control)."""
    ingest, tables = roots
    pipe = IngestPipeline(spark, ingest, tables)
    for wave in range(3):
        generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=10, wave=wave)
        pipe.run_incremental()

    files = glob.glob(os.path.join(pipe.processed.path, "year=*/month=*/day=*/word_length=*/*.parquet"))
    per_leaf = collections.Counter(os.path.dirname(f) for f in files)
    assert max(per_leaf.values()) <= 3  # ≤ one file per batch per leaf

    # compaction rewrites every leaf down to one file, preserves rows and
    # the streaming commit markers (replay safety)
    before = _table_rows(pipe.processed)
    pipe.processed.compact()
    files = glob.glob(os.path.join(pipe.processed.path, "year=*/month=*/day=*/word_length=*/*.parquet"))
    per_leaf = collections.Counter(os.path.dirname(f) for f in files)
    assert max(per_leaf.values()) == 1
    assert _table_rows(pipe.processed) == before
    assert os.path.exists(os.path.join(pipe.processed.path, "_commits", "0"))
    # a replayed batch after compaction is still recognized as committed
    batch = to_processed(read_text_files(spark, ingest))
    assert pipe.processed.append_batch(batch, 0) is False
    assert _table_rows(pipe.processed) == before


def test_bounded_backfill_multi_batch(spark, roots):
    """max_files_per_trigger splits the backfill into several bounded,
    individually committed micro-batches (AvailableNow honors admission
    control) with the same exactly-once result."""
    root, tables = roots
    written = generate_ingest_fixture(root, wave=0)  # 24 files
    pipe = IngestPipeline(spark, root, tables)
    pipe.run_incremental(max_files_per_trigger=5)

    batches = pipe.processed.committed_batches()
    assert len(batches) >= 4  # 24 files / 5 per trigger
    rows = pipe.processed.read()
    assert rows.count() == len(written)
    assert rows.select("filename", "day").distinct().count() == len(written)
    # every snapshot is a strict prefix: as-of counts are monotone
    counts = [pipe.processed.read_as_of(b).count() for b in batches]
    assert counts == sorted(counts) and counts[-1] == len(written)


@pytest.mark.parametrize("seed", [11, 23])
def test_incremental_equals_backfill_random_schedule(spark, tmp_path, seed):
    """SURVEY §5.3 as stated: the equivalence holds for RANDOM file
    arrival schedules, not just the fixed three-wave interleaving —
    random day subsets, random file counts (incl. empty waves)."""
    import random as _random

    rng = _random.Random(seed)
    all_days = ["2024-03-25", "2024-03-26", "2024-03-27", "2024-03-28", "2024-03-29"]
    ingest = str(tmp_path / "ingest")
    os.makedirs(ingest, exist_ok=True)  # first wave may legally be empty
    inc = IngestPipeline(spark, ingest, str(tmp_path / "inc"))
    for wave in range(rng.randint(2, 4)):
        days = rng.sample(all_days, rng.randint(1, len(all_days)))
        n = rng.randint(0, 5)  # 0 = a tick with no new files
        if n:
            generate_ingest_fixture(
                ingest, days=days, files_per_day_per_wave=n, wave=wave, seed=seed
            )
        inc.run_incremental()

    back = IngestPipeline(spark, ingest, str(tmp_path / "back"))
    back.run_incremental()
    assert _table_rows(inc.processed) == _table_rows(back.processed)
    assert _table_rows(inc.backwards) == _table_rows(back.backwards)


def test_refresh_then_incremental_stays_exactly_once(spark, roots):
    """r15 review: a refresh() that consumes files the source checkpoint
    has not delivered yet records them in listing; the next
    run_incremental must skip them (listing anti-join), not append their
    rows a second time."""
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=6, wave=0)
    pipe = IngestPipeline(spark, ingest, tables)
    pipe.run_incremental()
    # wave 1 lands AFTER the last incremental run; refresh consumes it
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=4, wave=1)
    pipe.refresh("2024-03-26")
    total = 6 + 4
    assert pipe.processed.read().count() == total
    # the stream now delivers wave 1 too — must be a no-op
    pipe.run_incremental()
    proc = pipe.processed.read()
    assert proc.count() == total
    assert proc.select("filename", "day").distinct().count() == total
    assert pipe.listing.read().count() == total
    assert pipe.backwards.read().count() == total


def test_refresh_applies_expectations_gate(spark, roots):
    """r15 review: refresh() must route violating rows to quarantine
    (replacing the day's stale quarantine rows), never into processed —
    the same gate the streaming path applies; and quarantine partitions
    by the FULL date, not the expanded day-of-month."""
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=10, wave=0)
    pipe = IngestPipeline(
        spark, ingest, tables, expectations={"short_word": "word_length <= 6"}
    )
    pipe.run_incremental()
    n_good = pipe.processed.read().count()
    n_quar = pipe.quarantine.read().count()
    assert n_good + n_quar == 10
    assert n_quar > 0  # the fixture vocabulary includes >6-char words
    # quarantine leaves carry the full date (prunable, month-safe)
    assert set(
        r["day"] for r in pipe.quarantine.read().select("day").distinct().collect()
    ) == {"2024-03-26"}
    # refresh recomputes the same day: the gate holds, counts unchanged,
    # no stale duplicate quarantine rows
    pipe.refresh("2024-03-26")
    assert pipe.processed.read().where(F.col("word_length") > 6).count() == 0
    assert pipe.processed.read().count() == n_good
    assert pipe.quarantine.read().count() == n_quar
    assert pipe.quarantine.read().where(F.col("word_length") <= 6).count() == 0


def test_refresh_then_cascade_does_not_double_backwards(spark, roots):
    """r15 review: refresh() rewrites processed's day into new parquet
    files; the cascade's file stream re-discovers them as unseen and
    must not append rows already present in backwards (per-file
    anti-join)."""
    ingest, tables = roots
    generate_ingest_fixture(ingest, days=["2024-03-26"], files_per_day_per_wave=9, wave=0)
    pipe = IngestPipeline(spark, ingest, tables, derive_backwards=False)
    pipe.run_incremental()
    pipe.run_backwards_cascade()
    assert pipe.backwards.read().count() == 9
    pipe.refresh("2024-03-26")
    assert pipe.backwards.read().count() == 9  # refresh replaced the day
    pipe.run_backwards_cascade()  # re-discovers the refreshed files
    back = pipe.backwards.read()
    assert back.count() == 9
    assert back.select("filename", "day").distinct().count() == 9
    # parity still holds row for row
    joined = pipe.processed.read().alias("p").join(
        back.alias("b"), ["filename", "day"]
    )
    assert joined.where(F.expr("b.word != reverse(p.word)")).count() == 0
