"""Deterministic ingest-files fixture generator (FIXTURES.md §A).

Stand-in for the reference's drip generator (``generate.py:12-29``): emits
single-word ``.txt`` files under ``day=YYYY-MM-DD`` directories. Seeded and
wave-aware so incremental-vs-backfill equivalence (SURVEY.md §5.3) is
testable: call with ``wave=0`` then ``wave=1`` to simulate two arrivals.
"""

from __future__ import annotations

import os
import random

from incremental_dagster_delta_spark.sources.corpus import DAYS, WORDS

_WORDS = WORDS  # shared with the drip DataSource (sources/corpus.py)


def fixture_entries(
    days: list[str] | None = None,
    files_per_day_per_wave: int = 8,
    wave: int = 0,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """One wave's (relative path, content) pairs WITHOUT touching disk —
    the single definition of the fixture's content, shared by the writer
    below and by digest computations (r15 review: hashing the corpus
    previously required a full throwaway build on every import).

    Filenames are ``w{wave}-{seq:04d}.txt`` so waves never collide and
    listings are deterministic."""
    days = days or DAYS
    rng = random.Random(seed + wave)
    return [
        (f"day={day}/w{wave}-{i:04d}.txt", rng.choice(_WORDS))
        for day in days
        for i in range(files_per_day_per_wave)
    ]


def generate_ingest_fixture(
    root: str,
    days: list[str] | None = None,
    files_per_day_per_wave: int = 8,
    wave: int = 0,
    seed: int = 42,
) -> list[str]:
    """Write one wave of word-files; returns the relative paths written."""
    written: list[str] = []
    for rel, content in fixture_entries(days, files_per_day_per_wave, wave, seed):
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "w") as f:
            f.write(content)
        written.append(rel)
    return written
