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


def generate_ingest_fixture(
    root: str,
    days: list[str] | None = None,
    files_per_day_per_wave: int = 8,
    wave: int = 0,
    seed: int = 42,
) -> list[str]:
    """Write one wave of word-files; returns the relative paths written.

    Filenames are ``w{wave}-{seq:04d}.txt`` so waves never collide and
    listings are deterministic.
    """
    days = days or DAYS
    rng = random.Random(seed + wave)
    written: list[str] = []
    for day in days:
        d = os.path.join(root, f"day={day}")
        os.makedirs(d, exist_ok=True)
        for i in range(files_per_day_per_wave):
            name = f"w{wave}-{i:04d}.txt"
            with open(os.path.join(d, name), "w") as f:
                f.write(rng.choice(_WORDS))
            written.append(f"day={day}/{name}")
    return written
