"""The reference generator's shared vocabulary (generate.py's Faker
stand-in), used by BOTH forms of the drip corpus — the file fixture
(:mod:`fixture`) and the native DataSource (:mod:`drip`). One
definition: the two corpora are documented as the same generator in two
forms, and private copies silently diverge (r15 review)."""

from __future__ import annotations

WORDS = [
    "spark", "delta", "stream", "batch", "merge", "append", "filter",
    "window", "join", "shuffle", "partition", "column", "vector", "hash",
    "scan", "sort", "agg", "row", "table", "query", "a", "incremental",
]

DAYS = ["2024-03-26", "2024-03-27", "2024-03-29"]
