"""Data-quality expectations on DataFrames (Dagster asset-check /
Delta CHECK-constraint parity, Spark-first).

The reference runs inside Dagster, whose asset checks gate downstream
materialization; Delta tables enforce CHECK constraints on write. This
module gives the parquet-backed engine the same gate as one declarative
pass:

- every rule is a SQL boolean expression evaluated JVM-side (no UDFs);
- violation tagging builds an ``array<string>`` of failed rule names per
  row in the same projection — one scan, no per-rule jobs;
- per-rule violation counts aggregate map-side with
  ``sum(when(violated, 1))`` — one job for the whole rule set, not one
  per rule. At 100 TB this is the only acceptable shape: k rules cost
  one extra projection on the write path, never k passes.

Null semantics follow SQL CHECK constraints: a rule passes unless it
evaluates to FALSE (NULL passes) — write ``col IS NOT NULL`` explicitly
when nulls are violations.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


class ExpectationError(ValueError):
    """Raised by enforce(mode='fail') when any rule is violated."""

    def __init__(self, counts: dict[str, int]) -> None:
        self.counts = counts
        bad = {k: v for k, v in counts.items() if v}
        super().__init__(f"expectations violated: {bad}")


@dataclass
class CheckedFrames:
    good: DataFrame  # rows passing every rule
    quarantine: DataFrame  # failing rows + `_violations` array<string>


def _violations_col(rules: dict[str, str]):
    tags = [
        F.when(~F.coalesce(F.expr(cond), F.lit(True)), F.lit(name))
        for name, cond in rules.items()
    ]
    return F.filter(F.array(*tags), lambda x: x.isNotNull())


def violation_counts(df: DataFrame, rules: dict[str, str]) -> dict[str, int]:
    """Per-rule violation counts in ONE aggregation job.

    (tableio._validate_constraints expresses the same NULL-passes CHECK
    semantics on the write path via ``(pred) IS NOT FALSE`` — if either
    encoding ever changes, change both.)"""
    if not rules:
        return {}  # no rules = nothing to violate (df.agg(*[]) raises)
    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(cond), F.lit(True)), 1).otherwise(0)
        ).alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in rules}


def split(df: DataFrame, rules: dict[str, str]) -> CheckedFrames:
    """Partition rows into (good, quarantine-with-violation-tags) with a
    single shared scan. Refuses an input that already carries a
    ``_violations`` column: silently overwriting it (and dropping it
    from ``good``) would destroy user data — re-validating quarantined
    rows requires dropping the old tags explicitly first (r15 review)."""
    if "_violations" in df.columns:
        raise ValueError(
            "input already has a _violations column — drop it before "
            "re-validating (split() writes its tags there)"
        )
    tagged = df.withColumn("_violations", _violations_col(rules))
    good = tagged.where(F.size("_violations") == 0).drop("_violations")
    quarantine = tagged.where(F.size("_violations") > 0)
    return CheckedFrames(good=good, quarantine=quarantine)


def enforce(df: DataFrame, rules: dict[str, str], mode: str = "fail") -> DataFrame:
    """Gate a DataFrame on ``rules``.

    - ``fail``: raise :class:`ExpectationError` if any rule is violated
      (one counting job), else return ``df`` untouched.
    - ``drop``: return only passing rows — no extra job; the filter
      fuses into the consumer's plan.
    """
    if mode == "fail":
        counts = violation_counts(df, rules)
        if any(counts.values()):
            raise ExpectationError(counts)
        return df
    if mode == "drop":
        return split(df, rules).good
    raise ValueError(f"unknown mode: {mode!r} (use 'fail' or 'drop')")
