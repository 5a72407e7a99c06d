"""Scalar/time helper functions (reference §2.2 P5–P8).

Reimplements the reference's partition macros ``$time`` / ``$time$expand``
(reference ``ingest_example/delta_io.py:48-67``) as DataFrame column
derivations. Unlike the reference — which string-splits the partition key
and mixes calendar-year with ISO-week (the year/ISO-week boundary bug noted
in SURVEY.md §7.2) — these derive every grain from a real date value, and
the ISO week is paired with the ISO year.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Grain sets per partition definition, mirroring reference delta_io.py:22-29.
TIME_GRAINS = {
    "monthly": ["year", "month"],
    "daily": ["year", "month", "day"],
    "hourly": ["year", "month", "day", "hour"],
    "weekly": ["year", "week"],
}


def md5_uniform(*cols: Column) -> Column:
    """Deterministic uniform draw in [0, 1) both engines compute
    identically: first 8 hex digits of md5 over the ':'-joined string
    casts of ``cols``, as a 32-bit fraction. DuckDB replica:
    ``CAST(('0x' || substr(md5(a || ':' || b ...), 1, 8)) AS BIGINT)
    / 4294967296.0``. The shared device behind hash-deterministic
    sampling (DIMSUM gamma, Doulion edges, weighted reservoir) — keep
    Spark and SQL sides in lockstep when touching this."""
    # F.concat (not concat_ws): NULL-propagating, exactly like the SQL
    # replica's `a || ':' || b` — concat_ws would silently SKIP a null
    # column, hashing a different string than the oracle and diverging
    # the two engines' samples on nullable inputs.
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(":"))
        parts.append(c.cast("string"))
    return F.conv(F.substring(F.md5(F.concat(*parts)), 1, 8), 16, 10).cast("long") / float(
        1 << 32
    )


def iso_dow(date_col: Column) -> Column:
    """ISO day-of-week 1=Monday..7=Sunday (Spark dayofweek is 1=Sunday)."""
    return ((F.dayofweek(date_col) + 5) % 7) + 1


def iso_year(date_col: Column) -> Column:
    """ISO-8601 week-numbering year: the calendar year of the Thursday of
    the date's ISO week. Fixes the reference's year/ISO-week mismatch
    (delta_io.py:63-67 vs delta_io.py:38-43)."""
    return F.year(F.date_add(date_col, 4 - iso_dow(date_col)))


def time_part_columns(date_col: Column, grains: list[str]) -> dict[str, Column]:
    """Zero-padded string partition-value columns for the given grains,
    matching the reference's string-typed hive partition values
    (delta_io.py:63-67: zero-padded month/day; delta_io.py:38-43 week)."""
    out: dict[str, Column] = {}
    # A weekly schedule pairs the week with the ISO week-numbering year —
    # calendar year here would reintroduce the reference's boundary bug
    # (2024-12-30 → year=2024, week=01).
    week_based = "week" in grains
    for g in grains:
        if g == "year":
            out["year"] = (
                F.lpad(iso_year(date_col).cast("string"), 4, "0")
                if week_based
                else F.date_format(date_col, "yyyy")
            )
        elif g == "month":
            out["month"] = F.date_format(date_col, "MM")
        elif g == "day":
            out["day"] = F.date_format(date_col, "dd")
        elif g == "hour":
            out["hour"] = F.date_format(date_col, "HH")
        elif g == "week":
            out["week"] = F.lpad(F.weekofyear(date_col).cast("string"), 2, "0")
        else:
            raise ValueError(f"unknown time grain: {g}")
    return out


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns.

    Sorting (or range-repartitioning) a table by this key clusters rows
    that are close in BOTH dimensions into the same files, so parquet
    row-group min/max statistics can skip data for predicates on either
    column — the data-skipping alternative to partitioning by a
    high-cardinality column (SURVEY.md §4: prefer Z-order over
    ``word_length``-style partition keys at scale). Pure bit arithmetic,
    whole-stage-codegen friendly. The 2-column special case of
    :func:`zorder_key_n` (a lands on even bit positions, b on odd —
    pinned bit-for-bit in tests and replayed by the q_zorder_layout
    DuckDB oracle, so the layout must not drift).
    """
    return zorder_key_n([a, b], bits=bits)


def zorder_key_n(cols: list[Column], bits: int = 8) -> Column:
    """N-dimensional Morton key: round-robin interleave the low
    ``bits`` bits of each non-negative integer column (``zorder_key``
    is the 2-column special case). ``len(cols) * bits`` must stay under
    63 so the key fits a signed long — 8 bits across up to 7 columns,
    which is also where Z-order stops being useful (each extra
    dimension halves the per-dimension resolution of a fixed-size
    file's rectangle). Pure bit arithmetic, codegen friendly."""
    n = len(cols)
    if not cols:
        raise ValueError("zorder_key_n needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    longs = [c.cast("long") for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(longs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def _quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket index = number of boundaries ≤ value (codegen'd array scan;
    |boundaries| is 2^bits - 1, small)."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def morton_rank_column(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """df + a synthetic column holding the Morton interleave of each
    column's ``2^bits``-quantile RANK; returns (df, column name). The
    one shared implementation behind :func:`zorder_write` and
    ``PartitionedTable.compact(zorder=True)``.

    Raw-value interleaving would let the wider-range column dominate
    the key, so each dimension is first mapped to its quantile rank
    (boundaries from ``approxQuantile`` — a sampled aggregate, no
    global sort; the same ranging approach Delta's OPTIMIZE ZORDER
    uses) and the *ranks* are interleaved. The synthetic name is
    collision-proofed against existing columns — a fixed ``_z`` would
    silently REPLACE (and a later drop destroy) a real user column."""
    if not 1 <= bits <= 10:
        # |boundaries| = 2^bits - 1 PER COLUMN, materialized as literal
        # arrays scanned per row and as approxQuantile probabilities —
        # past ~10 bits (1023 boundaries) the plan blows up long before
        # zorder_key_n's n*bits<=62 overflow check would fire (r15
        # review). 10 bits = 1024 rank buckets per dimension, already
        # far beyond what file-level clustering can exploit.
        raise ValueError(f"bits={bits} out of range (1..10)")
    zcol = "_z"
    while zcol in df.columns:
        zcol += "_"
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qs = df.stat.approxQuantile(list(cols), probs, 0.01)
    keyed = df.withColumn(
        zcol,
        zorder_key_n(
            [_quantile_bucket(F.col(c), q) for c, q in zip(cols, qs)], bits=bits
        ),
    )
    return keyed, zcol


def zorder_write(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 16, bits: int = 8
) -> None:
    """Cluster ``df`` by the Z-order of (col_a, col_b) into ``n_files``
    range-partitioned parquet files, each covering a compact range in
    BOTH dimensions (see :func:`morton_rank_column` for the ranking
    rationale)."""
    keyed, zcol = morton_rank_column(df, [col_a, col_b], bits=bits)
    (
        keyed.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def expand_time(df: DataFrame, date_col: str, schedule: str = "daily") -> DataFrame:
    """``$time$expand`` macro: one string column per grain (delta_io.py:56-67)."""
    for name, col in time_part_columns(F.col(date_col), TIME_GRAINS[schedule]).items():
        df = df.withColumn(name, col)
    return df


def single_time(df: DataFrame, date_col: str, schedule: str = "daily") -> DataFrame:
    """``$time`` macro: a single partition column named after the finest
    grain, valued with the raw key (delta_io.py:50-54).

    Week-based ``date_format`` patterns ('w') were removed in Spark 3+, so
    the weekly key is built from ISO year + ISO week explicitly.
    """
    finest = TIME_GRAINS[schedule][-1]
    col = F.col(date_col)
    if finest == "week":
        key = F.concat_ws(
            "-",
            F.lpad(iso_year(col).cast("string"), 4, "0"),
            F.lpad(F.weekofyear(col).cast("string"), 2, "0"),
        )
    else:
        fmt = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH"}[finest]
        key = F.date_format(col, fmt)
    return df.withColumn(finest, key)
