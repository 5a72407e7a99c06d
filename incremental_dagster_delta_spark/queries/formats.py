"""Source-format coverage: JSONL and CSV ingestion paths.

A training-data pipeline's raw corpus usually arrives as JSONL (and
sometimes CSV) long before it becomes parquet. These qids exercise
``spark.read.json`` / ``spark.read.csv`` with explicit schemas (never
inference at scale — schema inference is a full extra pass over 100 TB)
against a deterministic dump of the ``documents`` table, and are checked
against the parquet-backed oracle — proving the format path is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

_DUMP_ROOT = "/tmp/spark_graft/format_dumps"

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_DOCS_AGG_ORACLE = """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM documents
    GROUP BY lang
"""


def _source_digest(sf_dir: str) -> str:
    """Content key for the documents source: (path, mtime_ns, size) of
    every file under documents.parquet, hashed. Regenerated testdata
    gets a NEW dump directory instead of silently reusing a stale one
    (the incremental_ops._build_oracle_fixture discipline, r15 review)."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(src):
        for name in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, name))
            parts.append(f"{name}:{st.st_mtime_ns}:{st.st_size}")
    else:
        st = os.stat(src)
        parts.append(f"{os.path.basename(src)}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _dump(spark, sf_dir: str, fmt: str) -> str:
    """Deterministic one-time dump of documents as jsonl/csv/orc under
    /tmp — content-addressed by the source's stat digest and published
    by atomic rename, so a regenerated corpus never reuses a stale dump
    and concurrent processes never interleave writes into one target
    (both r15 review; the same two failure modes
    incremental_ops._build_oracle_fixture was rewritten to close)."""
    target = os.path.join(
        _DUMP_ROOT,
        os.path.basename(os.path.normpath(sf_dir)),
        f"{fmt}-{_source_digest(sf_dir)}",
    )
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        tmp = f"{target}.tmp.{os.getpid()}"
        d = t(spark, sf_dir, "documents").coalesce(1)
        writer = d.write.mode("overwrite")
        if fmt == "json":
            writer.json(tmp)
        elif fmt == "orc":
            writer.orc(tmp)
        else:
            # documents.text contains no quotes/commas-in-quotes issues the
            # default csv dialect can't round-trip, but quote anyway
            writer.option("header", "true").option("quoteAll", "true").csv(tmp)
        try:
            os.rename(tmp, target)
        except OSError:
            # another process published first — use theirs, drop ours
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(target, "_SUCCESS")):
                raise
    return target


@query("q_jsonl_source", tags=("source", "format"), oracle=_DOCS_AGG_ORACLE)
def q_jsonl_source(spark, sf_dir):
    """JSONL scan with explicit schema (no inference pass) aggregated to
    prove lossless round-trip vs the parquet-backed oracle."""
    path = _dump(spark, sf_dir, "json")
    docs = spark.read.schema(DOCS_SCHEMA).json(path)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@query("q_csv_source", tags=("source", "format"), oracle=_DOCS_AGG_ORACLE)
def q_csv_source(spark, sf_dir):
    """CSV scan with explicit schema + header, same lossless check."""
    path = _dump(spark, sf_dir, "csv")
    docs = spark.read.schema(DOCS_SCHEMA).option("header", "true").csv(path)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@query("q_orc_source", tags=("source", "format"), oracle=_DOCS_AGG_ORACLE)
def q_orc_source(spark, sf_dir):
    """ORC scan (Spark's second native columnar format — common when
    ingesting from Hive/Trino warehouses). Unlike CSV/JSONL, ORC carries
    its own schema and, like parquet, supports predicate pushdown and
    column pruning, so it is a first-class 100 TB source. Same lossless
    round-trip check against the parquet-backed oracle."""
    docs = spark.read.orc(_dump(spark, sf_dir, "orc"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def _drip_expected_values() -> str:
    """VALUES oracle for q_drip_source, computed at registration time by
    simulating the drip generator's exact seeding contract (absolute
    row-position seeding, shared with the stream reader — r15: the old
    per-partition seeding made the corpus depend on num_partitions).
    The corpus never touches disk, so DuckDB cannot recompute the
    Mersenne-Twister rows itself — but a VALUES literal of the expected
    aggregate still pins the DataSource PLUMBING the query exercises:
    the partition split, exactly-once reads (no dropped/duplicated
    partitions), and the aggregation, all of which would shift the hash
    if broken."""
    from incremental_dagster_delta_spark.sources.drip import row_at

    n_rows, seed = 200, 42
    rows = [row_at(i, seed) for i in range(n_rows)]
    agg: dict[str, tuple[int, int, set]] = {}
    for word, wl, day in rows:
        n, tot, words = agg.get(day, (0, 0, set()))
        agg[day] = (n + 1, tot + wl, words | {word})
    values = ", ".join(
        f"('{day}', {n}, {tot}, {len(words)})" for day, (n, tot, words) in sorted(agg.items())
    )
    return (
        "SELECT day, CAST(n AS BIGINT) AS n, CAST(total_len AS BIGINT) AS total_len, "
        "CAST(n_words AS BIGINT) AS n_words "
        f"FROM (VALUES {values}) AS t(day, n, total_len, n_words)"
    )


@query("q_drip_source", tags=("source", "format"), oracle=_drip_expected_values())
def q_drip_source(spark, sf_dir):
    """Custom Python DataSource (Spark 4 API): the reference's drip
    generator as a native source — parallel deterministic generation
    across input partitions. Oracle: a VALUES literal of the expected
    per-day aggregate, simulated from the generator's seeding contract
    at registration time (see _drip_expected_values)."""
    from incremental_dagster_delta_spark.sources.drip import DripDataSource

    spark.dataSource.register(DripDataSource)
    d = (
        spark.read.format("drip")
        .option("n_rows", 200)
        .option("num_partitions", 8)
        .load()
    )
    return (
        d.groupBy("day")
        .agg(
            F.count("*").alias("n"),
            F.sum("word_length").alias("total_len"),
            F.countDistinct("word").alias("n_words"),
        )
        .orderBy("day")
    )


# --- binary-file source (multimodal ingest path) -----------------------------

# Fixed corpus for the byte-level check: the content-addressed ingest
# fixture (same one the incremental-ops oracles read with read_text()).
from incremental_dagster_delta_spark.queries.incremental_ops import (  # noqa: E402
    _ORACLE_FIX_W1 as _BLOB_FIXTURE,
)


@query(
    "q_binary_source",
    tags=("source", "format", "multimodal"),
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           CAST(size AS BIGINT) AS n_bytes,
           md5(decode(content)) AS digest
    FROM read_blob('{_BLOB_FIXTURE}/day=*/*.txt')
    """,
)
def q_binary_source(spark, sf_dir):
    """Opaque binary ingestion via Spark's ``binaryFile`` source — the
    entry point for image/audio/video payloads before any decode UDF
    runs (multimodal.py consumes exactly this shape). Each file becomes
    one (path, modificationTime, length, content binary) row; the check
    pins name, size, and the full content md5 against DuckDB's
    ``read_blob`` of the same files — a lossless byte-level ingest
    proof. At 100 TB the source parallelizes per file and prunes on
    path/size metadata without touching content bytes."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(_BLOB_FIXTURE)
    )
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )
