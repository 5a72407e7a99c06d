"""Short-document edge corpus (r15 review findings 1-3): the shipped
testdata never produces a document under 10 tokens, so the gram-family
queries' sequence() guards were latent. sequence(a, b) with b < a runs
DESCENDING in Spark — unguarded, slice(toks, 0, k) / toks[i + 1] then
crash under ANSI (or emit phantom NULL grams that diverge from the
DuckDB oracle, whose range() is simply empty). This corpus has 0-, 1-,
2- and 3-token docs and pins the full oracle hash-match for every
query that builds word/char grams from the documents table."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from incremental_dagster_delta_spark.oracle import compare_query, duckdb_con
from incremental_dagster_delta_spark.queries import QUERIES

_TEXTS = [
    "",  # 0 tokens
    "one",  # 1 token
    "two words",  # 2 tokens
    "now three words",  # 3 tokens
    "a b",
    "the quick brown fox",
    "",  # second empty doc (even doc_id -> reference side)
    "of",
    "x y z w",
    "and one more pair here",
]

# Every oracle-backed qid that builds grams/shingles over documents and
# is total over the corpus (no other-table dependencies). The second
# batch (r15 review pass 3): q_text_quality ANSI-crashed on the zero
# divisor, and both fingerprints silently diverged (DuckDB
# array_to_string([]) is NULL, Spark array_join is '').
_GRAM_QIDS = [
    "q_gopher_rules",
    "q_rouge_n",
    "q_bleu",
    "q_chrf",
    "q_text_quality",
    "q_doc_fingerprint",
    "q_winnow_fingerprint",
]


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shortdocs"))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(_TEXTS)), pa.int64()),
            "text": pa.array(_TEXTS),
            "lang": pa.array(["en"] * len(_TEXTS)),
            "source": pa.array(["src0"] * len(_TEXTS)),
            "n_chars": pa.array([len(t) for t in _TEXTS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", _GRAM_QIDS)
def test_gram_queries_survive_short_docs(spark, short_dir, name):
    con = duckdb_con(short_dir)
    r = compare_query(spark, con, name, QUERIES[name], short_dir)
    assert r.rows_match, f"{name}: {r.spark_rows} vs {r.oracle_rows} rows"
    assert r.hash_match, f"{name}: {r.detail}"


# --- zero-norm embedding edge corpus (r15 review findings, pass 3) ---------
# One all-zero embedding ANSI-crashed every cosine consumer
# (DIVIDE_BY_ZERO) while the DuckDB oracles kept serving rows (x/0 ->
# NULL there). similarity.cosine and ivf_pq_topk's L2-normalize now take
# the NULL branch; these pins run the cosine family over a corpus with
# an injected zero vector.

_VEC_QIDS = ["q_cosine_topk", "q_matryoshka_eval", "q_rbo_eval", "q_ann_ivf_pq"]


@pytest.fixture(scope="module")
def zero_vec_dir(tmp_path_factory):
    import duckdb

    d = str(tmp_path_factory.mktemp("zerovec"))
    con = duckdb.connect()
    con.sql(
        "COPY (SELECT vec_id, CASE WHEN vec_id = 100 THEN "
        "list_transform(embedding, x -> CAST(0.0 AS FLOAT)) ELSE embedding END AS embedding, "
        "* EXCLUDE (vec_id, embedding) "
        "FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return d


@pytest.mark.parametrize("name", _VEC_QIDS)
def test_cosine_queries_survive_zero_vector(spark, zero_vec_dir, name):
    con = duckdb_con(zero_vec_dir)
    r = compare_query(spark, con, name, QUERIES[name], zero_vec_dir)
    assert r.rows_match, f"{name}: {r.spark_rows} vs {r.oracle_rows} rows"
    assert r.hash_match, f"{name}: {r.detail}"


@pytest.fixture(scope="module")
def zero_query_dir(tmp_path_factory):
    """Embeddings with a QUERY vector (vec_id 3 < N_QUERIES) zeroed —
    the whole query group must drop identically on both engines."""
    import duckdb

    d = str(tmp_path_factory.mktemp("zeroquery"))
    duckdb.connect().sql(
        "COPY (SELECT vec_id, CASE WHEN vec_id IN (3, 100) THEN "
        "list_transform(embedding, x -> CAST(0.0 AS FLOAT)) ELSE embedding END AS embedding, "
        "* EXCLUDE (vec_id, embedding) "
        "FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return d


def test_mmr_survives_zero_query_vector(spark, zero_query_dir):
    con = duckdb_con(zero_query_dir)
    r = compare_query(spark, con, "q_mmr_rerank", QUERIES["q_mmr_rerank"], zero_query_dir)
    assert r.rows_match, f"{r.spark_rows} vs {r.oracle_rows} rows"
    assert r.hash_match, r.detail
