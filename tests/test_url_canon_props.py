"""Cross-engine property test for the URL canonicalization chain
(queries/dedup.py): the SAME SQL expression must produce byte-identical
output in Spark SQL and DuckDB for ARBITRARY url-shaped strings, not
just the planted q_url_dedup construction — the portability contract
(backslash-free char classes, at-most-one match per pattern) is exactly
what hypothesis should try to break."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incremental_dagster_delta_spark.queries.dedup import canonical_url_sql

# URL-shaped inputs the chain claims to handle: optional scheme/www,
# a host from a loose alphabet, optional port, path segments, optional
# query (with and without tracking params), optional fragment. Kept to
# single-quote-free printable text so the value embeds as a SQL literal
# identically in both engines.
_host_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8)
_path_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-=", min_size=0, max_size=8)
# Param KEYS are unique per URL — the canonicalizer's documented
# portability domain. Repeating a tracking key (utm_source=x&utm_source=x)
# is OUTSIDE the contract: Spark's regexp_replace replaces every match
# while DuckDB's replaces only the first, so the engines diverge there —
# found by this very property test and pinned explicitly below.
_param = st.sampled_from(
    ["utm_source=x", "utm_campaign=a-b", "utm_medium=m", "id=7", "q=spark", "page=2"]
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http://", "https://", "HTTPS://", ""]))
    www = draw(st.sampled_from(["www.", "WWW.", ""]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from([":80", ":443", ":8080", ""]))
    path = "/" + "/".join(draw(st.lists(_path_seg, min_size=0, max_size=3)))
    params = draw(
        st.lists(_param, min_size=0, max_size=3, unique_by=lambda p: p.split("=")[0])
    )
    query = ("?" + "&".join(params)) if params else draw(st.sampled_from(["", "?"]))
    frag = draw(st.sampled_from(["", "#x", "#Section-2"]))
    return scheme + www + host + port + path + query + frag


@pytest.fixture(scope="module")
def _con():
    return duckdb.connect()


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(urls(), min_size=1, max_size=24, unique=True))
def test_canonicalization_matches_duckdb_on_arbitrary_urls(spark, _con, batch):
    rows = "), (".join(f"'{u}'" for u in batch)
    q = f"SELECT u, {canonical_url_sql('u')} AS c FROM (VALUES ({rows})) AS t(u) ORDER BY u"
    duck = _con.execute(q).fetchall()
    spk = sorted((r[0], r[1]) for r in spark.sql(q).collect())
    assert spk == duck


def test_canonicalization_known_edges(spark, _con):
    """Pin the edge shapes the property space samples thinly."""
    cases = [
        "HTTPS://WWW.Example.COM:443/A/B/?utm_source=f&utm_campaign=c&id=9#frag",
        "http://host:80/",
        "host/?utm_source=only",
        "www.h/?",
        "h#frag",
        "h/p/?&",
    ]
    rows = "), (".join(f"'{u}'" for u in cases)
    q = f"SELECT u, {canonical_url_sql('u')} AS c FROM (VALUES ({rows})) AS t(u) ORDER BY u"
    duck = dict(_con.execute(q).fetchall())
    spk = {r[0]: r[1] for r in spark.sql(q).collect()}
    assert spk == duck
    assert duck["HTTPS://WWW.Example.COM:443/A/B/?utm_source=f&utm_campaign=c&id=9#frag"] == (
        "example.com/a/b?id=9"
    )
    assert duck["http://host:80/"] == "host"
    assert duck["host/?utm_source=only"] == "host"


def test_repeated_tracking_key_is_the_contract_boundary(spark, _con):
    """A REPEATED tracking key is outside the portability contract:
    Spark strips every occurrence, DuckDB only the first. Pin the
    divergence so any future 'fix' that silently changes one engine's
    behavior — or a DuckDB release that goes global — fails loudly and
    the contract comment gets re-examined."""
    u = "h/?utm_source=x&utm_source=x"
    q = f"SELECT {canonical_url_sql('u')} AS c FROM (VALUES ('{u}')) AS t(u)"
    duck = _con.execute(q).fetchone()[0]
    spk = spark.sql(q).collect()[0][0]
    assert spk == "h"                      # replace-all: both strips gone
    assert duck == "h?utm_source=x"        # first-match-only leaves one
    assert spk != duck
