"""Every queries() entry vs its oracle_sql() at sf0.001 — the local mirror
of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL
from tests.oracle_utils import duck_connection, assert_query_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


def test_every_query_has_oracle_or_is_declared_weak():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without a query: {missing}"


def test_driver_window_is_exactly_50():
    """The driver's CORRECTNESS run checks EXACTLY the first 50 queries()
    entries. Round 4 placed 51 ahead of the rotation marker, so the 51st
    (`quantiles`) silently lost its slot — pin the contract: the window
    dict is exactly 50 and leads the registry."""
    assert len(entry_mod._WINDOW) == 50
    assert list(QUERIES)[:50] == list(entry_mod._WINDOW)
    assert not set(entry_mod._WINDOW) & set(entry_mod._TAIL)


def test_bench_headline_contract():
    """bench.py's HEADLINE list must reference real registry queries with
    valid actions, cover each at most once, and shard-split without loss
    (a typo here would silently drop a query from the driver's bench)."""
    import bench
    names = [n for n, _ in bench.HEADLINE]
    assert len(names) == len(set(names))
    assert set(names) <= set(QUERIES)
    assert all(a in ("count", "collect") for _, a in bench.HEADLINE)
    per = (len(bench.HEADLINE) + bench.N_SHARDS - 1) // bench.N_SHARDS
    sharded = [n for s in range(bench.N_SHARDS)
               for n, _ in bench.HEADLINE[s * per:(s + 1) * per]]
    assert sharded == names


def test_bench_line_priority_and_backoff_contract():
    """r16 (VERDICT r15 #2/#3): the pinned contract-line membership must
    reference real headline queries (a stale name would silently waste a
    line slot), and the canary retry ladder must escalate and span the
    >=10 min the host's measured degraded windows require."""
    import bench
    names = {n for n, _ in bench.HEADLINE}
    assert bench.LINE_PRIORITY <= names
    assert list(bench.CANARY_BACKOFFS_S) == \
        sorted(bench.CANARY_BACKOFFS_S)
    assert sum(bench.CANARY_BACKOFFS_S) >= 600
    assert len(bench.CANARY_BACKOFFS_S) <= bench.CANARY_RETRIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, QUERIES[name], ORACLES[name],
                                SF_SMALL, name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
