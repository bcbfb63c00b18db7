"""Local mirror of the driver's DuckDB-oracle comparison: row count, sorted
column names, and an order-insensitive canonical value comparison. Running
this at sf0.001 in pytest catches Spark↔DuckDB semantic drift before the
driver's sf0.01 run does."""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(x):
    if x is None:
        return None
    if isinstance(x, float):
        if math.isnan(x):
            return None
        return round(x, 4)
    if isinstance(x, datetime.datetime):
        return x.replace(tzinfo=None).isoformat()
    if isinstance(x, datetime.date):
        return x.isoformat()
    if hasattr(x, "item"):  # numpy scalar
        return _norm_cell(x.item())
    if isinstance(x, (list, tuple)):
        return tuple(_norm_cell(v) for v in x)
    return x


def canonical(rows, columns):
    """Columns sorted by name, rows sorted by normalized values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def spark_canonical(df):
    return canonical([tuple(r) for r in df.collect()], df.columns), sorted(df.columns)


def duck_canonical(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return canonical(cur.fetchall(), cols), sorted(cols)


def assert_query_matches_oracle(spark, con, query_fn, sql, sf_dir, name=""):
    got, got_cols = spark_canonical(query_fn(spark, sf_dir))
    want, want_cols = duck_canonical(con, sql)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name}: row {i} differs:\n  spark={g}\n  duck ={w}"
