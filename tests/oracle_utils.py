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


def _spark_num_kind(dtype: str):
    """Numeric 'kind' a pandas round-trip would give this Spark column.

    The driver hashes stringified pandas values, so a column that is int64
    on one side and float64 on the other hashes differently even when every
    value is equal (3549 vs 3549.0). Spark longs stay int64; decimals stay
    ``Decimal`` objects (stringified with trailing zeros) — flag them."""
    if dtype in ("tinyint", "smallint", "int", "bigint", "long"):
        return "int"
    if dtype in ("float", "double"):
        return "float"
    if dtype.startswith("decimal"):
        return "decimal"
    return None


def _duck_num_kind(type_name: str):
    """Same, for a DuckDB logical type: HUGEINT (the default type of
    sum(BIGINT)) and DECIMAL both become float64 under fetchdf(), so they
    must pair with a Spark float column, not a long."""
    t = type_name.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE", "REAL") \
            or t.startswith("DECIMAL"):
        return "float"
    return None


def assert_numeric_kinds_match(df, con, sql, name=""):
    """Mirror the driver's dtype sensitivity: every numeric output column
    must be int-kind on both sides or float-kind on both sides."""
    spark_kinds = {c: _spark_num_kind(t) for c, t in df.dtypes}
    duck_kinds = {
        r[0]: _duck_num_kind(r[1])
        for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    for col, sk in spark_kinds.items():
        dk = duck_kinds.get(col)
        if sk is None or dk is None:
            continue
        ok = (sk == dk == "int") or (sk == "float" and dk == "float")
        assert ok, (
            f"{name}.{col}: spark kind {sk!r} vs duckdb kind {dk!r} — "
            "pandas stringification will hash-mismatch (e.g. 3549 vs 3549.0);"
            " cast the oracle (HUGEINT sums need CAST(... AS BIGINT)) or the"
            " Spark column so both sides agree")


def assert_no_complex_columns(df, con, sql, name=""):
    """The driver's pandas canonicalization (``sort_values`` over the
    result frame) crashes on array/map/struct cells (``TypeError:
    unhashable type: 'numpy.ndarray'`` — tokens_to_ids and
    embedding_quantize died this way in round 4 while this local mirror
    passed, because ``_norm_cell`` tuple-izes lists). Reject complex
    output columns here so oracled queries must serialize
    (``concat_ws`` / ``array_to_string``) before registration."""
    for c, t in df.dtypes:
        assert not t.startswith(("array", "map", "struct")), (
            f"{name}.{c}: Spark type {t!r} would crash the driver's pandas "
            "hash — serialize with concat_ws(',', col.cast('array<string>'))")
    for r in con.execute(f"DESCRIBE {sql}").fetchall():
        t = r[1].upper()
        assert not (t.endswith("[]") or t.startswith(("STRUCT", "MAP"))
                    or "LIST" in t), (
            f"{name}.{r[0]}: DuckDB type {r[1]!r} would crash the driver's "
            "pandas hash — serialize with array_to_string(..., ',')")


def assert_query_matches_oracle(spark, con, query_fn, sql, sf_dir, name=""):
    df = query_fn(spark, sf_dir)
    assert_no_complex_columns(df, con, sql, name=name)
    assert_numeric_kinds_match(df, con, sql, name=name)
    got, got_cols = spark_canonical(df)
    want, want_cols = duck_canonical(con, sql)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name}: row {i} differs:\n  spark={g}\n  duck ={w}"
