"""Declarative data-quality expectations (deequ/Great-Expectations style):
assert column constraints over a frame and get a per-rule violation report
— the CI gate a lake pipeline runs before publishing a table.

Scale shape: every ROW-LEVEL rule (not_null, range, set membership, regex)
compiles to one conditional-count aggregate, so the whole rule set costs
ONE scan with map-side partial aggregation and a single global row.
Uniqueness is the one rule that needs key state: it costs one
count-distinct aggregate on the checked column (exact; shuffle keyed on
the column), still no joins. The report is rule-count-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(column: str) -> dict:
    return {"rule": f"not_null({column})", "column": column,
            "violation": F.col(column).isNull()}


def expect_between(column: str, lo, hi) -> dict:
    return {"rule": f"between({column},{lo},{hi})", "column": column,
            "violation": F.col(column).isNotNull() &
            ((F.col(column) < lo) | (F.col(column) > hi))}


def expect_in_set(column: str, values: list) -> dict:
    return {"rule": f"in_set({column})", "column": column,
            "violation": F.col(column).isNotNull() &
            ~F.col(column).isin(values)}


def expect_matches(column: str, pattern: str) -> dict:
    """Regex containment — keep patterns to the RE2/Java-common subset if
    an external SQL oracle must restate them."""
    return {"rule": f"matches({column})", "column": column,
            "violation": F.col(column).isNotNull() &
            ~F.col(column).rlike(pattern)}


def expect_unique(column: str) -> dict:
    return {"rule": f"unique({column})", "column": column,
            "violation": None}  # handled as a count-distinct aggregate


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate every rule and return one report row per rule:
    ``(rule, column, n_rows, n_violations, passed)``. Row-level rules
    share ONE scan (a single multi-aggregate); each uniqueness rule adds
    one exact count-distinct aggregate. Violation counts for uniqueness
    are ``n_rows_with_value − n_distinct_values`` (the surplus copies).
    """
    row_rules = [r for r in rules if r["violation"] is not None]
    uniq_rules = [r for r in rules if r["violation"] is None]
    reports = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            aggs.append(F.count(F.when(r["violation"], 1)).alias(f"__v{i}"))
        wide = df.agg(*aggs)
        # typed lit() structs, not a stack() SQL string: rule names carry
        # user text (regex patterns, set literals) and a quote in them
        # must not be able to break the plan (ADVICE r5)
        rows = F.array(*[
            F.struct(F.lit(r["rule"]).alias("rule"),
                     F.lit(r["column"]).alias("column"),
                     F.col(f"__v{i}").alias("n_violations"))
            for i, r in enumerate(row_rules)])
        reports.append(wide.select(F.explode(rows).alias("__r"), F.col("__n"))
                       .select("__r.rule", "__r.column",
                               "__r.n_violations", "__n"))
    for r in uniq_rules:
        c = r["column"]
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            (F.count(c) - F.count_distinct(F.col(c))).alias("n_violations"))
        reports.append(agg.select(
            F.lit(r["rule"]).alias("rule"), F.lit(c).alias("column"),
            "n_violations", F.col("__n")))
    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    return out.select("rule", "column",
                      F.col("__n").alias("n_rows"),
                      F.col("n_violations").cast("long").alias("n_violations"),
                      (F.col("n_violations") == 0).cast("int")
                      .alias("passed"))
