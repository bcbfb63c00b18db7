"""Numeric helpers.

``stable_round`` exists because cross-engine float rounding disagrees in two
ways: (1) summation order differs between Spark's partial aggregates and any
oracle engine, so the doubles differ in the last ulps; (2) on an exact
decimal tie (x.xx5) Spark rounds the shortest decimal representation
(Java ``BigDecimal.valueOf`` → HALF_UP → 19.955 → 19.96) while engines that
round the true binary value (DuckDB, C ``round``) see 19.9549999... → 19.95.

Adding a tiny positive bias (eps = 10^-(ndigits+4)) before rounding fixes
both: the effective rounding threshold moves to x.xx5 − eps, which is off the
data's decimal grid, so ulp noise can't straddle it and exact ties round up
on every engine. The bias is far below the data grain, so no non-tie value
changes. Apply the SAME bias in the oracle SQL (``stable_round_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _eps(ndigits: int) -> float:
    return 10.0 ** -(ndigits + 4)


def stable_round(col: Column, ndigits: int = 2) -> Column:
    return F.round(col + F.lit(_eps(ndigits)), ndigits)


def stable_round_sql(expr: str, ndigits: int = 2) -> str:
    """The DuckDB-side twin of ``stable_round`` for oracle strings."""
    return f"round(({expr}) + {_eps(ndigits):.0e}, {ndigits})"
