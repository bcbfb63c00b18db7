from __future__ import annotations

import pytest

from bda_spadochrony_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("bda-tests", master="local[4]",
                        extra_conf={"spark.sql.shuffle.partitions": "4",
                                    "spark.default.parallelism": "4"})
    yield spark
    spark.stop()
