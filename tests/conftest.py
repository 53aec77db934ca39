from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    import os

    # keep shuffle/state-store partition counts aligned with the tiny test
    # cluster (otherwise stateful streaming pays 32 state partitions/batch)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from sparkstreamingflume_spark.session import get_session

    s = get_session("tests", master="local[4]")
    yield s


def lines_df(spark, lines: list[str]):
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [(ln,) for ln in lines],
        T.StructType([T.StructField("value", T.StringType())]),
    )
