from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from sparkstreamingflume_spark.session import get_session

    s = get_session("tests", master="local[4]")
    yield s


def lines_df(spark, lines: list[str]):
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [(ln,) for ln in lines],
        T.StructType([T.StructField("value", T.StringType())]),
    )
