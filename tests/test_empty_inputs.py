"""Empty-input robustness: every registered query must run on 0-row
tables without raising.

A real pipeline hits empty inputs constantly — an empty landing-dir
day, a filter that drops everything, a new tenant's first run. A plan
that throws on empty input (null from max() propagated into a cast,
head() on an empty frame, a seeded loop that assumes rows) fails the
whole job. Every builder is constructed against a fixture whose tables
all have the right schema and ZERO rows, executed, and must simply
return (usually 0 rows; never an exception).
"""

from __future__ import annotations

import os

import pytest

from sparkstreamingflume_spark.plans import REGISTRY

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """0-row parquet twins of every fixture table (schemas preserved)."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_input(spark, empty_sf, name):
    df = REGISTRY[name].build(spark, empty_sf)
    rows = df.collect()  # executing is the assertion — no exception
    assert isinstance(rows, list)
