"""P3-P9 line-operator semantics incl. the SURVEY §2.8 edge cases.

The oracle here is ``PyLines`` — a pure-Python mirror of the documented
semantics (Java ``split(sep, 0)`` trailing-empty drop as implemented by
``line_fields``: strip the trailing separator run, then split).
Reference behaviors pinned: out-of-range extract -> 'ERROR'
(src/DesenPross.scala:59-63), non-44-field projection -> ''
(src/DesenPross.scala:167-176), masking = md5 hex of the field
(src/MD5.java:24-33).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstreamingflume_spark.functions import lines as L
from tests.conftest import lines_df


class PyLines:
    @staticmethod
    def fields(line: str, sep: str = "|") -> list[str]:
        while line.endswith(sep):
            line = line[: -len(sep)]
        return line.split(sep)

    @staticmethod
    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    @classmethod
    def extract(cls, line: str, i: int) -> str:
        f = cls.fields(line)
        return f[i] if i < len(f) else "ERROR"

    @classmethod
    def mask(cls, line: str, idx: list[int]) -> str:
        f = cls.fields(line)
        return "|".join(cls.md5(x) if i in idx else x for i, x in enumerate(f))

    @classmethod
    def drop(cls, line: str, idx: list[int]) -> str:
        f = cls.fields(line)
        return "|".join(x for i, x in enumerate(f) if i not in idx)

    @classmethod
    def project(cls, line: str, idx: list[int], n: int) -> str:
        f = cls.fields(line)
        return "|".join(f[i] for i in idx) if len(f) == n else ""


EDGE_LINES = [
    "a|b|c",
    "a|b|c|",  # trailing delimiter — still 3 fields (Java split(sep,0))
    "a||c",  # embedded empty field preserved
    "a|b|c||",  # trailing empty run
    "x",
    "",
    "|".join(f"f{i}" for i in range(44)),  # clean GPRS width
    "|".join(f"f{i}" for i in range(44)) + "|",  # 44 + trailing sep
    "|".join(f"f{i}" for i in range(7)),  # short/dirty
    "a|b|\r",  # CR-terminated: \r is its own field, | before it stays
    "a|b|\r\n",  # CRLF-terminated
    "|\r",  # minimal hypothesis counterexample from round 3
    "a|b\r",  # CR glued to last field (no trailing sep to strip)
]


def _run(spark, col) -> list:
    return [r[0] for r in lines_df(spark, EDGE_LINES).select(col).collect()]


def test_field_extract_edges(spark):
    got = _run(spark, L.field_extract("value", 2))
    assert got == [PyLines.extract(ln, 2) for ln in EDGE_LINES]


def test_field_extract_out_of_range_is_error(spark):
    got = _run(spark, L.field_extract("value", 50))
    assert got == ["ERROR"] * len(EDGE_LINES)


def test_mask_fields(spark):
    got = _run(spark, L.mask_fields("value", [0, 2]))
    assert got == [PyLines.mask(ln, [0, 2]) for ln in EDGE_LINES]


def test_drop_fields(spark):
    got = _run(spark, L.drop_fields("value", [1]))
    assert got == [PyLines.drop(ln, [1]) for ln in EDGE_LINES]


def test_project_44to10_total(spark):
    from sparkstreamingflume_spark.schemas import GPRS_PROJECTION

    idx = list(GPRS_PROJECTION)
    got = _run(spark, L.project_fields("value", idx, n_fields=44))
    assert got == [PyLines.project(ln, idx, 44) for ln in EDGE_LINES]
    # the two 44-field lines project, everything else maps to ''
    assert got[6] != "" and got[7] != "" and got[0] == ""


def test_dirty_filter(spark):
    got = _run(spark, L.dirty_filter("value", 44))
    assert got == [len(PyLines.fields(ln)) == 44 for ln in EDGE_LINES]


_FIELD = st.text(
    alphabet=st.characters(blacklist_characters="|", blacklist_categories=("Cs",)),
    max_size=8,
)
_LINE = st.lists(_FIELD, min_size=1, max_size=12).map(lambda fs: "|".join(fs))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_LINE, min_size=1, max_size=30), st.integers(0, 12))
def test_property_extract_mask_roundtrip(spark, batch, idx):
    df = lines_df(spark, batch).select(
        L.field_extract("value", idx).alias("x"),
        L.mask_fields("value", [idx]).alias("m"),
        L.drop_fields("value", [idx]).alias("d"),
    )
    got = df.collect()
    for ln, row in zip(batch, got):
        assert row.x == PyLines.extract(ln, idx)
        assert row.m == PyLines.mask(ln, [idx])
        assert row.d == PyLines.drop(ln, [idx])


def test_md5_parity_with_reference_digest(spark):
    """Spark md5() == hashlib == the reference's RFC-1321 MD5 (src/MD5.java)."""
    got = _run(spark, F.md5(F.col("value")))
    assert got == [hashlib.md5(ln.encode()).hexdigest() for ln in EDGE_LINES]
