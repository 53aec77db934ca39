"""Record-type registry — the explicit port of the reference's ``Process``.

The reference keeps per-record-type schemas as hard-coded integer positions
in ``Process`` instances (reference src/Process.scala:15-23, instantiated at
src/StreamingSocketProcess.scala:18-23): a 2-char routing prefix, an
expected field count, phone-field indices (to MD5-mask), start-time index,
and LAC/CI indices (the composite enrichment-join key). We make that an
explicit, typed registry that drives *generated column expressions* — the
schema is data, the operators are generic.

All indices are 0-based positions into the delimiter-split line.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class RecordType:
    """One routed record type (the reference's ``Process`` instance)."""

    prefix: str  # 2-char routing prefix, e.g. "61"
    n_fields: int  # expected split length; mismatch = dirty record (P9)
    phone_idx: tuple[int, ...]  # fields to MD5-mask (P4/P5)
    start_time_idx: int  # event-time field
    lac_idx: int  # enrichment key part 1
    ci_idx: int  # enrichment key part 2
    sep: str = ","  # field delimiter
    tag: str = ""  # output routing tag

    @property
    def key_idx(self) -> tuple[int, int]:
        return (self.lac_idx, self.ci_idx)


# The six socket-routed CDR types (reference
# src/StreamingSocketProcess.scala:18-23): 2G/3G call records (97/91
# fields, phones at 12,15, LAC/CI at 23,24), address records (50 fields,
# phone at 11, LAC/CI 18,19), and SMS (61 fields, phones 13,16, LAC/CI
# 21,22). start-time index is 1 for every type (all six Process ctors pass
# starttime=1).
RECORD_TYPES: dict[str, RecordType] = {
    "61": RecordType("61", 97, (12, 15), 1, 23, 24, tag="2g_call"),
    "62": RecordType("62", 91, (12, 15), 1, 23, 24, tag="3g_call"),
    "63": RecordType("63", 50, (11,), 1, 18, 19, tag="2g_address"),
    "64": RecordType("64", 50, (11,), 1, 18, 19, tag="3g_address"),
    "65": RecordType("65", 61, (13, 16), 1, 21, 22, tag="2g_sms"),
    "66": RecordType("66", 61, (13, 16), 1, 21, 22, tag="3g_sms"),
}

# Archive-only prefixes (no parsing — raw passthrough to the per-type sink;
# reference src/StreamingSocketProcess60.scala:134-202).
ARCHIVE_PREFIXES: tuple[str, ...] = ("60", "67", "68", "69", "70")

# The pipe-delimited 44-field GPRS session record that the DesenPross
# library operates on (sample embedded at reference src/DesenPross.scala:181);
# masked fields 0,1,2,7 (src/StreamingFlumeProcess.scala:146-149), projected
# to 10 fields by processData (src/DesenPross.scala:172-173).
GPRS = RecordType("", 44, (0, 1, 2, 7), 17, 22, 23, sep="|", tag="gprs")
GPRS_PROJECTION: tuple[int, ...] = (0, 7, 17, 1, 2, 32, 33, 36, 22, 43)


# Typed schemas for the synthetic tables (TESTDATA.md / FIXTURES.md §A) so
# readers can assert instead of infer.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
