"""Column-expression builders (the reference's scalar-function library).

Everything here returns :class:`pyspark.sql.Column` built purely from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python UDFs
(SURVEY.md §2.9: the entire DesenPross/MD5 surface maps to built-ins).
"""

from sparkstreamingflume_spark.functions.lines import (  # noqa: F401
    dirty_filter,
    drop_fields,
    field_extract,
    line_fields,
    mask_fields,
    project_fields,
)
