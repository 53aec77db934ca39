"""sparkstreamingflume_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference telecom-CDR streaming pipeline (kingsaction/SparkStreamingFlume,
surveyed in SURVEY.md), re-expressed Spark-first:

* batch operators as declarative DataFrame / SQL plans (Catalyst optimizes),
* streaming as Structured Streaming (sources/pipeline/sinks),
* scalar record ops (split / mask / drop / project) as built-in column
  expressions — no Python UDFs in the hot path,
* scale extensions (dedup, similarity search, text analysis) designed for
  100 TB inputs: shuffle-bounded, broadcast-aware, no driver-side state.

Package layout (SURVEY.md §7.0):
    session     SparkSession factory
    schemas     record-type registry (the reference's ``Process`` port)
    functions/  column-expression builders (P-operators, text analysis)
    sources/    lookup-table loaders, file-drop landing dir
    operators/  dedup / similarity / multimodal extensions
    plans/      declared query registry + oracle SQL
    streaming/  Structured Streaming sources, pipeline graph, sinks
"""

__version__ = "0.1.0"
