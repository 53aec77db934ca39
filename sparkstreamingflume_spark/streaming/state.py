"""Shared parquet state-index plumbing for the foreachBatch family.

Every streaming twin that persists state as plain parquet dirs uses the
same three protocols; round 9 shipped them re-implemented per module
(transitions/regimes/funnels/retentions keep-N state, quantile/sketch
watermark folds, the HLL max-merge fold) — the round-9 verdict's
hygiene item. This module is now the ONE implementation:

* **recover / tmp+rename swap** (:func:`recover_index`,
  :func:`write_swap`): state rewrites go to ``.{name}_tmp``, the live
  dir is renamed to ``.{name}_old``, tmp renamed in, old deleted.
  Every maintenance call FIRST recovers from a prior crash — leftover
  tmp dirs (both the ``.{name}_tmp`` name and the legacy
  ``.{name}_compact_*`` names older indexes may carry) are swept, a
  leftover ``.{name}_old`` with no live dir is renamed back (crash was
  mid-swap; the old state is intact), and one WITH a live dir is
  deleted (crash was pre-cleanup; the new state already serves).

* **live-or-old reads** (:func:`read_state`): the swap leaves a
  one-rename-pair window with no live dir. Readers fall back to the
  ``.{name}_old`` snapshot — for a keep-N fold that is the
  pre-compaction rows (identical read semantics), and for a watermark
  fold it is the previous base while every folded delta still exists
  (deltas are deleted only AFTER the swap), so the merged read stays
  exact. This replaces the round-9 "single-writer, schedule compaction
  between batches" caveat with an actual guarantee for readers;
  WRITERS remain single-instance (two concurrent compactors can still
  race each other's renames).

* **keep-N compaction** (:func:`keepn_compact`): collapse replay
  duplicates, keep the newest N rows per key by ``batch_id``
  (N=2 wherever a replayed batch must still find its predecessor
  state under ``batch_id < B`` reads — foreachBatch replays at most
  the last uncommitted batch, whose predecessor row is always in the
  top 2), swap the rewrite in.

* **list-first delta→base fold** (:func:`list_first_fold`): fold
  exactly the LISTED delta part-files, derive the new watermark from
  the listed files' max ``batch_id``, swap base in, then delete
  exactly the listed files — a delta appended mid-fold is neither
  deleted unfolded nor covered by a too-high watermark. With
  ``use_wm=False`` (idempotent merges like HLL max) the same listing
  discipline applies without watermark bookkeeping.

All directory manipulation goes through the Hadoop FileSystem API
resolved from the index path's own scheme, so the index can live on
local FS, ``hdfs://`` or ``s3a://`` — NOTE the swap assumes atomic
directory rename (holds on local FS and HDFS; on object stores
without atomic rename, run maintenance only while no reader is
active).

The reference kept no cross-batch state at all (DStream counters reset
per batch; src/StreamingFlumeProcess.scala keeps only in-flight RDDs)
— this module is the capability-extension backbone (SURVEY.md §2
LLM-pipeline track).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _read_index(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The index dir may not exist yet (first batch) — empty frame then.

    Existence is probed by ATTEMPTING the read and catching the
    missing-path analysis error, not via os.path — the index can live on
    any Hadoop filesystem (hdfs://, s3a://), where a local isdir() is
    always False and would silently disable the consumer forever.
    """
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(schema).parquet(path)
        df.schema  # force analysis so a missing path raises HERE
        return df
    except AnalysisException as e:
        # the PATH_NOT_FOUND error class exists only on Spark >= 3.4;
        # older Sparks raise the bare "Path does not exist" message, so
        # match both forms — bootstrap must not depend on one version's
        # error class
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str`` via the session's Hadoop conf.

    This is what makes index maintenance FS-agnostic: the same calls
    resolve to the local FS, HDFS, or an object store depending on the
    path scheme — unlike ``os.path``/``os.rename``, which silently see
    nothing on ``hdfs://``/``s3a://`` paths (the bug class the read
    path at :func:`_read_index` already avoids by probing via Spark).
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _jp(spark: SparkSession, path_str: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path_str)


def recover_index(spark: SparkSession, index_dir: str, name: str) -> None:
    """Crash recovery for ``<index_dir>/<name>`` (run before any
    maintenance write): sweep leaked tmp dirs, finish or undo a
    crashed swap (see module doc)."""
    fs, jroot = _hadoop_fs(spark, index_dir)
    if fs.exists(jroot):
        for st in fs.listStatus(jroot):
            n = st.getPath().getName()
            if n == f".{name}_tmp" or n.startswith(f".{name}_compact_"):
                fs.delete(st.getPath(), True)
    jlive = _jp(spark, f"{index_dir}/{name}")
    jold = _jp(spark, f"{index_dir}/.{name}_old")
    if fs.exists(jold):
        if fs.exists(jlive):
            fs.delete(jold, True)
        else:
            fs.rename(jold, jlive)


def write_swap(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    name: str,
    n_files: int = 1,
) -> int:
    """Write ``df`` to ``.{name}_tmp`` and swap it in as the live
    ``<index_dir>/<name>``; returns the row count of the rewrite.
    ``n_files`` sizes the final write (repartition, not coalesce, so
    the producing aggregation stays parallel)."""
    tmp = f"{index_dir}/.{name}_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    fs, _ = _hadoop_fs(spark, index_dir)
    jlive = _jp(spark, f"{index_dir}/{name}")
    jold = _jp(spark, f"{index_dir}/.{name}_old")
    if fs.exists(jlive):
        fs.rename(jlive, jold)
    fs.rename(_jp(spark, tmp), jlive)
    fs.delete(jold, True)
    return n


def swap_in(spark: SparkSession, index_dir: str, name: str, staged: str) -> bool:
    """Swap an ALREADY-MATERIALIZED directory in as the live
    ``<index_dir>/<name>`` — the commit half of a prepared-elsewhere
    rewrite (write_swap minus the write: rename live to ``.{name}_old``,
    rename ``staged`` in, delete old). Pure renames, so the in-slot cost
    is milliseconds regardless of state size — what lets a ~9 s geometry
    build run OFF the maintenance slot (streaming/knn.py
    prepare_rebootstrap / commit_rebootstrap). Returns False when
    ``staged`` does not exist (already swapped by a prior attempt — the
    idempotent-completer case), True after a swap."""
    fs, _ = _hadoop_fs(spark, index_dir)
    jstaged = _jp(spark, staged)
    if not fs.exists(jstaged):
        return False
    jlive = _jp(spark, f"{index_dir}/{name}")
    jold = _jp(spark, f"{index_dir}/.{name}_old")
    if fs.exists(jlive):
        fs.rename(jlive, jold)
    fs.rename(jstaged, jlive)
    fs.delete(jold, True)
    return True


def read_state(
    spark: SparkSession, index_dir: str, name: str, schema: str
) -> DataFrame:
    """Read the live ``<index_dir>/<name>`` state, falling back to the
    ``.{name}_old`` snapshot when a concurrent swap has the live dir
    momentarily absent (round-9 ADVICE: a read landing in the rename
    window must see the previous state, not an empty frame). An index
    that never existed reads as an empty frame — the bootstrap case."""
    fs, _ = _hadoop_fs(spark, index_dir)
    if fs.exists(_jp(spark, f"{index_dir}/{name}")):
        return _read_index(spark, f"{index_dir}/{name}", schema)
    old = f"{index_dir}/.{name}_old"
    if fs.exists(_jp(spark, old)):
        return _read_index(spark, old, schema)
    return spark.createDataFrame([], schema)


def keepn_compact(
    spark: SparkSession,
    index_dir: str,
    name: str,
    schema: str,
    keys: Sequence[str],
    keep: int,
    collapse: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """Rewrite ``<index_dir>/<name>`` to the newest ``keep`` rows per
    ``keys`` (ordered by ``batch_id`` desc), after ``collapse``
    removes replay duplicates (default: drop bit-identical rows, so
    keep-2 keeps two DISTINCT batches). Returns
    ``{name}_before``/``{name}_after`` row counts, or {} when the
    index does not exist yet."""
    recover_index(spark, index_dir, name)
    fs, _ = _hadoop_fs(spark, index_dir)
    if not fs.exists(_jp(spark, f"{index_dir}/{name}")):
        return {}
    live = spark.read.schema(schema).parquet(f"{index_dir}/{name}")
    out = {f"{name}_before": live.count()}
    pre = collapse(live) if collapse is not None else live.dropDuplicates()
    w = Window.partitionBy(*keys).orderBy(F.col("batch_id").desc())
    folded = (
        pre.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn")
    )
    out[f"{name}_after"] = write_swap(spark, folded, index_dir, name)
    return out


def list_first_fold(
    spark: SparkSession,
    index_dir: str,
    *,
    delta_schema: str,
    base_schema: str,
    fold: Callable[[DataFrame, DataFrame], DataFrame],
    collapse: Callable[[DataFrame], DataFrame] | None = None,
    use_wm: bool = True,
    count_before: bool = False,
    base_name: str = "base",
    delta_name: str = "delta",
) -> dict:
    """Fold ``<index_dir>/<delta_name>`` part-files into
    ``<index_dir>/<base_name>`` with the list-first protocol.

    ``collapse(fresh)`` removes replay duplicates from the
    above-watermark delta rows (deterministic increments make replays
    bit-identical; typically a per-(batch_id, detail-keys) max);
    ``fold(base, fresh)`` produces the new base WITHOUT the ``wm``
    column (added here from the LISTED files' max batch_id). With
    ``use_wm=False`` the merge must be idempotent by itself (HLL max):
    no watermark is read, added, or returned.

    Returns ``{rows_after, n_files[, wm][, rows_before]}`` (callers
    may remap key names for their documented stats dict), or {} when
    there is nothing to fold.
    """
    recover_index(spark, index_dir, base_name)
    fs, _ = _hadoop_fs(spark, index_dir)
    jdelta = _jp(spark, f"{index_dir}/{delta_name}")
    if not fs.exists(jdelta):
        return {}
    files = [
        st.getPath().toString()
        for st in fs.listStatus(jdelta)
        if st.getPath().getName().startswith("part-")
    ]
    if not files:
        return {}
    delta = spark.read.schema(delta_schema).parquet(*files)
    base = _read_index(spark, f"{index_dir}/{base_name}", base_schema)
    out: dict = {"n_files": len(files)}
    if use_wm:
        wm_old = base.agg(F.coalesce(F.max("wm"), F.lit(-1))).first()[0]
        hi = (
            delta.filter(F.col("batch_id") > wm_old)
            .agg(F.max("batch_id"))
            .first()[0]
        )
        if hi is None:
            # every listed row replays an already-folded batch — reads
            # ignore them, but a stalled stream would accumulate the
            # files forever: reclaim exactly the listed files (a delta
            # appended after the listing survives for the next fold)
            for f in files:
                fs.delete(_jp(spark, f), False)
            return {}
        fresh = delta.filter(F.col("batch_id") > F.lit(int(wm_old)))
    else:
        fresh = delta
    if count_before:
        out["rows_before"] = delta.count() + base.count()
    if collapse is not None:
        fresh = collapse(fresh)
    folded = fold(base, fresh)
    if use_wm:
        folded = folded.withColumn("wm", F.lit(int(hi)).cast("long"))
        out["wm"] = int(hi)
    out["rows_after"] = write_swap(spark, folded, index_dir, base_name)
    # exactly the folded files — deltas appended mid-fold carry
    # batch_id above the new watermark and remain visible to every read
    for f in files:
        fs.delete(_jp(spark, f), False)
    return out
