"""q_dedup_incremental / q_lm_score internal-consistency pins.

The driver/pytest oracle certifies both queries value-for-value against
DuckDB; these tests pin the SEMANTICS against independently-computed
ground truth (raw-text equality joins, per-doc token recounts), so an
oracle that drifted in lockstep with the query could not hide a broken
flag definition.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def test_incremental_exact_flags_match_text_equality(spark):
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.functions.text import h32
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import INC_BASE_PCT
    from sparkstreamingflume_spark.session import load_table

    out = {
        r["doc_id"]: r for r in REGISTRY["q_dedup_incremental"].build(spark, SF).collect()
    }
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    is_base = (
        h32(F.concat(F.lit("inc"), F.col("doc_id").cast("string"))) % 100
        < INC_BASE_PCT
    )
    split = corpus.select("doc_id", "text", is_base.alias("is_base"))
    base_texts = {r["text"] for r in split.filter("is_base").select("text").collect()}
    inc_rows = split.filter(~F.col("is_base")).collect()

    # every incoming doc appears exactly once in the output
    assert set(out) == {r["doc_id"] for r in inc_rows}
    for r in inc_rows:
        got = out[r["doc_id"]]
        # ground truth for exact_dup is raw-text membership in the base
        assert got["exact_dup"] == int(r["text"] in base_texts), r["doc_id"]
        # identical text => identical shingles => identical MinHash bands,
        # so exact duplicates with >= 3 tokens must also be near-dups
        if got["exact_dup"] and len(r["text"].split(" ")) >= 3:
            assert got["near_dup"] == 1, r["doc_id"]
        assert got["keep"] == int(not (got["exact_dup"] or got["near_dup"]))

    # the fixture scenario is non-trivial: dups exist and survivors exist
    assert any(r["exact_dup"] for r in out.values())
    assert any(r["keep"] for r in out.values())


def test_lm_score_semantics(spark):
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import LM_MIN_MEAN_PPM
    from sparkstreamingflume_spark.session import load_table

    rows = REGISTRY["q_lm_score"].build(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    n_tok = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert {r["doc_id"] for r in rows} == set(n_tok)
    for r in rows:
        assert r["n_tok"] == n_tok[r["doc_id"]]
        assert 0 < r["rare_ppm"] <= r["mean_ppm"] <= 1_000_000
        assert r["keep"] == int(r["mean_ppm"] >= LM_MIN_MEAN_PPM)
    # threshold sits inside the fixture distribution: the gate both keeps
    # and drops something
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
