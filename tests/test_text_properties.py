"""Pure-Python reference check of the cross-engine text primitives.

The oracle gate compares Spark to DuckDB, but both sides share the SAME
constructions (h32 = md5-prefix hash, 3-token shingles, affine MinHash
permutations) — if a primitive's definition drifted identically in both
dialects, every oracle would still match. This test pins the primitives
against an INDEPENDENT plain-Python implementation over a corpus of
edge cases (empty string, short docs, repeated tokens, consecutive
spaces = empty tokens, unicode) in one Spark job.
"""

from __future__ import annotations

import hashlib

TEXTS = [
    "",
    "one",
    "one two",
    "one two three",
    "a a a a a a",
    "x  y   z",  # consecutive spaces -> empty tokens, like split(' ')
    "héllo wörld ünïcode tokens here",
    "tab\tis one token here",
    " leading and trailing ",
    "the quick brown fox jumps over the lazy dog again and again",
    "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w0 w1 w2 w3",
]

MH_P = 2_147_483_647


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def shingles_py(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_primitives_match_pure_python_reference(spark):
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.functions.text import (
        MH_AC,
        h32,
        minhash_bands,
        shingles,
        tokens,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(tokens("text")).alias("n_tok"),
            shingles("text").alias("sh"),
            h32(F.col("text")).alias("h"),
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i]["n_tok"] == len(t.split(" ")), t
        assert got[i]["sh"] == shingles_py(t), t
        assert got[i]["h"] == h32_py(t), t

    # MinHash signatures: recompute per doc in plain Python from the
    # shingle set and check every band bucket matches
    band_rows = minhash_bands(
        df.filter(F.size(tokens("text")) >= 3)
    ).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in band_rows:
        by_doc.setdefault(r["doc_id"], {})[r["b"]] = r["band_hash"]
    for i, t in enumerate(TEXTS):
        sh = shingles_py(t)
        if len(t.split(" ")) < 3:
            assert i not in by_doc
            continue
        hs = [h32_py(s) for s in sh]
        sig = [min((a * h + c) % MH_P for h in hs) for a, c in MH_AC]
        expected = {
            b: hashlib.md5(
                ",".join(str(sig[b * 4 + r_]) for r_ in range(4)).encode()
            ).hexdigest()
            for b in range(4)
        }
        assert by_doc[i] == expected, t
