"""Text-analysis / dedup column builders shared by the extension queries.

Everything here exists in TWO lockstep dialects — a Spark ``Column``
builder and a DuckDB SQL fragment emitter — because the driver certifies
each query by running both sides and hash-comparing values. Keeping the
pair in one module prevents silent drift.

All primitives are deterministic and engine-portable:

* ``h32`` — a 32-bit integer hash derived from the first 8 hex chars of
  MD5 (both engines produce identical MD5 for identical UTF-8 input, so
  the derived integer matches bit-for-bit). Used for MinHash
  permutations, SimHash bit votes, and fingerprint sampling, replacing
  engine-local ``hash()`` functions whose seeds differ.
* token = space-split word; shingle = 3-token n-gram (the standard
  shingling unit for near-dup detection).

Scale posture: all of these are pure Catalyst expressions (split /
transform / sequence / md5 / conv) — whole-stage codegen, no Python in
the row path, no driver state. The only shuffles in the consuming
queries are the explicit groupBy/join on (shingle | band-hash | doc-id),
which is exactly the inverted-index / LSH-bucket shape that scales to
100 TB (shingle posting lists, not doc×doc pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Cross-engine 32-bit hash
# ---------------------------------------------------------------------------


def h32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """Same value in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8))::UBIGINT AS BIGINT)"


# ---------------------------------------------------------------------------
# Tokenize / shingle
# ---------------------------------------------------------------------------


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


TOKENS_SQL = "string_split({expr}, ' ')"


def shingles(text: Column | str, k: int = 3) -> Column:
    """All k-token shingles of a doc, in order (empty array if < k tokens).

    Built as a fold of ``zip_with`` over k shifted ``slice``s of the token
    array rather than ``transform(sequence(...), i -> get(arr, i+j))`` —
    the indexed-lambda form drops out of whole-stage codegen (measured 8x
    slower on the shingle explode). The ``when`` guard is required because
    a negative slice length is an error and ``sequence(0, n<0)`` would
    descend.
    """
    arr = tokens(text)
    n = F.size(arr) - (k - 1)
    out = F.slice(arr, k, n)
    for j in range(k - 2, -1, -1):
        out = F.zip_with(
            F.slice(arr, j + 1, n), out, lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(arr) >= k, out).otherwise(F.array().cast("array<string>"))


def shingles_sql(expr: str, k: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based list indexing)."""
    arr = f"string_split({expr}, ' ')"
    gram = " || ' ' || ".join(f"{arr}[i + {j}]" for j in range(k))
    return (
        f"list_transform(generate_series(1, greatest(len({arr}) - {k - 1}, 0)),"
        f" i -> {gram})"
    )


# ---------------------------------------------------------------------------
# MinHash LSH band buckets (shared by the batch dedup queries and the
# streaming incremental-dedup sink)
# ---------------------------------------------------------------------------

N_PERM = 16  # MinHash permutations
N_BANDS = 4  # LSH bands (4 rows per band)

# Affine permutation family over one base hash: h_j(s) = (a_j*h32(s)+c_j)
# mod p. One md5 per shingle instead of N_PERM — the standard
# universal-hashing MinHash construction. Constants are fixed (the DuckDB
# oracles in plans/extension_queries.py emit the same family).
MH_P = 2_147_483_647
MH_AC = [(2 * j * 40_503 + 1, j * 1_299_721 + 12_345) for j in range(N_PERM)]


def minhash_bands(d, id_col: str = "doc_id", text_col: str = "text"):
    """(id, b, band_hash) MinHash LSH band buckets for documents ``d``.

    Explode shingles ONCE, compute the N_PERM permutation hashes as flat
    columns (whole-stage codegen — nested transform() lambdas fall back
    to interpreted eval, measured 40x slower), min-aggregate into
    signatures (map-side combinable), then band into N_BANDS md5 bucket
    keys. Callers filter to docs with >= 3 tokens first (shorter docs
    have no shingles and would all collide on the empty signature).
    """
    sh = d.select(id_col, F.explode(shingles(text_col)).alias("s"))
    hashed = sh.select(id_col, h32(F.col("s")).alias("h"))
    sigs = hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + c) % MH_P).alias(f"s{j}")
            for j, (a, c) in enumerate(MH_AC)
        ]
    )
    rows_per_band = N_PERM // N_BANDS
    band_hashes = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"s{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(N_BANDS)
    ]
    return sigs.select(
        id_col, F.posexplode(F.array(*band_hashes)).alias("b", "band_hash")
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch bucket columns (shared by the batch heavy-hitters query
# q_heavy_hitters_cms, its DuckDB oracle, and the streaming sketch sink —
# one construction, so stream == batch is bit-identical by design)
# ---------------------------------------------------------------------------

CMS_D = 4  # sketch depth (independent hash rows)
CMS_W = 256  # sketch width (buckets per row)
HH_PPM = 20_000  # heavy = estimated count >= 2% of the token stream


def cms_buckets(tok: Column | str) -> Column:
    """The CMS_D bucket ids of one token: salted h32 per sketch row
    (``'cms<d>:<tok>'``), mod CMS_W — posexplode to (d, bucket) pairs."""
    c = F.col(tok) if isinstance(tok, str) else tok
    return F.array(
        *[
            h32(F.concat(F.lit(f"cms{i}:"), c)) % CMS_W
            for i in range(CMS_D)
        ]
    )


def cms_cells(tokcnt) -> "DataFrame":  # noqa: F821 - forward ref
    """(d, bucket, cnt) sketch cells from a (tok, tcnt) frame — the ONE
    cell construction both the batch query and the streaming sink call,
    so their sketches agree by construction. Hashing pre-aggregated
    distinct tokens (|vocab| * D md5s, weighted by occurrence count)
    yields cell sums bit-identical to hashing every occurrence."""
    return (
        tokcnt.select(
            "tcnt", F.posexplode(cms_buckets("tok")).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.sum("tcnt").alias("cnt"))
    )
