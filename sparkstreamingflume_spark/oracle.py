"""Cross-engine result comparison — the ONE implementation of the
correctness gate's semantics, shared by ``tools/validate.py`` (full
sf0.01 sweep) and ``tests/test_oracle_extras.py`` (sf0.001 pytest gate
for registry extras).

Mirrors the driver: row count + sorted-column schema + order-insensitive
value hash, where cells are TYPE-TAGGED (int / float / Decimal / bool
hash differently) and the DuckDB side is fetched through Arrow — so an
uncast ``sum(BIGINT)`` (HUGEINT → Arrow decimal128 → Decimal) mismatches
a Spark BIGINT even when the digits agree.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    return f"{type(v).__name__}:{v}"


def norm_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    """Column-name-sorted, row-sorted normalized lines (comparable sets)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for ln in norm_rows(cols, rows):
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def duck_fetch(con, sql: str) -> tuple[list[str], list[tuple]]:
    """Fetch a DuckDB result through Arrow (the driver's value path)."""
    tbl = con.execute(sql).arrow()
    cols = list(tbl.column_names)
    return cols, [tuple(d[c] for c in cols) for d in tbl.to_pylist()]


def compare(
    scols: list[str],
    srows: list[tuple],
    ocols: list[str],
    orows: list[tuple],
) -> list[str]:
    """Driver-shaped comparison; returns a list of problems (empty = pass)."""
    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rows {len(srows)} vs {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
    elif table_hash(scols, srows) != table_hash(ocols, orows):
        problems.append("value-hash mismatch")
        for a, b in zip(norm_rows(scols, srows), norm_rows(ocols, orows)):
            if a != b:
                problems.append(f"first diff: spark={a[:160]!r} duckdb={b[:160]!r}")
                break
    return problems
