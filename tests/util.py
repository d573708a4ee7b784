"""Order-insensitive Spark↔DuckDB result comparison (mirrors the driver)."""

from __future__ import annotations


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(sdf, duck, sql):
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    drows = [tuple(r) for r in rel.fetchall()]
    scols, dcols = sdf.columns, list(rel.columns)
    assert sorted(scols) == sorted(dcols), f"schema: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount: {len(srows)} vs {len(drows)}"
    s, d = canon_rows(srows, scols), canon_rows(drows, dcols)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"row {i}: spark={a} duck={b}"
