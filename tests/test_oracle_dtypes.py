"""Dtype-strictness gate for the oracle harness (round-7 verdict item 2).

The round-6 driver red (q12 / events_tier_at_time) was DuckDB promoting
integer SUMs to HUGEINT while the local checker coerced every integer
dtype to Int64 before comparing — so the local gate could never see what
the driver's hasher saw. These tests pin the strict check: a
deliberately-injected ``SUM(1)`` oracle must trip it, the allowed
mapping must accept the legitimate pairings, and every declared oracle
must DESCRIBE clean against its Spark schema.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_oracle import describe_oracle, dtype_problems


@pytest.fixture(scope="module")
def conn():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT range AS i, range * 1.5 AS x FROM range(10)")
    return c


def test_injected_sum1_oracle_trips_the_gate(conn):
    # DuckDB: SUM over INTEGER/BIGINT -> HUGEINT. The driver hashes
    # HUGEINT differently from Spark's bigint; this must FAIL locally.
    duck_types = describe_oracle(conn, "SELECT SUM(1) AS n FROM t")
    assert duck_types[0][1].upper() == "HUGEINT"
    probs = dtype_problems([("n", "bigint")], duck_types)
    assert probs and "HUGEINT" in probs[0]


def test_cast_bigint_passes(conn):
    duck_types = describe_oracle(conn, "SELECT CAST(SUM(1) AS BIGINT) AS n FROM t")
    assert dtype_problems([("n", "bigint")], duck_types) == []


def test_unexpected_decimal_trips(conn):
    duck_types = describe_oracle(
        conn, "SELECT CAST(SUM(i) AS DECIMAL(20, 2)) AS n FROM t"
    )
    probs = dtype_problems([("n", "bigint")], duck_types)
    assert probs and "DECIMAL" in probs[0]


def test_decimal_vs_decimal_allowed(conn):
    duck_types = describe_oracle(
        conn, "SELECT CAST(SUM(i) AS DECIMAL(20, 2)) AS n FROM t"
    )
    assert dtype_problems([("n", "decimal(20,2)")], duck_types) == []


def test_float_vs_bigint_trips(conn):
    duck_types = describe_oracle(conn, "SELECT AVG(i) AS n FROM t")  # DOUBLE
    probs = dtype_problems([("n", "bigint")], duck_types)
    assert probs


def test_legit_pairings_pass(conn):
    duck_types = describe_oracle(
        conn,
        "SELECT CAST(i AS BIGINT) AS a, CAST(x AS DOUBLE) AS b, "
        "CAST(i AS VARCHAR) AS c, i > 3 AS d, "
        "DATE '2024-01-01' AS e, TIMESTAMP '2024-01-01' AS f, [i, i] AS g "
        "FROM t",
    )
    spark_dtypes = [
        ("a", "bigint"),
        ("b", "double"),
        ("c", "string"),
        ("d", "boolean"),
        ("e", "date"),
        ("f", "timestamp"),
        ("g", "array<bigint>"),
    ]
    assert dtype_problems(spark_dtypes, duck_types) == []


def test_count_star_is_bigint_not_hugeint(conn):
    # COUNT(*) stays BIGINT in DuckDB — the gate must not false-alarm
    # on the most common aggregate in the inventory.
    duck_types = describe_oracle(conn, "SELECT COUNT(*) AS n FROM t")
    assert dtype_problems([("n", "bigint")], duck_types) == []


def test_all_declared_oracles_describe_hugeint_free():
    """Every oracle in the inventory, DESCRIBEd against the sf0.001
    fixture schema: no HUGEINT/UHUGEINT/unexpected-DECIMAL anywhere.
    Schema-only (DESCRIBE scans nothing), so this is cheap enough for
    the default suite; the Spark side of the mapping is covered by the
    full ``--types-only`` audit run per round."""
    import __spark_entry__ as entry
    from tools.check_oracle import duckdb_conn

    c = duckdb_conn("/root/testdata/sf0.001")
    bad = []
    for name, sql in entry.oracle_sql().items():
        for col, dtype in describe_oracle(c, sql):
            base = dtype.upper().split("(")[0].strip()
            if base in ("HUGEINT", "UHUGEINT"):
                bad.append(f"{name}.{col}: {dtype}")
    assert not bad, bad
