"""Property-fuzz of the decimal(38,0) co-sum algebra (VERDICT r5 #6).

Every correlation / regression / zscore / rolling-corr query rebuilds
SQL aggregate doubles from exact integer co-sums: quantize values to
micro-units (bigint), widen to decimal(38,0), accumulate
{n, Σx, Σy, Σxy, Σx², Σy²}, and evaluate the closed form in one IEEE
sequence (queries/analytics.py agg_linear_regression + ts_rolling_corr,
queries/aggregates.py agg_corr_matrix, queries/windows.py
ts_zscore_anomaly). The zscore overflow was caught EMPIRICALLY at
sf0.1; this fuzzer pins the headroom boundary BY CONSTRUCTION:

* the worst intermediate is a square — (Σx)² and n·Σx² both bounded by
  (n·V)² for n rows of micro-magnitude V — so the algebra is exact
  while n·V < sqrt(10^38) = 1e19, i.e. |value| < 5e11 for a 20-row
  frame. The fuzzer drives |value| to 1e11 with n ≤ 20 (n·V ≤ 2e18,
  squares ≤ 4e36 — inside headroom by construction) and demands
  bit-exact agreement with Python's arbitrary-precision integers (a
  stronger oracle than DuckDB's HUGEINT, itself only 128-bit) and with
  DuckDB's HUGEINT evaluation of the identical SQL.
* a deterministic twin straddles the edge: |value| = 4e11 (n·V = 8e18,
  squares 6.4e37 < 10^38) must stay exact; |value| = 6e11
  (n·V = 1.2e19, squares 1.44e38) must fail LOUDLY — Spark 4 ANSI
  decimal overflow raises (or yields NULL with ANSI off) — never a
  silently wrong number.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

# micro-quantized magnitude cap 1e17 (value 1e11) with n ≤ 20 keeps
# every intermediate ≤ 4e36 — inside decimal(38,0) by construction
_vals = st.floats(
    min_value=-1.0e11,
    max_value=1.0e11,
    allow_nan=False,
    allow_infinity=False,
    width=64,
)
_pairs = st.lists(st.tuples(_vals, _vals), min_size=2, max_size=20)


def _q6(v: float) -> int:
    # identical IEEE sequence to F.floor(col * 1000000 + 0.5): one
    # double multiply, one double add, floor — then exact int
    return math.floor(v * 1000000.0 + 0.5)


def _spark_cosums(spark, pairs):
    df = spark.createDataFrame(pairs, "x double, y double")
    xd = F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("bigint").cast(_DEC)
    yd = F.floor(F.col("y") * 1000000 + F.lit(0.5)).cast("bigint").cast(_DEC)
    row = (
        df.select(xd.alias("xd"), yd.alias("yd"))
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("n"),
            F.sum("xd").alias("sx"),
            F.sum("yd").alias("sy"),
            F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
            F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
            F.sum(F.col("yd") * F.col("yd")).alias("syy"),
        )
        .select(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_n"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("var_x"),
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("var_y"),
            "sx",
            "sy",
            "sxy",
            "sxx",
            "syy",
        )
        .first()
    )
    return {k: (None if row[k] is None else int(row[k])) for k in row.asDict()}


def _python_cosums(pairs):
    xs = [_q6(x) for x, _ in pairs]
    ys = [_q6(y) for _, y in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    return {
        "cov_n": n * sxy - sx * sy,
        "var_x": n * sxx - sx * sx,
        "var_y": n * syy - sy * sy,
        "sx": sx,
        "sy": sy,
        "sxy": sxy,
        "sxx": sxx,
        "syy": syy,
    }


@settings(max_examples=12, deadline=None)
@given(pairs=_pairs)
def test_cosum_algebra_exact_inside_headroom(spark, pairs):
    got = _spark_cosums(spark, pairs)
    want = _python_cosums(pairs)
    assert got == want, f"decimal co-sums diverged from exact ints: {got} != {want}"

    # DuckDB agreement — with one measured caveat this fuzzer itself
    # surfaced: DuckDB auto-widens SUM(BIGINT) to HUGEINT but NOT the
    # product xd * xd, which overflows INT64 (loudly: OutOfRange) as
    # soon as |x6| > sqrt(2^63) ≈ 3.04e9, i.e. |value| > ~3037. The
    # registry oracles (ts_rolling_corr etc.) are safe at testdata
    # magnitudes and would FAIL LOUD, never silently wrong, past it;
    # to compare at the engine's full 5e11 headroom the fuzz oracle
    # widens the products to HUGEINT explicitly.
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (x DOUBLE, y DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", [list(p) for p in pairs])
        (dd,) = con.execute(
            """
            WITH q AS (
              SELECT CAST(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) AS HUGEINT) AS xd,
                     CAST(CAST(FLOOR(y * 1000000 + 0.5) AS BIGINT) AS HUGEINT) AS yd
              FROM t
            ), s AS (
              SELECT COUNT(*) AS n, SUM(xd) AS sx, SUM(yd) AS sy,
                     SUM(xd * yd) AS sxy, SUM(xd * xd) AS sxx,
                     SUM(yd * yd) AS syy
              FROM q
            )
            SELECT [CAST(n * sxy - sx * sy AS VARCHAR),
                    CAST(n * sxx - sx * sx AS VARCHAR),
                    CAST(n * syy - sy * sy AS VARCHAR)]
            FROM s
            """
        ).fetchone()
    finally:
        con.close()
    assert [int(v) for v in dd] == [want["cov_n"], want["var_x"], want["var_y"]]


def test_cosum_headroom_boundary_is_loud(spark):
    """Straddle the documented edge with n=20 constant-magnitude rows:
    |value|=4e11 (squares 6.4e37) stays exact; |value|=6e11 (squares
    1.44e38 > 10^38) must raise (ANSI) or go NULL (non-ANSI) — never
    return a silently wrong number."""
    inside = [(4.0e11, -4.0e11)] * 20
    got = _spark_cosums(spark, inside)
    assert got == _python_cosums(inside)
    # sanity: the n·Σx² intermediate really is within one decade of
    # the cap (var_x itself is exactly 0 for a constant column — the
    # subtraction of two 6.4e37 intermediates coming out exact IS the
    # point)
    assert 1e37 < 20 * got["sxx"] < 10**38

    outside = [(6.0e11, 6.0e11)] * 20
    want = _python_cosums(outside)
    assert want["sxx"] * 20 > 10**38  # past the cap by construction
    try:
        over = _spark_cosums(spark, outside)
    except Exception:
        return  # ANSI overflow raised — the loud failure we want
    for k in ("cov_n", "var_x", "var_y"):
        assert over[k] is None or over[k] == want[k], (
            f"silent wrong value past headroom: {k}={over[k]} != {want[k]}"
        )
