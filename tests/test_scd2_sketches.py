"""SCD2 history-integrity and sketch-mergeability properties — the
invariants that make these ops safe to run incrementally/distributed:
a version chain must stay contiguous across successive batches, and a
sketch must give the SAME answer whether built in one pass or merged
from partial builds (that equivalence IS the 100 TB contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.operators.merge import scd2_apply
from fairy_spark.operators.text import portable_hash64


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seg string, valid_from timestamp"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k bigint, seg string, eff timestamp")


import datetime as _dt

T0 = _dt.datetime(2024, 1, 1)
T1 = _dt.datetime(2024, 6, 1)
T2 = _dt.datetime(2024, 9, 1)


def test_scd2_two_batches_build_contiguous_history(spark):
    """Apply two successive batches; per key: exactly one open
    (is_current) row, closed rows chain valid_from < valid_to, and a
    re-changed key carries three versions with touching boundaries."""
    cur = _dim(spark, [(1, "A", T0), (2, "B", T0), (3, "C", T0)])
    b1 = _upd(spark, [(1, "A2", T1), (2, "B", T1), (4, "D", T1)])
    out1 = scd2_apply(cur, b1, "k", "eff", ["seg"])
    # Second batch applies to the CURRENT rows of out1.
    cur2 = out1.filter("is_current").select("k", "seg", "valid_from")
    b2 = _upd(spark, [(1, "A3", T2)])
    out2 = scd2_apply(cur2, b2, "k", "eff", ["seg"]).unionByName(
        out1.filter("NOT is_current")
    )
    rows = sorted(
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out2.collect()
    )
    hist = {}
    for k, seg, vf, vt, cur_flag in rows:
        hist.setdefault(k, []).append((vf, vt, seg, cur_flag))
    # key 1: A(T0..T1) -> A2(T1..T2) -> A3(T2..open)
    assert [h[:2] for h in hist[1]] == [(T0, T1), (T1, T2), (T2, None)]
    assert [h[2] for h in hist[1]] == ["A", "A2", "A3"]
    assert [h[3] for h in hist[1]] == [False, False, True]
    # key 2: unchanged update -> single open version, no churn
    assert hist[2] == [(T0, None, "B", True)]
    # key 3: untouched passthrough
    assert hist[3] == [(T0, None, "C", True)]
    # key 4: new key opens at T1
    assert hist[4] == [(T1, None, "D", True)]
    # global: exactly one current row per key
    cur_counts = (
        out2.filter("is_current").groupBy("k").count().filter("count != 1").count()
    )
    assert cur_counts == 0


def test_scd2_null_safe_change_detection(spark):
    """NULL attr == NULL attr must read as UNCHANGED (no churn
    version); NULL -> value and value -> NULL are real changes."""
    cur = _dim(spark, [(1, None, T0), (2, None, T0), (3, "X", T0)])
    b = _upd(spark, [(1, None, T1), (2, "Y", T1), (3, None, T1)])
    out = scd2_apply(cur, b, "k", "eff", ["seg"])
    per_key = {}
    for r in out.collect():
        per_key.setdefault(r["k"], []).append(r)
    assert len(per_key[1]) == 1 and per_key[1][0]["is_current"]  # no churn
    assert len(per_key[2]) == 2 and len(per_key[3]) == 2  # real changes


def _cms_registers(df, w=256, d=4):
    """(row, bucket) -> count sketch of df.tok, as a dict."""
    rows = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"),
                            (
                                portable_hash64(F.col("tok"), seed=f"cms{i}") % w
                            ).alias("bucket"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("rb")
        )
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {(r["row"], r["bucket"]): r["c"] for r in rows}


def test_countmin_partial_sketches_merge_by_addition(spark):
    """CMS(all) == CMS(half1) + CMS(half2) cell-by-cell — the property
    that lets every executor sketch its partition independently."""
    toks = spark.createDataFrame(
        [(f"tok{i % 17}",) for i in range(300)], "tok string"
    )
    whole = _cms_registers(toks)
    h1 = _cms_registers(toks.limit(150))
    # limit() order is plan-dependent in general; use a deterministic split
    a = toks.filter(F.length("tok") % 2 == 0)
    b = toks.filter(F.length("tok") % 2 != 0)
    sa, sb = _cms_registers(a), _cms_registers(b)
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole
    assert sum(h1.values()) == 150 * 4


def test_hll_partial_registers_merge_by_max(spark):
    """HLL registers(all) == max-merge of registers(half1),
    registers(half2) — executor-local register banks merge losslessly."""
    vals = spark.createDataFrame([(i,) for i in range(500)], "v bigint")

    def regs(df):
        hv = portable_hash64(F.col("v").cast("string"), seed="hll")
        h2 = F.expr("hv DIV 64")
        rb = df.select(hv.alias("hv")).select(
            (F.col("hv") % 64).alias("bucket"),
            F.when(h2 > 0, F.lit(55) - F.length(F.bin(h2))).otherwise(55).alias("rho"),
        )
        return {
            r["bucket"]: r["m"]
            for r in rb.groupBy("bucket").agg(F.max("rho").alias("m")).collect()
        }

    whole = regs(vals)
    a = regs(vals.filter("v % 2 = 0"))
    b = regs(vals.filter("v % 2 = 1"))
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_scd2_duplicate_and_null_update_keys_enforced(spark):
    """Duplicate update keys collapse to the latest-effective winner
    (no fan-out, no double 'current' rows); NULL-key update rows are
    dropped rather than becoming phantom inserts."""
    cur = _dim(spark, [(1, "A", T0)])
    b = _upd(
        spark,
        [(1, "A2", T1), (1, "A3", T2), (None, "ghost", T1)],
    )
    out = scd2_apply(cur, b, "k", "eff", ["seg"])
    rows = sorted(
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    # winner is the T2 update; no ghost row for the NULL key
    assert rows == [
        (1, "A", T0, T2, False),
        (1, "A3", T2, None, True),
    ]
