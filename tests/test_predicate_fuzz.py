"""Predicate fuzzer: hypothesis draws random filter predicates over
lineitem; the same predicate compiled to a Spark filter and to DuckDB
SQL must select the same rows (compared as count + key-sum — a cheap
content hash). Catches comparison/null/boolean-algebra semantic drift
anywhere in scan → pushdown → filter."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fairy_spark.sources.tables import load_table, table_path

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "!="]

num_pred = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.floats(min_value=0.0, max_value=60.0, allow_nan=False, width=16),
)
str_pred = st.tuples(
    st.sampled_from(STR_COLS),
    st.sampled_from(["=", "!="]),
    st.sampled_from(["A", "N", "R", "O", "F", "Z"]),
)
leaf = st.one_of(num_pred, str_pred)
conj = st.sampled_from(["AND", "OR"])
predicate = st.lists(st.tuples(leaf, conj), min_size=1, max_size=4)


def to_sql(pred):
    # left-associative parenthesization to mirror to_spark's fold
    # (bare SQL would give AND precedence over OR)
    sql = None
    pending = None
    for (col, op, val), joiner in pred:
        lit = f"'{val}'" if isinstance(val, str) else repr(float(val))
        op_sql = "<>" if op == "!=" else op
        part = f"({col} {op_sql} {lit})"
        sql = part if sql is None else f"(({sql}) {pending} {part})"
        pending = joiner
    return sql


def to_spark(pred):
    import operator

    opmap = {"<": operator.lt, "<=": operator.le, ">": operator.gt,
             ">=": operator.ge, "=": operator.eq, "!=": operator.ne}
    expr = None
    pending = None
    for (col, op, val), joiner in pred:
        c = opmap[op](F.col(col), F.lit(val))
        if expr is None:
            expr = c
        elif pending == "AND":
            expr = expr & c
        else:
            expr = expr | c
        pending = joiner
    return expr


@settings(max_examples=25, deadline=None)
@given(predicate)
def test_random_predicates_agree(spark, sf_dir, pred):
    li = load_table(spark, sf_dir, "lineitem")
    got = (
        li.filter(to_spark(pred))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("l_orderkey") + F.col("l_linenumber")), F.lit(0)).alias("ks"),
        )
        .first()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(sf_dir, 'lineitem')}')"
    )
    n, ks = con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(l_orderkey + l_linenumber), 0) FROM lineitem WHERE {to_sql(pred)}"
    ).fetchone()
    con.close()
    assert (got["n"], got["ks"]) == (n, ks), to_sql(pred)
