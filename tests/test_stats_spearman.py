"""Independent cross-check for stats_spearman: pandas' own
average-rank machinery + numpy Pearson over the same parquet data
must agree with the engine's integer-rank/co-sum formulation to the
query's 6-decimal round — a third implementation besides the Spark
query and its DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fairy_spark.queries import QUERIES


def test_spearman_matches_pandas_average_ranks(spark, sf_dir):
    got = {
        r["nationkey"]: (r["n"], r["spearman_rs"])
        for r in QUERIES["stats_spearman"](spark, sf_dir).collect()
    }

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    spend = (
        (orders.assign(c=(orders.o_totalprice * 100).round(0).astype("int64")))
        .groupby("o_custkey")["c"].sum()
    )
    j = cust.assign(y=cust.c_custkey.map(spend).fillna(0).astype("int64"))
    for nk, g in j.groupby("c_nationkey"):
        rx = g.c_acctbal.rank(method="average").to_numpy()
        ry = g.y.rank(method="average").to_numpy()
        n, rs = got[nk]
        assert n == len(g)
        if np.std(rx) == 0 or np.std(ry) == 0:
            assert rs == 0.0
        else:
            expect = float(np.corrcoef(rx, ry)[0, 1])
            assert abs(rs - expect) < 2e-6, (nk, rs, expect)
