#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

For each named query: capture .explain("formatted") to
$OPT_PLANS_DIR/<name>_<tag>.txt (default plans/r15), then time N reps
of a noop-sink write
(guide §1.4 — forces every column of every row, no sink cost) and
print one JSON line per query with median/min/max plus plan-shape
counters (Exchange count, join strategies, Python-eval nodes).

Usage: python opt_measure.py <tag> <query1> [query2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       OPT_REPS           (default 3)
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("OPT_REPS", "3"))
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_opt_measure",
    )
    spark = get_spark(cfg)
    from fairy_spark.queries import QUERIES
    from fairy_spark.operators.dedup import clear_signature_cache

    plans_dir = os.environ.get("OPT_PLANS_DIR", "plans/r15")
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up: JVM/codegen on the smallest SF
    warm = "/root/testdata/sf0.001"
    for name in names:
        QUERIES[name](spark, warm if os.path.isdir(warm) else sf_dir).count()

    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{plans_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        shape = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "python_eval": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
            ),
            "map_in_pandas": len(re.findall(r"MapInPandas|MapInArrow", plan)),
            "scans": len(re.findall(r"Scan parquet", plan)),
        }
        ts: list[float] = []
        for _ in range(reps):
            gc.collect()
            clear_signature_cache(spark)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        ts_sorted = sorted(ts)
        med = ts_sorted[len(ts) // 2] if reps % 2 else (
            ts_sorted[reps // 2 - 1] + ts_sorted[reps // 2]
        ) / 2
        print(
            json.dumps(
                {
                    "query": name,
                    "tag": tag,
                    "median_sec": round(med, 3),
                    "reps": ts,
                    "shape": shape,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
