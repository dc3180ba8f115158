#!/usr/bin/env python
"""One-shot sf0.1 → sf1 growth measurement (VERDICT r5 #7).

SCALE.md measures the dedup paths' growth on synthetic corpora; the
RELATIONAL headline queries had no measured growth curve. This script
builds a 10× replica of the sf0.1 testdata (≈6 M lineitem — TPC-H sf1
scale) under /tmp and times the non-dedup headline queries at both
scales, printing per-query growth factors (paste target:
BASELINE.md §4).

Replication is Spark-native and deterministic — each table cross-joins
a broadcast 10-row replica frame and shifts its key columns by
replica × (max_key+1), so referential integrity (orders↔lineitem↔
part/supplier, orders↔customer, events user spaces) holds exactly and
group cardinalities grow the way a bigger TPC-H SF grows them.
region/nation stay fixed (TPC-H constants). The two dedup headlines
are EXCLUDED by design: exact-copy replicas would fabricate a
quadratic near-dup structure no real corpus has, and their growth is
already measured properly in SCALE.md on bounded-duplication synth
corpora. sim_cosine_topk IS included — its query side is pinned
(vec_id <= 10), so replica-duplicate vectors change tie ordering only,
not cost shape.

Not part of bench.py's driver contract — run ad hoc:
  python sf1_bench.py
Env: SPARK_GRAFT_SF1_DIR=/tmp/fairy_sf1  SPARK_GRAFT_CPUS=32
     SPARK_GRAFT_SF1_REPS=3  SPARK_GRAFT_SF1_SKIP_BUILD=1 (reuse dir)
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark
from fairy_spark.sources.tables import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/fairy_sf1")
REPLICAS = 10

# key spaces: name -> (owner table, key column); offset = max+1 over
# the BASE table so replica key ranges never collide
_KEYSPACES = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events_id": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

_SHIFTS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "events": {"event_id": "events_id", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# non-dedup headline queries (bench.py HEADLINE minus the two dedup
# rows, whose growth SCALE.md measures on honest corpora)
QUERIES_UNDER_TEST = [
    "q1_pricing_summary",
    "join_3way_revenue",
    "join_asof",
    "agg_rollup",
    "win_topk_per_group",
    "set_union_distinct",
    "fn_string",
    "kv_prefix_scan",
    "stream_tumbling_batch",
    "sim_cosine_topk",
]


def _keyspace_offsets(spark) -> dict[str, int]:
    out: dict[str, int] = {}
    for name, (table, col) in _KEYSPACES.items():
        df = load_table(spark, SRC, table)
        out[name] = int(df.agg(F.max(col)).first()[0]) + 1
    return out


def build_sf1(spark) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    offs = _keyspace_offsets(spark)
    print(json.dumps({"stage": "keyspaces", "offsets": offs}), flush=True)
    repl = F.broadcast(spark.range(REPLICAS).withColumnRenamed("id", "__repl"))
    for table, shifts in _SHIFTS.items():
        df = load_table(spark, SRC, table)
        if table == "documents":
            # Exact-copy replicas would hand every doc 9 perfect
            # duplicates — a 10-clique near-dup structure no real
            # corpus has, which blows the dedup queries (and their
            # transitive-closure oracles) combinatorially. Synthesize
            # an HONEST 10× corpus instead: same schema, bounded
            # duplication (fairy_spark/testing/synth.py — the SCALE.md
            # generator), so the dedup family stays auditable at sf1.
            from fairy_spark.testing.synth import synth_documents

            n = df.count() * REPLICAS
            rep = synth_documents(spark, n)
        elif shifts:
            rep = df.crossJoin(repl)
            for col, space in shifts.items():
                rep = rep.withColumn(
                    col, F.col(col) + F.col("__repl") * F.lit(offs[space])
                )
            rep = rep.drop("__repl")
        else:
            rep = df  # region/nation: TPC-H constants, fixed size
        t0 = time.perf_counter()
        rep.write.mode("overwrite").parquet(os.path.join(DST, f"{table}.parquet"))
        print(
            json.dumps(
                {
                    "stage": "build",
                    "table": table,
                    "rows": rep.count(),
                    "sec": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    reps = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "3"))
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_sf1_bench",
    )
    spark = get_spark(cfg)

    from fairy_spark.queries import QUERIES

    if not (os.environ.get("SPARK_GRAFT_SF1_SKIP_BUILD") and os.path.isdir(DST)):
        build_sf1(spark)

    dirs = {"sf0.1": SRC, "sf1": DST}
    # warm-up pass at both scales (JIT + page cache), not timed
    for d in dirs.values():
        for name in QUERIES_UNDER_TEST:
            QUERIES[name](spark, d).count()

    samples: dict[tuple[str, str], list[float]] = {}
    for _ in range(reps):
        for scale, d in dirs.items():
            for name in QUERIES_UNDER_TEST:
                gc.collect()
                t0 = time.perf_counter()
                QUERIES[name](spark, d).count()
                samples.setdefault((name, scale), []).append(
                    time.perf_counter() - t0
                )

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    rows = []
    for name in QUERIES_UNDER_TEST:
        a = med(samples[(name, "sf0.1")])
        b = med(samples[(name, "sf1")])
        rows.append((name, round(a, 3), round(b, 3), round(b / a, 2)))

    print(
        json.dumps(
            {
                "metric": "sf1_growth",
                "reps": reps,
                "cpus": int(cpus),
                "rows": [
                    {"query": n, "sf0.1_sec": a, "sf1_sec": b, "growth": g}
                    for n, a, b, g in rows
                ],
            }
        ),
        flush=True,
    )
    print("\n| query | sf0.1 s | sf1 s | growth (10× data) |")
    print("|---|---|---|---|")
    for n, a, b, g in rows:
        print(f"| {n} | {a} | {b} | {g}× |")
    spark.stop()


if __name__ == "__main__":
    main()
