"""Hub-cap lever benchmark (VERDICT r8 #4): a deterministic power-law
fixture where hub wedge products dominate, measuring
triangle_summary_capped vs triangle_summary wall-clock so the knob's
100 TB claim has a number (SCALE.md r9) instead of an argument.

The TPC-H co-purchase graph is skew-free at every SF — the cap's
trigger (indeg*outdeg > 4096) fires on ~2 nodes and the capped form
costs ~1.3x for nothing. This fixture is the graph shape the lever
exists for: a layered "celebrity" topology

  L leaves (deg 3) -> M mids (deg ~2L/M + T) -> T tops (deg M + L/T)

where degree orientation turns every mid into a wedge hub
(indeg ~2L/M from leaves, outdeg T to tops -> wedge product 2LT/M),
so the plain path join enumerates M * (2L/M) * T = 2LT wedge rows
while the hub pivot enumerates only sum over hub-in edges of the
source's out-degree = 2L * 3 rows — a T/3 reduction by construction.
Triangles exist (leaf->mid->top closed by leaf->top whenever the
mid->top edge exists, i.e. always): exactly 2 per leaf with distinct
mids, so both forms are cross-checked for the equal exact count.

Deterministic: all edges from multiplicative hashing of the leaf id —
no RNG, same graph every run.

Usage: python hubcap_bench.py [L [M [T]]] (defaults 500000 1000 500)
Prints one JSON line with both timings and the wedge-row counts.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

L = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
T = int(sys.argv[3]) if len(sys.argv) > 3 else 500
# layering requires deg(top) > deg(mid): M + L/T > 2L/M + T
assert M + L / T > 2 * L / M + T, "fixture layering violated"
MID0 = 2_000_000
TOP0 = 1_000_000
# Knuth's multiplicative hash constants — deterministic, well-mixed
H1, H2, H3 = 2654435761, 2246822519, 3266489917


def build_pairs(spark: SparkSession):
    leaves = spark.range(1, L + 1).select(F.col("id").alias("leaf"))
    m1 = (F.col("leaf") * H1) % M
    m2 = (F.col("leaf") * H2) % M
    # force the two mid edges distinct so every leaf closes 2 triangles
    m2 = F.when(m2 == m1, (m2 + 1) % M).otherwise(m2)
    t1 = (F.col("leaf") * H3) % T
    leaf_mid = leaves.select(
        F.col("leaf").alias("u"), (F.lit(MID0) + m1).alias("v")
    ).unionAll(
        leaves.select(F.col("leaf").alias("u"), (F.lit(MID0) + m2).alias("v"))
    )
    leaf_top = leaves.select(
        F.col("leaf").alias("u"), (F.lit(TOP0) + t1).alias("v")
    )
    mids = spark.range(M).select((F.lit(MID0) + F.col("id")).alias("mid"))
    tops = spark.range(T).select((F.lit(TOP0) + F.col("id")).alias("top"))
    mid_top = mids.crossJoin(tops).select(
        F.col("top").alias("u"), F.col("mid").alias("v")
    )
    return leaf_mid.unionAll(leaf_top).unionAll(mid_top).distinct()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hubcap_bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fairy_spark.operators.wedges import (
        triangle_summary,
        triangle_summary_auto,
        triangle_summary_capped,
    )

    pairs = build_pairs(spark).persist()
    n_pairs = pairs.count()

    results = {}
    rows = {}
    # capped first, then uncapped, two reps each; report the min so a
    # cold-JIT first rep doesn't mask the plan difference
    for name, fn in (
        ("capped", lambda: triangle_summary_capped(pairs, cap=4096)),
        ("uncapped", lambda: triangle_summary(pairs)),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            row = fn().collect()[0]
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        rows[name] = row.asDict()

    assert rows["capped"]["n_triangles"] == rows["uncapped"]["n_triangles"], rows

    # the auto selector (VERDICT r9 #2): exact wedge count vs the ~1e8
    # crossover; on this fixture the expected pick follows 2LT, and the
    # auto wall must track the better of the two measured forms (its
    # own wall = the picked form + the O(m) wedge agg)
    best_auto = None
    for _ in range(2):
        t0 = time.time()
        auto_row = triangle_summary_auto(pairs).collect()[0]
        dt = time.time() - t0
        best_auto = dt if best_auto is None else min(best_auto, dt)
    expected_plan = "capped" if auto_row["n_wedges"] > 100_000_000 else "plain"
    assert auto_row["plan"] == expected_plan, auto_row
    assert auto_row["n_triangles"] == rows["uncapped"]["n_triangles"], auto_row

    out = {
        "auto_sec": round(best_auto, 3),
        "auto_plan": auto_row["plan"],
        "auto_n_wedges": auto_row["n_wedges"],
        "fixture": {"L": L, "M": M, "T": T, "n_pairs": n_pairs},
        "n_triangles": rows["uncapped"]["n_triangles"],
        "n_hubs": rows["capped"]["n_hubs"],
        "uncapped_sec": results["uncapped"],
        "capped_sec": results["capped"],
        "speedup": round(results["uncapped"] / results["capped"], 2),
        "wedge_rows_uncapped": 2 * L * T,  # ~2LT through mid middles
        "wedge_rows_capped": 2 * L * 3,  # hub-in edges x source out-degree
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
