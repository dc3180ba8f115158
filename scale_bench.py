#!/usr/bin/env python
"""Empirical scale-growth measurement for the dedup paths (VERDICT r4 #1).

Synthesizes bounded-duplication corpora at 1x / 4x / 16x the sf0.1
documents row count (5 000 / 20 000 / 80 000 rows, fixed seed — see
fairy_spark/testing/synth.py) and measures, per scale:

  * minhash band_rows=1  — the sf0.1 query setting: candidate pairs,
    cold (index build + query) and warm (query only) seconds;
  * minhash band_rows=2  — SCALE.md's documented large-scale setting
    (collision prob J^2 per band suppresses random collisions);
  * ngram-Jaccard blocked+banded — the dedup_ngram_jaccard shape:
    pair join keyed by (source, len_bucket, band_id, band_hash);
  * true near-dup pairs (exact Jaccard >= 0.35 among candidates) — the
    linear "signal" the candidate sets are supposed to bound.

Prints one JSON line per (scale, variant) and a final markdown table
(paste target: SCALE.md §empirical growth). Not part of bench.py's
driver contract — run ad hoc:  python scale_bench.py
Env: SPARK_GRAFT_SCALE_SIZES=5000,20000,80000  SPARK_GRAFT_CPUS=32
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from fairy_spark.config import EngineConfig
from fairy_spark.operators.dedup import clear_signature_cache, minhash_lsh_candidates
from fairy_spark.session import get_spark
from fairy_spark.testing.synth import synth_documents

WORK_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/fairy_scale")


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_SCALE_SIZES", "5000,20000,80000").split(",")
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_scale_bench",
    )
    spark = get_spark(cfg)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in sizes:
        path = os.path.join(WORK_DIR, f"docs_{n}")
        if not os.path.isdir(path):
            synth_documents(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)

        variants = {
            "minhash_b1": dict(num_hashes=8, band_rows=1, block_cols=None),
            "minhash_b2": dict(num_hashes=8, band_rows=2, block_cols=None),
            # recall-recovery check for the tuning rule: more bands at
            # the same 2-row geometry (8 bands of 2 vs 4 of 2)
            "minhash_b2_h16": dict(num_hashes=16, band_rows=2, block_cols=None),
            "ngram_blocked": dict(num_hashes=8, band_rows=1, block_cols=["source", "len_bucket"]),
        }
        for vname, v in variants.items():
            d = docs
            if v["block_cols"]:
                d = docs.withColumn("len_bucket", F.expr("n_chars div 50"))
            key = f"{path}:{vname}"

            def run():
                return minhash_lsh_candidates(
                    d,
                    shingle_n=3,
                    num_hashes=v["num_hashes"],
                    band_rows=v["band_rows"],
                    cache_key=key,
                    block_cols=v["block_cols"],
                )

            clear_signature_cache(spark)
            t0 = time.perf_counter()
            pairs = run().count()
            cold_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            run().count()
            warm_s = time.perf_counter() - t0
            true_dups = run().filter(F.col("jaccard") >= 0.35).count()
            clear_signature_cache(spark)

            rec = {
                "n_docs": n,
                "variant": vname,
                "candidate_pairs": pairs,
                "pairs_per_doc": round(pairs / n, 3),
                "true_dup_pairs_j35": true_dups,
                "cold_build_query_sec": round(cold_s, 2),
                "warm_query_sec": round(warm_s, 2),
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n| variant | n_docs | cand. pairs | pairs/doc | true pairs (J>=.35) | cold s | warm s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['variant']} | {r['n_docs']} | {r['candidate_pairs']} "
            f"| {r['pairs_per_doc']} | {r['true_dup_pairs_j35']} "
            f"| {r['cold_build_query_sec']} | {r['warm_query_sec']} |"
        )
    spark.stop()


if __name__ == "__main__":
    if "--clean" in sys.argv:
        shutil.rmtree(WORK_DIR, ignore_errors=True)
    main()
