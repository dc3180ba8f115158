#!/usr/bin/env python
"""Oracle-parity spot check for optimization-round edits: run the named
queries through testing.oracle.run_compare at the given SF dir.

Usage: python opt_parity.py <sf_dir> <query1> [query2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark
from fairy_spark.testing.oracle import duck_connect, run_compare


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_opt_parity",
    )
    spark = get_spark(cfg)
    con = duck_connect(sf_dir)
    bad = []
    for name in names:
        t0 = time.perf_counter()
        res = run_compare(name, spark, sf_dir, con)
        dt = time.perf_counter() - t0
        print(f"{'OK ' if res.ok else 'FAIL'} {name} ({dt:.1f}s): {res}", flush=True)
        if not res.ok:
            bad.append(name)
    print(f"SUMMARY failed={bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
