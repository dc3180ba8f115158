#!/usr/bin/env python
"""Full-registry oracle audit at an arbitrary SF (default sf0.1).

The pytest gate runs every registered query against its DuckDB oracle
at sf0.01; the driver's external gate covers ~50 queries per round at
sf0.01. This script runs ALL registered queries against their oracles
at a LARGER scale — the audit that caught the r5 interp knife-edge and
the zscore decimal overflow, both invisible at sf0.01 — and prints one
line per query plus a JSON summary.

Run ad hoc (takes tens of minutes at sf0.1 on local[32]):
  python registry_audit.py [sf_dir]
Env: SPARK_GRAFT_CPUS=32
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark
from fairy_spark.testing.oracle import duck_connect, run_compare


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_registry_audit",
    )
    spark = get_spark(cfg)
    from fairy_spark.queries import ORACLE, QUERIES

    con = duck_connect(sf_dir)
    failed: list[str] = []
    inexact: list[str] = []
    rows_only = sorted(set(QUERIES) - set(ORACLE))
    t_all = time.perf_counter()
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            res = run_compare(name, spark, sf_dir, con)
        except Exception as e:  # noqa: BLE001 — audit must survive one bad query
            failed.append(name)
            print(f"[ERR] {name}: {type(e).__name__}: {e}", flush=True)
            continue
        status = str(res)
        if not res.ok:
            failed.append(name)
        elif res.inexact_cells:
            inexact.append(name)
        print(f"{status}  ({time.perf_counter() - t0:.1f}s)", flush=True)
    print(
        json.dumps(
            {
                "metric": "registry_audit",
                "sf_dir": sf_dir,
                "queries": len(QUERIES),
                "failed": failed,
                "inexact_cells": inexact,
                "rows_only": rows_only,
                "wall_sec": round(time.perf_counter() - t_all, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    sys.exit(1 if failed or inexact else 0)


if __name__ == "__main__":
    main()
