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
     SPARK_GRAFT_AUDIT_SKIP=q1,q2   skip named queries (recorded in the
       summary — for queries whose ORACLE is deliberately the
       transparent quadratic formulation, e.g. text_containment's
       all-pairs form: fine at sf0.01, ~10 min at sf0.1, days at sf1)
     SPARK_GRAFT_AUDIT_START_AFTER=name   resume an interrupted run
       (alphabetical order) after `name`
     SPARK_GRAFT_AUDIT_ONLY=q1,q2   audit ONLY the named queries (the
       sf1 delta-audit path: new/body-changed queries vs the last
       round-close commit; the summary records the selection so a
       partial run can't read as full-registry-green)
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
    skip = {s for s in os.environ.get("SPARK_GRAFT_AUDIT_SKIP", "").split(",") if s}
    only = {s for s in os.environ.get("SPARK_GRAFT_AUDIT_ONLY", "").split(",") if s}
    unknown_only = sorted(only - set(QUERIES))
    assert not unknown_only, f"AUDIT_ONLY names not in registry: {unknown_only}"
    start_after = os.environ.get("SPARK_GRAFT_AUDIT_START_AFTER", "")
    compared = 0
    t_all = time.perf_counter()
    for name in sorted(QUERIES):
        if start_after and name <= start_after:
            continue
        if name in skip or (only and name not in only):
            if name in skip:
                print(f"[SKIP] {name}", flush=True)
            continue
        compared += 1
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
                # A resumed (START_AFTER) or skip-heavy run must not
                # read as full-registry-green: record the number of
                # queries ACTUALLY compared and a full flag (ADVICE r6).
                "compared": compared,
                "full": compared == len(QUERIES) - len(skip & set(QUERIES))
                and not start_after and not only,
                "only": sorted(only),
                "failed": failed,
                "inexact_cells": inexact,
                "rows_only": rows_only,
                "skipped": sorted(skip),
                "start_after": start_after,
                "wall_sec": round(time.perf_counter() - t_all, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    sys.exit(1 if failed or inexact else 0)


if __name__ == "__main__":
    main()
