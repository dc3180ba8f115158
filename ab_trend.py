#!/usr/bin/env python
"""One-shot A/B timer for the non-headline bench trend fields.

VERDICT r13 #3: the r13 driver window read pipeline declarative
46.0->53.4 s, staged 19.2->23.1 s, winnow 31.0->35.5 s, wedges +5-19%
vs the r12 clean run, in a window with loadavg 5.19 at start. No r13
commit touches those code paths, so the hypothesis is window noise
(the r9 lockstep signature). This script times EXACTLY those fields in
the tree it is launched from (sys.argv[1] = tree root) and prints one
JSON line; the caller alternates trees in one idle window.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

tree = sys.argv[1]
sys.path.insert(0, tree)

from fairy_spark.config import EngineConfig  # noqa: E402
from fairy_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                   app_name="fairy_spark_ab_trend")
spark = get_spark(cfg)
from fairy_spark.queries import QUERIES  # noqa: E402

# JVM warm-up action (same protocol as bench.py)
QUERIES["q1_pricing_summary"](spark, sf_dir).count()

out: dict[str, float] = {}
for name in (
    "pipeline_pretrain_corpus",
    "pipeline_pretrain_corpus_staged",
    "pipeline_pretrain_corpus_staged_scale",
    "dedup_winnow_pairs",
    "graph_triangles",
    "graph_triangles_capped",
    "graph_triangles_auto",
):
    gc.collect()
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()
    out[name] = round(time.perf_counter() - t0, 3)

la1, la5, _ = os.getloadavg()
print(json.dumps({"tree": tree, "loadavg": [round(la1, 2), round(la5, 2)],
                  "secs": out}), flush=True)
spark.stop()
