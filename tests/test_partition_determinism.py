"""Partition-order independence, tested directly (FIXTURES.md
discipline: "no query depends on partition-order nondeterminism").

The oracle suite catches nondeterminism only if it happens to bite at
the fixture config. This sweep re-runs numerically sensitive queries
in a sibling session with a DIFFERENT shuffle-partition count and
smaller file splits — different aggregation trees, different row
arrival orders — and demands the collected results be BIT-IDENTICAL,
not merely tolerant: these queries are engineered around exact state
(integer co-sums, quantized anchors, portable hashes), so any drift is
a real partition-order leak, exactly the class of bug that appears at
1000 executors and not before.
"""

from __future__ import annotations

import pytest

# numerically sensitive surfaces: co-sum algebra, quantized means,
# window frames over doubles, corpus-statistic broadcasts, sketches
SWEEP = [
    "agg_linear_regression",
    "ts_rolling_corr",
    "agg_corr_matrix",
    "agg_stats_moments",
    "ts_zscore_anomaly",
    "text_tfidf",
    "sketch_hll",
    "agg_weighted_median",
    # r10 breadth rows: exact-integer by design; the sweep proves the
    # corpus-overlap joins and rank windows don't leak arrival order
    "stats_spearman",
    "text_winnow_fingerprint",
    "dedup_cdc_chunks",
    "ml_random_projection",
    "pipeline_source_report",
    "stats_anova_oneway",
    # r12 breadth rows: integer-exact fingerprints and a base-built
    # quantizer; the sweep proves the banded joins, the md5-digest
    # survivor min(), and the Lloyd (cluster, dim) shuffle don't leak
    # arrival order
    "ml_ann_ivf_append",
    "dedup_image_dhash",
    "dedup_audio_fingerprint",
    "dedup_lines_exact",
    "dedup_lines_incremental",
]


@pytest.mark.parametrize("name", SWEEP)
def test_result_identical_under_perturbed_partitioning(name, spark, sf_dir):
    from fairy_spark.queries import QUERIES

    base = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]

    alt = spark.newSession()
    # different agg/join fan-out AND different scan splits → different
    # partial-aggregation trees and row orders
    alt.conf.set("spark.sql.shuffle.partitions", "3")
    alt.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
    try:
        perturbed = [tuple(r) for r in QUERIES[name](alt, sf_dir).collect()]
    finally:
        # Unset BOTH perturbed confs: the newSession is throwaway, but
        # symmetric cleanup keeps the block safe under reuse (ADVICE r6).
        alt.conf.unset("spark.sql.files.maxPartitionBytes")
        alt.conf.unset("spark.sql.shuffle.partitions")

    assert len(base) > 0
    assert perturbed == base, (
        f"{name}: result depends on partitioning — first divergence: "
        f"{next((a, b) for a, b in zip(base, perturbed) if a != b) if len(base) == len(perturbed) else (len(base), len(perturbed))}"
    )
