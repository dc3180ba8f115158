"""Skew-aware join: salting (SURVEY.md §4.2; brief: 'skewed keys → salting
or AQE skew-join').

AQE's skew-join split handles most skew at runtime, but it only splits
SORT-MERGE join partitions — a hash-partitioned aggregation or a
shuffle-hash join over a power-law key (one user emits 10% of all
events) still lands one monster task. Salting is the static fix: widen
the hot key space by a salt factor on the big side, replicate the
small side once per salt value, join on (key, salt). Result set is
IDENTICAL to the unsalted join (the salt never survives the join), so
the DuckDB oracle checks it like any other join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `on`, with the big side's shuffle spread
    over n_salt× more partitions per key.

    The salt is derived from the big row's partition+offset (via
    spark_partition_id + a per-partition counter through
    monotonically_increasing_id): it distributes uniformly, never
    appears in the output, and its exact values can't affect the
    result — only the shuffle layout. The small side is exploded
    n_salt× (acceptable: salting targets big⋈small; for big⋈big skew
    use AQE's skew-join, which splits SMJ partitions natively).

    Only inner and left joins are semantics-preserving: an outer
    small side would emit each UNMATCHED small row once per salt
    replica, silently diverging from the unsalted join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}: "
            "the exploded small side replicates unmatched rows n_salt times "
            "under right/full outer semantics"
        )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).alias("_salt")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(s, [on, "_salt"], how).drop("_salt")
